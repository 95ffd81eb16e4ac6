"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax import.

The reference has no test suite at all (SURVEY §4); this suite implements the
strategy SURVEY §4 prescribes: synthetic-graph unit tests, torch-CPU golden
parity tests, CPU-simulated multi-device mesh tests, and a small end-to-end
convergence test.
"""

import os
import sys

# Tests run on CPU with 8 virtual devices so mesh/sharding code paths are
# exercised without TPU hardware. NOTE: this environment preloads jax and
# registers the axon TPU backend via sitecustomize in EVERY python process, so
# env vars alone are too late — flip the platform via jax.config before any
# backend initializes (it is still lazy at this point).
#
# On-TPU kernel lane:  RUN_TPU_TESTS=1 pytest -m tpu
# keeps the hardware platform so the @pytest.mark.tpu golden tests run the
# REAL Mosaic-compiled Pallas kernels (not interpret mode) on the chip.
RUN_TPU = os.environ.get("RUN_TPU_TESTS", "") == "1"
if not RUN_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already preloaded by sitecustomize anyway)

if not RUN_TPU:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: runs the real Mosaic-compiled kernels on TPU hardware "
        "(RUN_TPU_TESTS=1 pytest -m tpu); auto-skipped on the CPU platform")


def pytest_collection_modifyitems(config, items):
    if RUN_TPU:
        return
    skip = pytest.mark.skip(reason="TPU-hardware test lane (RUN_TPU_TESTS=1 "
                                   "pytest -m tpu)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)

from movie_recommender_system_with_gnns_tpu.data.movielens import (  # noqa: E402
    make_synthetic_movielens,
)


@pytest.fixture(scope="session")
def tiny_data():
    """Small synthetic MovieLens-shaped dataset shared across tests."""
    return make_synthetic_movielens(num_users=60, num_items=90, num_interactions=2000, seed=0)


@pytest.fixture(scope="session")
def tiny_graph(tiny_data):
    return tiny_data.edge_index, tiny_data.num_users + tiny_data.num_items


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
