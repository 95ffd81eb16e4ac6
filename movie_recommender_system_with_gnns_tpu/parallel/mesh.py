"""Device mesh construction + multi-host initialization.

The reference is single-process single-device (``torch.device('cuda' if ...)``,
reference data/dataset_handler.py:85); its only "communication" is host↔GPU
``.to(device)``. This module provides the TPU-native scaling substrate instead:
a named 2-D mesh — ``data`` (batch/data-parallel) × ``model`` (row-sharded
embedding tables, the TP analog for embedding models) — over which the sharded
trainer (parallel/sharding.py) and sharded MIPS retrieval run, with XLA
collectives riding ICI intra-slice and DCN across hosts.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (jax.distributed). No-op when single-process args are
    absent and no cluster env is detected."""
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(coordinator_address, num_processes, process_id)
        elif any(k in __import__("os").environ for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")):
            jax.distributed.initialize()
    except (RuntimeError, ValueError) as e:  # already initialized / single host
        print(f"distributed_init skipped: {e}")


def make_mesh(
    data_parallel: Optional[int] = None,
    model_parallel: Optional[int] = None,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh. Defaults: all devices on the model axis when
    only one knob is given; (n, 1) when neither is."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data_parallel is None and model_parallel is None:
        data_parallel, model_parallel = n, 1
    elif data_parallel is None:
        data_parallel = n // model_parallel
    elif model_parallel is None:
        model_parallel = n // data_parallel
    if data_parallel * model_parallel != n:
        raise ValueError(f"mesh {data_parallel}x{model_parallel} != {n} devices")
    return Mesh(devices.reshape(data_parallel, model_parallel), (DATA_AXIS, MODEL_AXIS))


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Row-sharding for embedding tables: P('model', None)."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for triplet batches: P('data')."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0) -> Tuple[np.ndarray, int]:
    """Pad an array along ``axis`` so its size divides evenly over a mesh axis."""
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x, 0
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths), pad
