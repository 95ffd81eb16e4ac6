"""CLI entrypoint tests (in-process main(), CPU platform via conftest)."""

import os

import numpy as np
import pytest

from movie_recommender_system_with_gnns_tpu.cli import main


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _common(workdir, *extra):
    return [
        "--dataset", "synthetic",
        "--synthetic-users", "80", "--synthetic-items", "120",
        "--synthetic-interactions", "3000",
        "--indexes-dir", str(workdir / "idx"),
        "--checkpoint", str(workdir / "model.npz"),
        "--clusters", "3", "--epochs", "2", "--dim", "16", "--layers", "2",
        *extra,
    ]


def test_cli_train_then_recommend(workdir, capsys):
    rc = main(_common(workdir, "train"))
    assert rc == 0
    assert os.path.exists(workdir / "model.npz")
    out = capsys.readouterr().out
    assert "Train Loss" in out

    rc = main(_common(workdir, "recommend", "--user-id", "1", "--top-k", "5"))
    assert rc == 0
    out = capsys.readouterr().out
    assert "Top 5 Recommendations for user 1" in out

    rc = main(_common(workdir, "recommend", "--movie-id", "1", "--top-k", "5"))
    assert rc == 0
    assert "users for movie 1" in capsys.readouterr().out


def test_cli_train_with_recovery_flag(workdir, capsys):
    """--max-retries routes through the elastic driver (training/recovery.py)
    and still produces the checkpoint + histories on a clean run."""
    rc = main(_common(workdir, "train", "--max-retries", "1"))
    assert rc == 0
    assert os.path.exists(workdir / "model.npz")
    out = capsys.readouterr().out
    assert "recovery: enabling per-epoch full-state checkpoints" in out
    assert os.path.exists(workdir / "recovery_state.npz")


def test_cli_recommend_invalid_user(workdir, capsys):
    main(_common(workdir, "train"))
    capsys.readouterr()
    rc = main(_common(workdir, "recommend", "--user-id", "99999"))
    assert rc == 1
    assert "Invalid user ID" in capsys.readouterr().out


def test_cli_recommend_without_checkpoint(workdir, capsys):
    rc = main(_common(workdir, "recommend", "--user-id", "1"))
    assert rc == 1
    assert "train first" in capsys.readouterr().out


def test_cli_eda(workdir, capsys):
    rc = main(_common(workdir, "eda"))
    assert rc == 0
    out = capsys.readouterr().out
    assert "unique users" in out


def test_cli_batch_recommend(workdir, capsys):
    main(_common(workdir, "train"))
    capsys.readouterr()
    (workdir / "users.txt").write_text("1\n2\n999999\n3\n")
    rc = main(_common(workdir, "recommend", "--users-file", str(workdir / "users.txt"),
                      "--top-k", "4", "--out", str(workdir / "recs.csv")))
    assert rc == 0
    out = capsys.readouterr().out
    assert "3 users" in out and "1 unknown ids skipped" in out
    lines = (workdir / "recs.csv").read_text().strip().splitlines()
    assert lines[0] == "userId,rank,movieId,title,score"
    assert len(lines) == 1 + 3 * 4
