"""Visualization suite smoke tests (VERDICT r2: the one untested module).

Every public function of utils/visualizations.py (reference
utils/visualizations.py:21-316 re-done on matplotlib/TSNE fallbacks) must
render a non-trivial image file headlessly; the CLI recommend --plots path
(reference utils/recommend.py:149-155) must write its two plots.
"""

import os

import jax
import numpy as np
import pytest

from movie_recommender_system_with_gnns_tpu.data.movielens import (
    make_synthetic_movielens,
)
from movie_recommender_system_with_gnns_tpu.models.lightgcn import init_params
from movie_recommender_system_with_gnns_tpu.utils import visualizations as viz


def _assert_png(path, min_bytes=4000):
    assert os.path.exists(path), path
    size = os.path.getsize(path)
    assert size > min_bytes, f"{path} suspiciously small ({size} B)"


@pytest.fixture(scope="module")
def small_model():
    data = make_synthetic_movielens(60, 90, 1800, seed=0)
    params = init_params(jax.random.PRNGKey(0), data.num_users,
                         data.num_items, 8)
    return data, params


def test_plot_histories(tmp_path):
    d = tmp_path / "hist"
    d.mkdir()
    n = 12
    np.save(d / "hist_train_loss.npy", -np.linspace(0.3, 1.2, n))
    np.save(d / "hist_val_loss.npy", -np.linspace(0.2, 0.9, n))
    np.save(d / "hist_val_recall.npy", np.linspace(1e-4, 8e-4, n))
    out = viz.plot_histories(str(d), out_path=str(tmp_path / "h.png"))
    _assert_png(out)


def test_plot_recommendations(tmp_path):
    recs = [{"title": f"Movie {i} with a fairly long descriptive title",
             "score": 1.0 - 0.07 * i} for i in range(10)]
    out = viz.plot_recommendations(recs, user_id=42,
                                   out_path=str(tmp_path / "recs.png"))
    _assert_png(out)


def test_analyze_user_recommendations(tmp_path, small_model):
    data, params = small_model
    raw_uid = int(data.user_ids[3])
    out = viz.analyze_user_recommendations(
        params, raw_uid, data, out_path=str(tmp_path / "analysis.png"),
        num_similar_users=10, num_top_movies=20)
    _assert_png(out)


def test_analyze_user_invalid_id(tmp_path, small_model):
    data, params = small_model
    with pytest.raises(ValueError, match="Invalid user ID"):
        viz.analyze_user_recommendations(params, -999, data,
                                         out_path=str(tmp_path / "x.png"))


def test_user_item_graph(tmp_path, small_model):
    if not viz._HAVE_NX:
        pytest.skip("networkx unavailable")
    data, params = small_model
    g = viz.create_user_item_graph(np.asarray(params.user_emb),
                                   np.asarray(params.item_emb),
                                   num_users=20, num_items=30, top_k=3)
    assert g.number_of_nodes() == 50
    # every user node carries exactly top_k edges
    assert all(g.degree(f"U{i}") == 3 for i in range(20))
    out = viz.plot_user_item_graph(g, out_path=str(tmp_path / "graph.png"))
    _assert_png(out)


def test_cli_recommend_writes_plots(tmp_path, monkeypatch, capsys):
    """The serve CLI's --plots flag must actually render both figures
    (reference wires them into the serve __main__, recommend.py:149-155); a
    silent 'plots skipped' regression fails this test."""
    from movie_recommender_system_with_gnns_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    common = [
        "--dataset", "synthetic",
        "--synthetic-users", "60", "--synthetic-items", "90",
        "--synthetic-interactions", "2000",
        "--indexes-dir", str(tmp_path / "idx"),
        "--checkpoint", str(tmp_path / "model.npz"),
        "--clusters", "2", "--epochs", "1", "--dim", "8", "--layers", "2",
    ]
    assert main(common + ["train"]) == 0
    capsys.readouterr()
    rc = main(common + ["recommend", "--user-id", "1", "--top-k", "5",
                        "--plots"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "plots skipped" not in out, out
    assert "bar chart:" in out and "analysis:" in out
    _assert_png(tmp_path / "recommendations.png")
    _assert_png(tmp_path / "user_analysis.png")
