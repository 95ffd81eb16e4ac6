"""CSV ingest path: load_movielens on fabricated MovieLens-format files."""

import numpy as np
import pytest

pd = pytest.importorskip("pandas")

from movie_recommender_system_with_gnns_tpu.data.movielens import load_movielens


@pytest.fixture()
def csv_dir(tmp_path):
    ratings = pd.DataFrame({
        "userId":  [7, 7, 7, 12, 12, 31, 31, 31, 31],
        "movieId": [100, 200, 300, 100, 400, 200, 300, 400, 500],
        "rating":  [5.0, 4.0, 3.5, 4.5, 2.0, 4.0, 5.0, 4.0, 4.0],
        "timestamp": range(9),
    })
    movies = pd.DataFrame({
        "movieId": [100, 200, 300, 400, 500],
        "title": ["A", "B", "C", "D", "E"],
        "genres": ["x"] * 5,
    })
    ratings.to_csv(tmp_path / "ratings.csv", index=False)
    movies.to_csv(tmp_path / "movies.csv", index=False)
    return tmp_path


def test_load_movielens_filters_and_maps(csv_dir):
    data = load_movielens(str(csv_dir / "ratings.csv"), str(csv_dir / "movies.csv"))
    # rating >= 4 keeps 7 rows: users {7,12,31}, movies {100,200,400,300,500}
    assert data.num_users == 3
    assert data.num_items == 5
    # first-appearance order (dataset_handler.py:115-118): user 7 -> 0
    assert int(data.user_index(7)) == 0
    assert int(data.user_index(12)) == 1
    assert int(data.user_index(31)) == 2
    assert int(data.user_index(999)) == -1
    # movie node ids offset by num_users
    assert int(data.movie_index(100)) == 3 + 0
    # undirected doubling: 7 kept interactions -> 14 directed edges
    assert data.edge_index.shape == (2, 14)
    # titles resolve
    assert data.title_of(200) == "B"
    # raw id round-trip
    m_node = int(data.movie_index(400))
    assert int(data.raw_movie_id(m_node - data.num_users)) == 400


def test_load_movielens_excludes_below_threshold(csv_dir):
    data = load_movielens(str(csv_dir / "ratings.csv"), str(csv_dir / "movies.csv"))
    # (7, 300) was rated 3.5 -> edge must not exist; (31, 300) rated 5.0 exists
    u7 = int(data.user_index(7))
    m300 = int(data.movie_index(300))
    pairs = set(map(tuple, data.edge_index.T.tolist()))
    assert (u7, m300) not in pairs
    u31 = int(data.user_index(31))
    assert (u31, m300) in pairs


def test_data_handler_reference_api(csv_dir, tmp_path):
    """Drop-in MovieLensDataHandler exposes the reference's exact surface."""
    from movie_recommender_system_with_gnns_tpu.data.handler import MovieLensDataHandler

    dh = MovieLensDataHandler(str(csv_dir / "ratings.csv"),
                              str(csv_dir / "movies.csv"),
                              indexes_dir=str(tmp_path / "idx"))
    nu, ni = dh.get_num_users_items()
    assert (nu, ni) == (3, 5)
    # dict id maps with the reference's offset convention
    assert dh.user_id_map[7] == 0
    assert dh.movie_id_map[100] == nu + 0
    assert dh.id_user_map[0] == 7
    assert dh.id_movie_map[nu + 0] == 100
    assert dh.movies is not None
    assert dh.edge_index.shape[0] == 2

    train, val, test = dh.get_datasets()
    assert train.shape[1] + val.shape[1] + test.shape[1] == dh.edge_index.shape[1]

    loader, val2, test2 = dh.get_data_training(num_train_clusters=2)
    assert len(loader) >= 1
    for batch in loader:   # iterable of cluster batches, like the reference loop
        assert batch.num_edges > 0


def test_native_csv_loader_matches_pandas(tmp_path):
    """gc_load_ratings_csv must reproduce the pandas path exactly: same rows,
    same (first-appearance) order, same >=min filter."""
    import pandas as pd

    from movie_recommender_system_with_gnns_tpu.data import native

    if not native.available():
        import pytest

        pytest.skip("native lib not built")
    rng = np.random.default_rng(3)
    n = 20_000
    users = rng.integers(1, 700, n)
    movies = rng.integers(1, 900, n)
    ratings = rng.choice([0.5, 1.0, 2.5, 3.5, 4.0, 4.5, 5.0], n)
    path = tmp_path / "ratings.csv"
    with open(path, "w") as f:
        f.write("userId,movieId,rating,timestamp\n")
        for u, m, r in zip(users, movies, ratings):
            f.write(f"{u},{m},{r},1234567890\n")

    got = native.load_ratings_csv(str(path), 4.0)
    assert got is not None
    gu, gm = got
    df = pd.read_csv(path, usecols=["userId", "movieId", "rating"])
    df = df[df["rating"] >= 4.0]
    np.testing.assert_array_equal(gu, df["userId"].to_numpy().astype(np.int32))
    np.testing.assert_array_equal(gm, df["movieId"].to_numpy().astype(np.int32))


def test_native_csv_loader_no_trailing_newline(tmp_path):
    from movie_recommender_system_with_gnns_tpu.data import native

    if not native.available():
        import pytest

        pytest.skip("native lib not built")
    path = tmp_path / "r.csv"
    path.write_text("userId,movieId,rating\n1,10,4.5\n2,20,3.0\n3,30,5.0")
    gu, gm = native.load_ratings_csv(str(path), 4.0)
    np.testing.assert_array_equal(gu, [1, 3])
    np.testing.assert_array_equal(gm, [10, 30])


def test_csv_to_training_end_to_end(tmp_path):
    """Real-data path: ratings.csv + movies.csv -> load (native or pandas) ->
    split -> cluster -> one training epoch -> serving lookup by raw ids."""
    import jax

    from movie_recommender_system_with_gnns_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )
    from movie_recommender_system_with_gnns_tpu.serving.recommend import (
        recommend_from_user,
    )
    from movie_recommender_system_with_gnns_tpu.training.pipeline import (
        prepare_training_data,
    )
    from movie_recommender_system_with_gnns_tpu.training.train import (
        create_train_state, train_model,
    )

    rng = np.random.default_rng(11)
    n = 30_000
    data_dir = tmp_path / "ml"
    data_dir.mkdir()
    with open(data_dir / "ratings.csv", "w") as f:
        f.write("userId,movieId,rating,timestamp\n")
        for u, m, r in zip(rng.integers(1, 250, n), rng.integers(1, 400, n),
                           rng.choice([2.0, 3.0, 4.0, 4.5, 5.0], n)):
            f.write(f"{u},{m},{r},0\n")
    with open(data_dir / "movies.csv", "w") as f:
        f.write("movieId,title,genres\n")
        for m in range(1, 400):
            f.write(f"{m},Movie {m},Drama\n")

    cfg = Config(
        data=DataConfig(dataset="ml-100k", data_dir=str(data_dir),
                        indexes_dir=str(tmp_path / "idx")),
        model=ModelConfig(num_layers=2, dim=16),
        train=TrainConfig(epochs=1, num_clusters=4,
                          checkpoint_path=str(tmp_path / "best.npz")),
    )
    data, clusters, val, test = prepare_training_data(cfg)
    assert data.movie_titles is not None
    state = create_train_state(cfg, data.num_users, data.num_items)
    state, hist = train_model(cfg, state, clusters, val, test)
    assert np.isfinite(hist["train_loss"][-1])

    # serving through RAW ids (the CSV's userId space)
    raw_uid = int(data.user_ids[0])
    recs = recommend_from_user(state.params, raw_uid, data)
    assert "recommendations" in recs and len(recs["recommendations"]) > 0
    assert all("title" in r for r in recs["recommendations"])
