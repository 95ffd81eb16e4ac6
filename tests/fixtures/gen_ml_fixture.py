"""Deterministic ML-100K-schema fixture generator.

Writes ratings.csv / movies.csv / tags.csv in the EXACT column formats of the
real MovieLens datasets (reference data/dataset_handler.py:26-64 downloads
ml-latest-small; eda.py reads all three files), so the end-to-end test
(tests/test_real_schema_e2e.py) drives the full CSV-ingest → split → train →
eval → raw-id serving pipeline on real-shaped data without network egress.

Real-data properties deliberately reproduced:
  * sparse, non-contiguous raw movieIds up to ~190k (exercises the id maps);
  * ratings on the 0.5..5.0 half-star scale with ~55% >= 4.0 (exercises the
    min_rating filter — some users/movies vanish entirely after filtering);
  * rows grouped by userId, timestamped (real file order);
  * movie titles containing commas/quotes (exercises quoted-CSV parsing in the
    pandas path and documents that the native fast path is ratings-only);
  * a genres column with pipe-separated values incl. "(no genres listed)".

Regenerate with:  python tests/fixtures/gen_ml_fixture.py
The output is committed; this script only exists to document provenance.
"""

from __future__ import annotations

import os

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ml100k")

NUM_USERS = 610          # ml-latest-small has 610 users
NUM_MOVIES = 1400
NUM_RATINGS = 260_000  # pre-dedup draws; ~70k unique survive

GENRES = ["Action", "Adventure", "Animation", "Children", "Comedy", "Crime",
          "Documentary", "Drama", "Fantasy", "Film-Noir", "Horror", "IMAX",
          "Musical", "Mystery", "Romance", "Sci-Fi", "Thriller", "War",
          "Western", "(no genres listed)"]

TAG_WORDS = ["atmospheric", "thought-provoking", "surreal", "funny", "twist",
             "classic", "quirky", "dark comedy", "space", "time travel"]


def main() -> None:
    rng = np.random.default_rng(20260819)
    os.makedirs(OUT, exist_ok=True)

    # raw ids: users contiguous 1..N (like the real files), movies sparse
    user_ids = np.arange(1, NUM_USERS + 1)
    movie_ids = np.sort(rng.choice(np.arange(1, 193_610), NUM_MOVIES,
                                   replace=False))

    # Zipf-ish popularity/activity like the real data
    u_p = 1.0 / np.arange(1, NUM_USERS + 1) ** 0.9
    m_p = 1.0 / np.arange(1, NUM_MOVIES + 1) ** 0.9
    u_p /= u_p.sum()
    m_p /= m_p.sum()
    u_draw = rng.choice(NUM_USERS, NUM_RATINGS, p=u_p)
    m_draw = rng.choice(NUM_MOVIES, NUM_RATINGS, p=m_p)
    # dedup (user, movie) pairs — real files have at most one rating per pair
    pairs = np.unique(u_draw.astype(np.int64) * NUM_MOVIES + m_draw)
    u_idx = (pairs // NUM_MOVIES).astype(np.int64)
    m_idx = (pairs % NUM_MOVIES).astype(np.int64)

    # half-star ratings skewed high (real mean ~3.5, ~55% >= 4.0)
    levels = np.arange(0.5, 5.01, 0.5)
    probs = np.array([1, 1, 2, 3, 5, 8, 13, 24, 18, 13], float)
    probs /= probs.sum()
    rating = rng.choice(levels, pairs.shape[0], p=probs)
    ts = rng.integers(828_000_000, 1_700_000_000, pairs.shape[0])

    # real file order: grouped by userId, then timestamp
    order = np.lexsort((ts, u_idx))
    u_idx, m_idx, rating, ts = u_idx[order], m_idx[order], rating[order], ts[order]

    with open(os.path.join(OUT, "ratings.csv"), "w", newline="") as f:
        f.write("userId,movieId,rating,timestamp\n")
        for u, m, r, t in zip(user_ids[u_idx], movie_ids[m_idx], rating, ts):
            f.write(f"{u},{m},{r:.1f},{t}\n")

    with open(os.path.join(OUT, "movies.csv"), "w", newline="") as f:
        f.write("movieId,title,genres\n")
        for i, mid in enumerate(movie_ids):
            year = 1930 + int(rng.integers(0, 95))
            if i % 7 == 0:
                # comma in title -> must be quoted, like the real file
                title = f'"Fixture Film {i}, The ({year})"'
            elif i % 23 == 0:
                title = f'"Fixture ""Quoted"" Film {i} ({year})"'
            else:
                title = f"Fixture Film {i} ({year})"
            k = int(rng.integers(1, 4))
            gs = "|".join(rng.choice(GENRES[:-1], k, replace=False)) \
                if i % 11 else GENRES[-1]
            f.write(f"{mid},{title},{gs}\n")

    n_tags = 3000
    tu = rng.choice(NUM_USERS, n_tags)
    tm = rng.choice(NUM_MOVIES, n_tags)
    tw = rng.choice(len(TAG_WORDS), n_tags)
    tts = rng.integers(1_100_000_000, 1_700_000_000, n_tags)
    with open(os.path.join(OUT, "tags.csv"), "w", newline="") as f:
        f.write("userId,movieId,tag,timestamp\n")
        for u, m, w, t in zip(user_ids[tu], movie_ids[tm], tw, tts):
            f.write(f"{u},{m},{TAG_WORDS[w]},{t}\n")

    n = sum(1 for _ in open(os.path.join(OUT, "ratings.csv"))) - 1
    kept = int((rating >= 4.0).sum())
    size = sum(os.path.getsize(os.path.join(OUT, x))
               for x in ("ratings.csv", "movies.csv", "tags.csv"))
    print(f"wrote {OUT}: {n} ratings ({kept} >= 4.0), "
          f"{NUM_MOVIES} movies, {n_tags} tags, {size/1e6:.2f} MB")


if __name__ == "__main__":
    main()
