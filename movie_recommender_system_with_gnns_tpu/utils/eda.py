"""Exploratory data analysis: dataset statistics report.

Capability parity with reference ``data/eda.py`` (standalone script, :1-111):
heads, unique user/movie counts, ratings-per-user and per-movie distributions,
average movie degree, and the count + fraction of ratings ≥ 4 (the training
filter). Redesigned as an importable function over any ratings DataFrame (the
reference script downloads the full zip, prints, then deletes the data dir —
eda.py:110-111; we leave data alone).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def describe(series) -> Dict[str, float]:
    a = np.asarray(series, dtype=np.float64)
    return {
        "count": float(a.size),
        "mean": float(a.mean()) if a.size else 0.0,
        "std": float(a.std(ddof=1)) if a.size > 1 else 0.0,
        "min": float(a.min()) if a.size else 0.0,
        "25%": float(np.percentile(a, 25)) if a.size else 0.0,
        "50%": float(np.percentile(a, 50)) if a.size else 0.0,
        "75%": float(np.percentile(a, 75)) if a.size else 0.0,
        "max": float(a.max()) if a.size else 0.0,
    }


def eda_report(ratings, movies=None, tags=None, min_rating: float = 4.0,
               verbose: bool = True, show_heads: bool = True) -> Dict[str, object]:
    """Compute the reference EDA statistics (eda.py:76-108) for a ratings frame
    with columns userId, movieId, rating. ``movies`` may carry a ``genres``
    column and ``tags`` a tag frame — both reported like the reference script
    when present."""
    if verbose and show_heads:
        print("ratings head:")
        print(ratings.head())
        if movies is not None:
            print("movies head:")
            print(movies.head())
        if tags is not None:
            print("tags head:")
            print(tags.head())
    n = len(ratings)
    users = ratings["userId"].to_numpy()
    movies_col = ratings["movieId"].to_numpy()
    rating = ratings["rating"].to_numpy()

    num_users = int(np.unique(users).size)
    num_movies = int(np.unique(movies_col).size)
    per_user = np.bincount(np.unique(users, return_inverse=True)[1])
    per_movie = np.bincount(np.unique(movies_col, return_inverse=True)[1])
    ge = int((rating >= min_rating).sum())

    rep: Dict[str, object] = {
        "num_ratings": n,
        "num_users": num_users,
        "num_movies": num_movies,
        "ratings_per_user": describe(per_user),
        "ratings_per_movie": describe(per_movie),
        "avg_movie_degree": float(per_movie.mean()) if per_movie.size else 0.0,
        f"ratings_ge_{min_rating}": ge,
        f"fraction_ge_{min_rating}": ge / max(n, 1),
    }
    if movies is not None:
        rep["num_movie_titles"] = int(len(movies))
        if "genres" in getattr(movies, "columns", []):
            genre_counts: Dict[str, int] = {}
            for g in movies["genres"].astype(str):
                for tok in g.split("|"):
                    genre_counts[tok] = genre_counts.get(tok, 0) + 1
            rep["genres"] = dict(sorted(genre_counts.items(),
                                        key=lambda kv: -kv[1]))
    if tags is not None:
        rep["num_tags"] = int(len(tags))
        if "tag" in getattr(tags, "columns", []):
            rep["num_unique_tags"] = int(tags["tag"].nunique())

    if verbose:
        print(f"ratings: {n}")
        print(f"unique users: {num_users}, unique movies: {num_movies}")
        print(f"ratings/user: mean {rep['ratings_per_user']['mean']:.1f}, "
              f"median {rep['ratings_per_user']['50%']:.0f}, "
              f"max {rep['ratings_per_user']['max']:.0f}")
        print(f"ratings/movie: mean {rep['ratings_per_movie']['mean']:.1f}, "
              f"median {rep['ratings_per_movie']['50%']:.0f}, "
              f"max {rep['ratings_per_movie']['max']:.0f}")
        print(f"avg movie degree: {rep['avg_movie_degree']:.2f}")
        print(f"ratings >= {min_rating}: {ge} ({rep[f'fraction_ge_{min_rating}']:.1%})")
    return rep
