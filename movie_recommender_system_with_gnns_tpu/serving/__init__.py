from .recommend import (
    batch_recommend_users, compute_serving_tables, recommend_from_movie,
    recommend_from_user, train_seen_items,
)

__all__ = [
    "recommend_from_user", "recommend_from_movie", "batch_recommend_users",
    "compute_serving_tables", "train_seen_items",
]
