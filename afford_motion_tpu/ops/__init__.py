from .pointops import (
    pairwise_sqdist,
    knn,
    farthest_point_sampling,
    gather_points,
    group_points,
    query_and_group,
    interpolate_three_nn,
    batched_knn,
    batched_fps,
)
from .hierarchy import LevelGeometry, build_point_hierarchy

__all__ = [
    "pairwise_sqdist",
    "knn",
    "farthest_point_sampling",
    "gather_points",
    "group_points",
    "query_and_group",
    "interpolate_three_nn",
    "batched_knn",
    "batched_fps",
    "LevelGeometry",
    "build_point_hierarchy",
]
