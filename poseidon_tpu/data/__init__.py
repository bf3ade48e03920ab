from .time_sampling import (
    build_time_indices,
    idx_map,
    resolve_num_trajectories,
    split_start,
)

__all__ = [
    "build_time_indices",
    "idx_map",
    "resolve_num_trajectories",
    "split_start",
]
