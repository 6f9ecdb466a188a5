from .comm import Comm, exclusive_cumsum
from .verbs import (
    alltoallv, alltoallv_ring, route, partition_n, partition_w, partition_s,
    global_sort, sort_scatter_index, scatter_forward, scatter_reverse,
)

__all__ = [
    "Comm", "exclusive_cumsum",
    "alltoallv", "alltoallv_ring", "route", "partition_n", "partition_w", "partition_s",
    "global_sort", "sort_scatter_index", "scatter_forward",
    "scatter_reverse",
]
