"""Multi-chip distribution: mesh construction + sharded sparse kernels.

The reference has zero distributed support (SURVEY.md §2.4); this package is
the framework's scaling layer: 1-D row-partitioned SpMM under ``shard_map``
with all-gather halo exchange or a ring-``ppermute`` pipeline (the sparse
analogue of ring attention — SURVEY.md §5).
"""
from .mesh import make_mesh, shard_rows
from .spmm import (RowShardedMatrix, spmm_allgather, spmm_ring,
                   shard_padded_coo)
from .spgemm import (device_put_blocks, gather_blocks, shard_padded_rows,
                     spgemm_rowsharded)

__all__ = ["make_mesh", "shard_rows", "RowShardedMatrix",
           "spmm_allgather", "spmm_ring", "shard_padded_coo",
           "shard_padded_rows", "device_put_blocks", "spgemm_rowsharded",
           "gather_blocks"]
