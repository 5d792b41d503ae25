"""Multi-chip distribution: mesh construction + sharded sparse kernels.

The reference has zero distributed support (SURVEY.md §2.4); this package is
the framework's scaling layer: 1-D row-partitioned SpMM under ``shard_map``
with all-gather halo exchange or a ring-``ppermute`` pipeline (the sparse
analogue of ring attention — SURVEY.md §5).
"""
from .mesh import make_mesh, shard_rows
from .spmm import (HaloShardedMatrix, RingShardedMatrix, RowShardedMatrix,
                   device_put_halo, device_put_ring, shard_halo,
                   shard_padded_coo, shard_ring_buckets, spmm_allgather,
                   spmm_halo, spmm_ring, spmm_ring_bucketed)
from .spgemm import (device_put_blocks, gather_blocks, shard_padded_rows,
                     spgemm_rowsharded)
from .spmm2d import Sharded2DMatrix, device_put_2d, shard_2d, spmm_2d
from .scaling import estimate_scaling, ScalingEstimate

__all__ = ["make_mesh", "shard_rows", "RowShardedMatrix",
           "RingShardedMatrix", "HaloShardedMatrix", "Sharded2DMatrix",
           "spmm_allgather", "spmm_ring", "spmm_ring_bucketed",
           "spmm_halo", "spmm_2d", "shard_padded_coo",
           "shard_ring_buckets", "shard_halo", "shard_2d",
           "device_put_ring", "device_put_halo", "device_put_2d",
           "shard_padded_rows", "device_put_blocks", "spgemm_rowsharded",
           "gather_blocks", "estimate_scaling", "ScalingEstimate"]
