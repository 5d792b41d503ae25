"""Row-partitioned distributed SpMM under ``shard_map``.

The scaling design from SURVEY.md §2.4/§5 (the reference has no distributed
layer at all): the sparse operand is 1-D row-sharded — each device owns a
contiguous block of output rows and the nnz that produce them — and the dense
operand is row-sharded over the same axis (its rows = A's columns).  Two
interchange strategies:

* ``spmm_allgather``: one ``all_gather`` of the dense operand, then a local
  SpMM.  Best when N*K is small enough to replicate transiently (halo = all).
* ``spmm_ring``: the dense block ring-``ppermute``s around the mesh while
  each device accumulates the partial SpMM of the column-block it currently
  holds — the sparse analogue of ring attention; memory stays O(N*K / D) and
  XLA overlaps the permute with the masked local SpMM.

Both are differentiable (collectives have transposes) and compile to ICI
collectives on a real TPU slice.
"""
import dataclasses
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.matrix import PaddedCOO
from ..ops.spmm import spmm_coo


class RowShardedMatrix(NamedTuple):
    """Stacked per-device row blocks of a global (M, N) sparse matrix.

    Leading axis = device. ``row`` holds *local* row ids in [0, rows_per_shard]
    (padding = rows_per_shard); ``col`` holds *global* column ids.
    """
    row: jax.Array     # (D, C) local row ids
    col: jax.Array     # (D, C) global col ids; padding = N
    value: jax.Array   # (D, C)
    nnz: jax.Array     # (D,)
    shape: Tuple[int, int]          # global (M, N)
    rows_per_shard: int


def shard_padded_coo(tensor, n_shards: int, index_dtype=jnp.int32,
                     ) -> RowShardedMatrix:
    """Host-side split of an eager SparseTensor into equal contiguous row
    blocks with a common padded capacity."""
    import numpy as np
    M, N = tensor.sparse_sizes()
    assert M % n_shards == 0, f"M={M} must divide into {n_shards} shards"
    rows_per = M // n_shards
    row_np, col_np = np.asarray(tensor.storage.row()), np.asarray(
        tensor.storage.col())
    value = tensor.storage.value()
    val_np = (np.asarray(value) if value is not None
              else np.ones(row_np.shape, np.float32))

    bounds = np.searchsorted(row_np, np.arange(n_shards + 1) * rows_per)
    cap = int(np.max(bounds[1:] - bounds[:-1])) if len(row_np) else 1
    cap = max(cap, 1)

    rows = np.full((n_shards, cap), rows_per, dtype=np.int64)
    cols = np.full((n_shards, cap), N, dtype=np.int64)
    vals = np.zeros((n_shards, cap), dtype=val_np.dtype)
    nnzs = np.zeros((n_shards,), dtype=np.int32)
    for d in range(n_shards):
        lo, hi = bounds[d], bounds[d + 1]
        n = hi - lo
        rows[d, :n] = row_np[lo:hi] - d * rows_per
        cols[d, :n] = col_np[lo:hi]
        vals[d, :n] = val_np[lo:hi]
        nnzs[d] = n

    return RowShardedMatrix(
        row=jnp.asarray(rows, index_dtype), col=jnp.asarray(cols, index_dtype),
        value=jnp.asarray(vals), nnz=jnp.asarray(nnzs),
        shape=(M, N), rows_per_shard=rows_per)


def device_put_sharded_matrix(mesh: Mesh, mat: RowShardedMatrix,
                              axis_name: str = "x") -> RowShardedMatrix:
    """Lay each row block on its device (leading axis over the mesh)."""
    sh2 = NamedSharding(mesh, P(axis_name, None))
    sh1 = NamedSharding(mesh, P(axis_name))
    return RowShardedMatrix(
        row=jax.device_put(mat.row, sh2), col=jax.device_put(mat.col, sh2),
        value=jax.device_put(mat.value, sh2),
        nnz=jax.device_put(mat.nnz, sh1),
        shape=mat.shape, rows_per_shard=mat.rows_per_shard)


# ---------------------------------------------------------------------------
# shard_map kernels (operate on the per-device block; leading axis stripped)
# ---------------------------------------------------------------------------
def _local_spmm(row, col, value, x_full, rows_per_shard, reduce="sum"):
    out = spmm_coo(row, col, value, x_full, rows_per_shard + 1, reduce)
    return out[:rows_per_shard]


def spmm_allgather(mesh: Mesh, mat: RowShardedMatrix, x: jax.Array,
                   axis_name: str = "x", reduce: str = "sum") -> jax.Array:
    """x is row-sharded (N/D, K); returns out row-sharded (M/D, K) blocks.

    One all-gather of x rides ICI, then pure local compute.
    """
    rows_per = mat.rows_per_shard

    def kernel(row, col, value, x_local):
        x_full = jax.lax.all_gather(x_local, axis_name, tiled=True)
        return _local_spmm(row[0], col[0], value[0], x_full, rows_per,
                           reduce)

    spec_blk = P(axis_name, None)
    fn = shard_map(kernel, mesh=mesh,
                   in_specs=(spec_blk, spec_blk, spec_blk, spec_blk),
                   out_specs=spec_blk)
    # keep the (D, C) layout: shard_map passes (1, C) blocks; re-add axis
    out = fn(mat.row, mat.col, mat.value, x)
    return out


def spmm_ring(mesh: Mesh, mat: RowShardedMatrix, x: jax.Array,
              axis_name: str = "x") -> jax.Array:
    """Ring-pipelined SpMM: x blocks rotate around the mesh; each step
    accumulates the partial product of the currently-held column block.
    Peak memory O(N*K/D); XLA overlaps ppermute with the masked SpMM."""
    rows_per = mat.rows_per_shard
    D = mesh.devices.size
    N = mat.shape[1]
    assert N % D == 0, "ring spmm needs N divisible by the mesh size"
    blk = N // D

    def kernel(row, col, value, x_local):
        row_l, col_l, val_l = row[0], col[0], value[0]
        my = jax.lax.axis_index(axis_name)

        def step(carry, s):
            x_blk, acc = carry
            src = (my - s) % D                      # owner of current block
            start = src * blk
            in_blk = (col_l >= start) & (col_l < start + blk)
            v = jnp.where(in_blk, val_l, 0)
            c_local = jnp.clip(col_l - start, 0, blk - 1)
            acc = acc + _local_spmm(row_l, c_local, v, x_blk, rows_per)
            x_blk = jax.lax.ppermute(
                x_blk, axis_name, [(i, (i + 1) % D) for i in range(D)])
            return (x_blk, acc), None

        acc0 = jnp.zeros((rows_per, x_local.shape[-1]),
                         jnp.promote_types(val_l.dtype, x_local.dtype))
        # mark the accumulator as device-varying so the scan carry type is
        # stable under shard_map's varying-manual-axes tracking
        acc0 = jax.lax.pcast(acc0, (axis_name,), to="varying")
        (_, acc), _ = jax.lax.scan(step, (x_local, acc0),
                                   jnp.arange(D))
        return acc

    spec_blk = P(axis_name, None)
    fn = shard_map(kernel, mesh=mesh,
                   in_specs=(spec_blk, spec_blk, spec_blk, spec_blk),
                   out_specs=spec_blk)
    return fn(mat.row, mat.col, mat.value, x)
