"""Row-partitioned distributed SpGEMM (sparse @ sparse) under ``shard_map``.

Companion to :mod:`parallel.spmm` for the sparse-times-sparse product the
reference never supported (unsupported list, /root/reference/README.md:45-61;
functional contract at README.md:301-354).  Strategy: C = A @ B with A 1-D
row-sharded — each device owns a contiguous block of A's rows and computes
the matching block of C's rows entirely locally via the static-shape ESC
kernel (:func:`core.spgemm.spspmm_padded`).  There is **no communication in
the compute step** when B is replicated: row-partitioned SpGEMM is
embarrassingly parallel over output rows, which is why it scales linearly —
the only collective is the optional up-front ``all_gather`` of a sharded B.

B handling:

* ``B`` replicated (the common regime — the right operand of a chained
  SpGEMM is usually much smaller than A, e.g. a partition/pooling matrix):
  pass it directly.
* ``B`` row-sharded: call :func:`allgather_padded` first — one tiled
  ``all_gather`` of its (row, col, value) triple plus a merge-sort back to
  canonical row order (block paddings interleave after concatenation).
"""
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.matrix import PaddedCOO
from ..core.spgemm import spspmm_padded


def shard_padded_rows(tensor, n_shards: int) -> Tuple[PaddedCOO, int]:
    """Host-side split of an eager SparseTensor into ``n_shards`` contiguous
    row blocks, returned as a PaddedCOO of stacked (D, capacity) arrays with
    *local* row ids and a common capacity.  Returns (blocks, rows_per_shard).
    """
    import numpy as np
    M, N = tensor.sparse_sizes()
    assert M % n_shards == 0, f"M={M} must divide into {n_shards} shards"
    rows_per = M // n_shards
    row_np = np.asarray(tensor.storage.row())
    col_np = np.asarray(tensor.storage.col())
    value = tensor.storage.value()
    val_np = None if value is None else np.asarray(value)

    bounds = np.searchsorted(row_np, np.arange(n_shards + 1) * rows_per)
    cap = max(1, int(np.max(np.diff(bounds))))
    rows = np.full((n_shards, cap), rows_per, row_np.dtype)
    cols = np.full((n_shards, cap), N, col_np.dtype)
    vals = (None if val_np is None
            else np.zeros((n_shards, cap), val_np.dtype))
    nnz = np.zeros((n_shards,), np.int32)
    for d in range(n_shards):
        lo, hi = bounds[d], bounds[d + 1]
        n = hi - lo
        rows[d, :n] = row_np[lo:hi] - d * rows_per
        cols[d, :n] = col_np[lo:hi]
        if vals is not None:
            vals[d, :n] = val_np[lo:hi]
        nnz[d] = n
    blocks = PaddedCOO(row=jnp.asarray(rows), col=jnp.asarray(cols),
                       value=None if vals is None else jnp.asarray(vals),
                       nnz=jnp.asarray(nnz), shape=(rows_per, N))
    return blocks, rows_per


def device_put_blocks(mesh: Mesh, blocks: PaddedCOO,
                      axis_name: str = "x") -> PaddedCOO:
    """Place stacked row blocks with the leading axis sharded over the mesh."""
    def put(a, spec):
        return jax.device_put(a, NamedSharding(mesh, spec))
    return PaddedCOO(
        row=put(blocks.row, P(axis_name, None)),
        col=put(blocks.col, P(axis_name, None)),
        value=(None if blocks.value is None
               else put(blocks.value, P(axis_name, None))),
        nnz=put(blocks.nnz, P(axis_name)),
        shape=blocks.shape)


def spgemm_rowsharded(mesh: Mesh, A_blocks: PaddedCOO, B: PaddedCOO,
                      flop_capacity: int, out_capacity: int,
                      axis_name: str = "x"):
    """C = A @ B with A row-sharded and B replicated.

    ``A_blocks``: stacked (D, cap) local-row blocks (see
    :func:`shard_padded_rows`), each (rows_per, K).  ``B``: (K, N) PaddedCOO
    replicated on every device.  Capacities are per-shard static bounds
    (size them from the worst shard via :func:`ops.spspmm.spgemm_flops`).

    Returns ``(C_blocks, overflowed)`` — C_blocks is a stacked PaddedCOO of
    local-row output blocks (global row = local + d * rows_per), overflowed
    a (D,) bool vector.
    """
    rows_per, K = A_blocks.shape
    K2, N = B.shape
    assert K == K2, f"size mismatch {A_blocks.shape} @ {B.shape}"

    def sharded_spec(a):
        return P(axis_name, *([None] * (a.ndim - 1)))

    spec_e = P(axis_name, None)
    a_specs = jax.tree_util.tree_map(sharded_spec, A_blocks)
    b_specs = jax.tree_util.tree_map(lambda _: P(), B)
    c_specs = PaddedCOO(row=spec_e, col=spec_e,
                        value=(None if (A_blocks.value is None
                                        and B.value is None) else spec_e),
                        nnz=sharded_spec(A_blocks.nnz),
                        shape=(rows_per, N))

    def kernel(a, b):
        a_local = PaddedCOO(row=a.row[0], col=a.col[0],
                            value=None if a.value is None else a.value[0],
                            nnz=a.nnz[0], shape=(rows_per, K))
        res = spspmm_padded(a_local, b, flop_capacity, out_capacity)
        c = res.matrix
        expand = lambda v: v[None]  # noqa: E731
        c_out = PaddedCOO(row=expand(c.row), col=expand(c.col),
                          value=None if c.value is None else expand(c.value),
                          nnz=expand(c.nnz), shape=c.shape)
        return c_out, res.overflowed[None]

    fn = shard_map(kernel, mesh=mesh,
                   in_specs=(a_specs, b_specs),
                   out_specs=(c_specs, P(axis_name)))
    return fn(A_blocks, B)


def gather_blocks(C_blocks: PaddedCOO, rows_per: int, num_rows: int,
                  num_cols: int):
    """Host-side: merge stacked local-row output blocks back into one eager,
    row-sorted global COO triple ``(row, col, value, nnz)``."""
    import numpy as np
    D, cap = C_blocks.row.shape
    rows = np.asarray(C_blocks.row)
    cols = np.asarray(C_blocks.col)
    vals = None if C_blocks.value is None else np.asarray(C_blocks.value)
    nnzs = np.asarray(C_blocks.nnz)
    out_r, out_c, out_v = [], [], []
    for d in range(D):
        n = int(nnzs[d])
        out_r.append(rows[d, :n] + d * rows_per)
        out_c.append(cols[d, :n])
        if vals is not None:
            out_v.append(vals[d, :n])
    row = np.concatenate(out_r) if out_r else np.zeros((0,), rows.dtype)
    col = np.concatenate(out_c) if out_c else np.zeros((0,), cols.dtype)
    val = (np.concatenate(out_v) if vals is not None and out_v
           else None)
    return (jnp.asarray(row), jnp.asarray(col),
            None if val is None else jnp.asarray(val))
