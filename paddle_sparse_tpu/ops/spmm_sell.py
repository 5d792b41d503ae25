"""SELL-style padded-group SpMM — the round-2 flagship forward path.

The round-1 kernel materialized the full scaled product stream
``take(x, col) * value`` in HBM and re-read it in a Pallas reduction:
3x the roofline traffic before the MXU even starts, with the Pallas
selection matmul adding a tile_rows-fold FLOP redundancy on top
(VERDICT.md round 1, Weak #2/#3).  This module removes both.

Measured basis (experiments/fusion_probe.py, TPU v5e, 7.84M edges, K=256):
  * random 1KB row gather streams at ~330-350 GB/s — near the chip's
    effective HBM rate; the gather itself was never the bottleneck;
  * ``sum(reshape(gather, (-1, G, K)), axis=1)`` does NOT fuse — XLA
    materializes the (nnz, K) product (3x traffic, 143 GB/s effective);
  * an elementwise **sum of G separate gathers** DOES fuse for G >= 32:
    ``sum_i take(x, cols[i]) * vals[i]`` runs at 348 GB/s — the (nnz, K)
    product never exists in HBM.

Design:

1. **Plan (static, per sparse structure)**: pad every row's edge list to a
   multiple of ``G`` (default 32) — a SELL/ELLPACK-slice layout — and
   store the padded slot stream TRANSPOSED as ``(G, num_groups)`` so slot
   ``(i, g)`` holds edge ``g*G + i`` of the padded stream.  Pad slots
   carry ``edge_id = -1`` / column sentinel ``N``.
2. **Level-1 reduce (XLA, fused)**: ``partials[g] = sum_{i<G}
   value[eid[i,g]] * x[col[i,g]]`` — G gathers summed elementwise, fused
   by XLA into a single pass: HBM traffic is the x-row reads plus a
   ``groups``-sized partial write (1/G of the stream).
3. **Level-2 reduce (Pallas)**: group partials are segment-reduced to
   output rows by the streaming work-item kernel
   (``kernels/spmm_pallas.py``) at 1/G of the original traffic (plain
   sorted segment-sum on CPU/tests).

Processing runs in row-aligned blocks (``lax.map``) sized by the plan so
per-block buffers stay bounded at ogbn-products scale.

Autograd (value and x only, reference semantics /root/reference/README.md:96):
``d_x = A^T @ g`` reuses the same path over the plan's transpose structure;
``d_value`` is a chunked SDDMM.

The reference has no SpMM (unsupported list, /root/reference/README.md:45);
the functional contract is upstream's, /root/reference/README.md:267-300.
"""
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .convert import ind2ptr


class SellStructure(NamedTuple):
    """Device-resident padded-group index structure (and its transpose).

    Passed to jitted code as ARGUMENTS, never closed over: remote-compile
    transports serialize jaxpr constants into the compile request and
    124M-edge arrays exceed its size limit.

    ``eid`` stays in LINEAR (row-major padded stream) order: it is
    near-monotone, so the per-call value gather reads ``value``
    sequentially (a transposed eid would turn it into nnz 4-byte random
    reads — count-bound on TPU).  ``col_T`` is transposed to ``(G,
    groups)`` so level 1 is a sum of G fusible row gathers.
    """
    eid: jax.Array        # (groups * G,) edge id per padded slot, -1 = pad
    col_T: jax.Array      # (G, groups) column per slot, N = pad sentinel
    gptr: jax.Array       # (M + 1,) CSR pointer in GROUP units
    row: jax.Array        # (nnz,) original sorted COO rows (for SDDMM)
    col: jax.Array        # (nnz,) original COO cols
    # transpose (A^T) structure for the d_x backward
    eid_t: jax.Array
    col_Tt: jax.Array
    gptr_t: jax.Array
    perm_t: jax.Array     # (nnz,) csr->csc permutation for edge values


class SellPlan(NamedTuple):
    """Static (hashable) geometry for :func:`spmm_sell`."""
    num_rows: int
    num_cols: int
    group: int
    group_capacity: int     # max groups per row block
    rows_per_block: int
    group_capacity_t: int
    rows_per_block_t: int
    interpret: bool = False
    l2_backend: str = "pallas"   # "pallas" | "xla" (CPU/tests)


@functools.partial(jax.jit, static_argnames=("num_rows", "group"))
def _sell_geometry(row, *, num_rows: int, group: int):
    """rowptr + per-row group pointer for one orientation (one jit call;
    eager per-op dispatch through a remote tunnel costs ~O(100ms) per op,
    which made an unjitted planner take minutes at scale)."""
    rowptr = ind2ptr(row, num_rows).astype(jnp.int32)
    deg = rowptr[1:] - rowptr[:-1]
    groups = -(-deg // group)                       # ceil
    gptr = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(groups).astype(jnp.int32)])
    return rowptr, gptr


@functools.partial(jax.jit,
                   static_argnames=("ngroups", "group", "num_rows",
                                    "num_cols"))
def _sell_slots(rowptr, gptr, col, *, ngroups: int, group: int,
                num_rows: int, num_cols: int):
    """Padded slot arrays: linear eid stream + transposed column grid."""
    deg = rowptr[1:] - rowptr[:-1]
    total_slots = ngroups * group
    j = jnp.arange(total_slots, dtype=jnp.int32)
    r = jnp.clip(jnp.searchsorted(gptr * group, j, side="right") - 1,
                 0, max(num_rows - 1, 0)).astype(jnp.int32)
    within = j - gptr[r] * group
    valid = within < jnp.take(deg, r, mode="clip")
    eid = jnp.where(valid, jnp.take(rowptr, r, mode="clip") + within,
                    -1).astype(jnp.int32)
    col_p = jnp.where(valid, jnp.take(col, jnp.clip(eid, 0), mode="clip"),
                      num_cols).astype(jnp.int32)
    # slot (i, g) of col_T holds padded-stream position g*G + i
    col_T = col_p.reshape(ngroups, group).T
    return eid, col_T


@jax.jit
def _csc_view(row, col):
    perm_t = jnp.argsort(col, stable=True).astype(jnp.int32)
    return perm_t, jnp.take(col, perm_t), jnp.take(row, perm_t)


def _sell_pad(row, col, num_rows: int, num_cols: int, group: int):
    """Padded-slot construction for one orientation (two jit calls + one
    scalar host pull for the static group count)."""
    rowptr, gptr = _sell_geometry(row, num_rows=num_rows, group=group)
    ngroups = max(int(gptr[-1]), 1)
    eid, col_T = _sell_slots(rowptr, gptr, col, ngroups=ngroups,
                             group=group, num_rows=num_rows,
                             num_cols=num_cols)
    return eid, col_T, gptr


def _plan_blocks(gptr_host, feat_dim: int, target_bytes: int):
    """Row-aligned blocks with bounded group count.

    Equal row blocks; capacity = max groups over blocks (skewed degree
    distributions inflate it — pass smaller target_bytes for power-law
    graphs, or pre-sort rows by degree).
    """
    gp = np.asarray(gptr_host, dtype=np.int64)
    num_rows = gp.shape[0] - 1
    total_groups = max(int(gp[-1]), 1)

    def cdiv(a, b):
        return -(-a // b)

    budget_groups = max(128, target_bytes // max(1, feat_dim * 4))
    nblocks = max(1, cdiv(total_groups, budget_groups))
    CB = max(1, cdiv(num_rows, nblocks))
    # tile-align rows per block for the level-2 kernel's 128-row tiles
    CB = cdiv(CB, 128) * 128
    nblocks = cdiv(num_rows, CB)
    bounds = gp[np.minimum(np.arange(nblocks + 1) * CB, num_rows)]
    max_groups = int(np.max(np.diff(bounds))) if nblocks else 1
    GC = max(8, cdiv(max_groups, 8) * 8)
    return CB, GC, nblocks


def make_sell_plan(row, col, num_rows: int, num_cols: int, *,
                   group: int = 32, feat_dim: int = 256,
                   target_bytes: int = 256 * 1024 * 1024,
                   l2_backend: Optional[str] = None):
    """Host-side setup: build the padded-group structure (both
    orientations) and the row-block geometry.  Eager — needs concrete
    indices.  Returns ``(plan, structure)`` for :func:`spmm_sell`.

    ``group``: pad quantum; on TPU keep >= 32 (XLA fuses the gather sum
    from 32 operands up — measured in experiments/fusion_probe.py).
    """
    row = jnp.asarray(row, dtype=jnp.int32)
    col = jnp.asarray(col, dtype=jnp.int32)

    eid, col_T, gptr = _sell_pad(row, col, num_rows, num_cols, group)
    perm_t, row_t, col_t = _csc_view(row, col)
    eid_t, col_Tt, gptr_t = _sell_pad(row_t, col_t, num_cols, num_rows,
                                      group)

    CB, GC, _ = _plan_blocks(np.asarray(gptr), feat_dim, target_bytes)
    CBT, GCT, _ = _plan_blocks(np.asarray(gptr_t), feat_dim, target_bytes)
    on_cpu = jax.default_backend() == "cpu"
    if l2_backend is None:
        k_ok = (feat_dim >= 128 and feat_dim % 128 == 0) or (
            feat_dim < 128 and 128 % feat_dim == 0)
        l2_backend = "pallas" if (not on_cpu and k_ok) else "xla"
    plan = SellPlan(num_rows, num_cols, group, GC, CB, GCT, CBT,
                    interpret=on_cpu, l2_backend=l2_backend)
    structure = SellStructure(eid, col_T, gptr, row, col,
                              eid_t, col_Tt, gptr_t, perm_t)
    return plan, structure


def _level2(partials, gp_local, num_rows_block, interpret, l2_backend):
    """Reduce group partials to rows: Pallas streaming kernel on TPU,
    plain sorted segment-sum elsewhere (tiny shapes in tests)."""
    if l2_backend == "pallas":
        from .kernels.spmm_pallas import segment_rows_matmul
        return segment_rows_matmul(partials, None, gp_local,
                                   num_rows_block, interpret=interpret)
    ngroups = partials.shape[0]
    grow = jnp.clip(
        jnp.searchsorted(gp_local, jnp.arange(ngroups, dtype=jnp.int32),
                         side="right") - 1, 0, num_rows_block - 1)
    return jax.ops.segment_sum(partials, grow,
                               num_segments=num_rows_block,
                               indices_are_sorted=True)


@functools.partial(jax.jit, static_argnames=("plan", "transpose"))
def _spmm_sell_fwd_oriented(plan: SellPlan, eid, col_T, gptr, value, x,
                            *, transpose: bool = False):
    """Blocked fused forward over one orientation's padded structure."""
    if transpose:
        M = plan.num_cols
        CB, GC = plan.rows_per_block_t, plan.group_capacity_t
    else:
        M = plan.num_rows
        CB, GC = plan.rows_per_block, plan.group_capacity
    G = plan.group
    K = x.shape[1]
    nblocks = -(-M // CB)
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)

    # pad streams so every dynamic_slice window is in range
    eid_pad = jnp.concatenate([eid, jnp.full((GC * G,), -1, jnp.int32)])
    col_pad = jnp.concatenate(
        [col_T, jnp.full((G, GC), x.shape[0], jnp.int32)], axis=1)
    gptr_pad = jnp.concatenate(
        [gptr, jnp.full((nblocks * CB + 1 - gptr.shape[0],),
                        gptr[-1], jnp.int32)])
    grp_off = jnp.arange(CB + 1, dtype=jnp.int32)

    def block_fn(b):
        r0 = b * CB
        gp_l = jnp.take(gptr_pad, r0 + grp_off, mode="clip")
        g0 = gp_l[0]
        gp_l = jnp.clip(gp_l - g0, 0, GC)
        cols = jax.lax.dynamic_slice(col_pad, (jnp.int32(0), g0), (G, GC))
        # value rearrangement reads `value` near-sequentially (eid is
        # monotone within rows) and transposes on-device — NOT G random
        # scalar gathers, which would be read-count-bound
        eids = jax.lax.dynamic_slice(eid_pad, (g0 * G,), (GC * G,))
        if value is None:
            val_T = (eids >= 0).astype(acc_dtype).reshape(GC, G).T
        else:
            val_T = jnp.where(
                eids >= 0,
                jnp.take(value, jnp.clip(eids, 0), mode="clip"),
                0).astype(acc_dtype).reshape(GC, G).T
        # fused level-1: G gathers summed elementwise — the (GC*G, K)
        # product is a fusion temporary, never an HBM buffer
        out = jnp.zeros((GC, K), acc_dtype)
        for i in range(G):
            out = out + jnp.take(x, cols[i], axis=0,
                                 mode="clip").astype(acc_dtype) * (
                val_T[i][:, None])
        out_b = _level2(out, gp_l, CB, plan.interpret, plan.l2_backend)
        return out_b.astype(acc_dtype)

    out = jax.lax.map(block_fn, jnp.arange(nblocks, dtype=jnp.int32))
    return out.reshape(nblocks * CB, K)[:M]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def spmm_sell(plan: SellPlan, s: SellStructure,
              value: Optional[jax.Array], x: jax.Array) -> jax.Array:
    """``A @ x`` (sum reduction) over a padded-group plan; differentiable
    in ``(value, x)``.  Output dtype follows ``x``; accumulation is f32
    (f64 when inputs are f64)."""
    out = _spmm_sell_fwd_oriented(plan, s.eid, s.col_T, s.gptr, value, x)
    return out.astype(x.dtype)


def _spmm_sell_fwd(plan, s, value, x):
    return spmm_sell(plan, s, value, x), (s, value, x)


def _spmm_sell_bwd(plan, res, g):
    from .kernels.spmm_pallas import sddmm_dot_chunked
    s, value, x = res
    if value is not None:
        d_value = sddmm_dot_chunked(s.row, s.col, g, x,
                                    out_dtype=value.dtype)
        value_t = jnp.take(value, s.perm_t)
    else:
        d_value = None
        value_t = None
    d_x = _spmm_sell_fwd_oriented(plan, s.eid_t, s.col_Tt, s.gptr_t,
                                  value_t, g, transpose=True)
    d_s = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), s)
    return d_s, d_value, d_x.astype(x.dtype)


spmm_sell.defvjp(_spmm_sell_fwd, _spmm_sell_bwd)
