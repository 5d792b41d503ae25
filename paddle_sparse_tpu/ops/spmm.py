"""Sparse @ dense matrix multiply (SpMM) — the framework's hottest kernel.

The reference does not implement ``spmm`` (unsupported list,
``/root/reference/README.md:45-61``); the upstream functional contract is
documented at ``README.md:267-300`` and is what this module provides, built
TPU-first:

* forward ``sum``/``mean``: gather rows of the dense operand by ``col``,
  scale by ``value`` and segment-reduce by ``row`` — an XLA gather + sorted
  segment-sum that XLA fuses.  A Pallas kernel
  (``ops/kernels/spmm_pallas.py``) replaces this path on TPU when it beats
  the XLA lowering.  For repeated large-scale calls on one structure,
  the round-4 flagship ``ops.spmm_seg2`` (segment-gathered, packed value
  layout) is ~1.4x faster at ogbn-products scale — it has its own
  plan/pack API because its value layout differs from COO order.
* forward ``min``/``max``: segment-min/max of products, empty rows zeroed.
* gradients: native JAX AD — the VJP of gather+segment-sum is exactly the
  transpose SpMM (scatter by ``col``) plus an SDDMM-style sampled dot for
  ``d value``, so autodiff already emits the operations a hand-written rule
  would.  Index arrays are integer-typed and therefore automatically
  non-differentiable, matching the reference's value-only autograd
  (``README.md:96``).

All entry points take ``num_rows`` / ``reduce`` statically, so they work both
eagerly (exact nnz) and under ``jit`` (padded buffers; pad with ``value = 0``,
``col = 0``, ``row = num_rows`` so padding lands in a dead row slot sliced off
by the caller — see ``core.matrix``).
"""
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def _expand(value: jax.Array, ndim_extra: int) -> jax.Array:
    return value.reshape(value.shape + (1,) * ndim_extra)


def _products(col, value, x):
    # mode="clip": padded entries carry col == N (one past the end); they
    # either have value 0 or land in the dead output row the caller slices
    # off, and clipping keeps eager (unjitted) evaluation legal.
    products = jnp.take(x, col, axis=0, mode="clip")
    if value is not None:
        products = products * _expand(value, x.ndim - 1)
    return products


def _row_counts(row, num_rows, dtype):
    return jax.ops.segment_sum(jnp.ones(row.shape, dtype), row,
                               num_segments=num_rows, indices_are_sorted=True)


def _pallas_applicable(x, reduce) -> bool:
    if reduce not in ("sum", "add"):
        return False
    if x.ndim != 2 or x.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    K = x.shape[1]
    return (K >= 128 and K % 128 == 0) or (K < 128 and 128 % K == 0)


def _tpu_platform() -> bool:
    """True when the lowering platform is a TPU.

    Keyed on the default *platform* — NOT on concrete device residence —
    so dispatch picks the fast path under ``jit`` tracing too (round-1
    bug: tracers always fell back to the slow XLA path; VERDICT.md round
    1, Weak #4).  A ``jax.default_device(...)`` context overrides the
    process default (the multichip dryrun runs a virtual CPU mesh on a
    TPU-attached process this way)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        platform = getattr(dev, "platform", None) or str(dev)
        return platform in ("tpu", "axon")
    return jax.default_backend() in ("tpu", "axon")


def _spmm_sum_pallas_vjp(row, col, rowptr, num_rows):
    """Pallas forward + custom VJP (transpose-SpMM / SDDMM backward).

    Closes over the (non-differentiable) index structure so the custom_vjp
    is over (value, x) only — reference semantics: autograd on values.
    """
    from .kernels.spmm_pallas import segment_rows_matmul

    @jax.custom_vjp
    def f(value, x):
        products = jnp.take(x, col, axis=0, mode="clip")
        if value is not None:
            products = products * value[:, None]
        out = segment_rows_matmul(products, row, rowptr, num_rows)
        # kernel accumulates f32; match the XLA path's output dtype
        return out.astype(x.dtype)

    def fwd(value, x):
        return f(value, x), (value, x)

    def bwd(res, g):
        value, x = res
        g_rows = jnp.take(g, row, axis=0, mode="clip")
        if value is not None:
            d_value = (g_rows * jnp.take(x, col, axis=0, mode="clip")
                       ).sum(axis=1).astype(value.dtype)
            scaled = g_rows * value[:, None]
        else:
            d_value = None
            scaled = g_rows
        # d_x = A^T @ g — scatter by col (XLA segment formulation; the
        # all-Pallas transpose path needs pre-sorted CSC arrays, which the
        # CSR-bundle API below provides when available)
        d_x = jax.ops.segment_sum(scaled, col, num_segments=x.shape[0])
        return d_value, d_x.astype(x.dtype)

    f.defvjp(fwd, bwd)
    return f


class SpmmStructure(NamedTuple):
    """Device-resident index structure for the chunked SpMM bundle.

    CSR of A plus the CSC view as a CSR of A^T (``rowptr_t = colptr``,
    ``row_t = sorted col``, ``col_t = row[perm]``) and the sorting
    permutation for edge values.  Passed to jitted code as ARGUMENTS, never
    closed over: under remote-compile transports (axon tunnel) constants
    are serialized into the compile request, and a 124M-edge graph's index
    arrays exceed the request size limit (HTTP 413).

    ``rowptr``/``rowptr_t`` are PSEUDO-row pointers: rows longer than the
    plan's split cap are cut into pseudo-rows (a pure refinement of the
    pointer — the edge stream is untouched), bounding the chunk planner's
    max-over-blocks capacity on power-law graphs (r2: a zipf graph
    inflated edge capacity ~20x).  ``fold``/``fold_t`` map pseudo-rows
    back to real rows for the cheap post-reduction."""
    rowptr: jax.Array
    row: jax.Array
    col: jax.Array
    rowptr_t: jax.Array
    row_t: jax.Array
    col_t: jax.Array
    perm: jax.Array
    fold: jax.Array      # (num_pseudo,) pseudo-row -> row
    fold_t: jax.Array    # (num_pseudo_t,) pseudo-col -> col
    bs: jax.Array        # (nblocks + 1,) edge-balanced block row starts
    pos: jax.Array       # (nblocks * CR,) block-row -> pseudo-row scatter
    bs_t: jax.Array
    pos_t: jax.Array
    dv_map: jax.Array    # (nnz,) COO edge -> backward dv-window slot


class SpmmPlan(NamedTuple):
    """Static (hashable) chunking plan for :func:`spmm_chunked`."""
    num_rows: int
    num_cols: int
    rows_per_chunk: int
    edge_capacity: int
    rows_per_chunk_t: int
    edge_capacity_t: int
    num_pseudo: int = -1       # -1 => equals num_rows (no splitting)
    num_pseudo_t: int = -1
    nblocks: int = -1
    nblocks_t: int = -1
    interpret: bool = False
    # product-stream dtype choice, snapshotted from PSP_SPMM_STREAM at
    # plan-build time and threaded through as a static jit arg so the
    # compiled executable is keyed on it (ADVICE r3, medium: a trace-time
    # env read left stale choices in the jit cache)
    stream: str = "f32"


@functools.partial(jax.jit, static_argnames=("num_rows", "num_cols"))
def _spmm_structure(row, col, *, num_rows: int, num_cols: int):
    """CSR + CSC index structure in ONE compiled program — eager per-op
    dispatch through a remote tunnel costs seconds per op, which made the
    unjitted build take ~96 s at ogbn-products scale (round-3 bench)."""
    from .convert import ind2ptr
    rowptr = ind2ptr(row, num_rows)
    perm = jnp.argsort(col, stable=True)
    row_t = jnp.take(col, perm)                 # sorted: rows of A^T
    col_t = jnp.take(row, perm)
    colptr = ind2ptr(row_t, num_cols)
    return rowptr, perm, row_t, col_t, colptr


def _split_long_rows(rowptr_np, cap: int):
    """Refine a CSR pointer so no (pseudo-)row exceeds ``cap`` edges.

    Pure pointer refinement — the edge stream is untouched.  Returns
    ``(rowptr_pseudo, fold)`` with ``fold[p]`` the real row of pseudo-row
    ``p``; identity (``None`` fold) when nothing was split."""
    import numpy as np
    deg = np.diff(rowptr_np)
    splits = np.maximum(1, -(-deg // cap))
    P = int(splits.sum())
    M = deg.shape[0]
    if P == M:
        return rowptr_np, None
    fold = np.repeat(np.arange(M, dtype=np.int64), splits)
    starts = np.concatenate([[0], np.cumsum(splits)[:-1]])
    k = np.arange(P, dtype=np.int64) - starts[fold]
    ptr = np.minimum(rowptr_np[fold] + k * cap, rowptr_np[fold + 1])
    return (np.concatenate([ptr, rowptr_np[-1:]]),
            fold.astype(np.int32))


def make_spmm_plan(row, col, num_rows: int, num_cols: int, feat_dim: int,
                   target_bytes: int = 512 * 1024 * 1024):
    """Host-side setup for large-scale SpMM: builds the CSC permutation and
    chunk plans once per sparse structure (eager; requires concrete
    indices).  Returns ``(plan, structure)`` for :func:`spmm_chunked`.

    Power-law degree distributions are tamed by long-row splitting
    (:func:`_split_long_rows`) BEFORE chunk planning, so the planner's
    max-over-blocks edge capacity stays near the mean."""
    import numpy as np

    from .kernels.spmm_pallas import plan_edge_blocks

    row = jnp.asarray(row)
    col = jnp.asarray(col)
    rowptr, perm, row_t, col_t, colptr = _spmm_structure(
        row, col, num_rows=num_rows, num_cols=num_cols)
    # split cap: a fraction of the per-block edge budget so one hot row
    # cannot dominate a block
    budget_edges = max(2048, target_bytes // (feat_dim * 4))
    cap = max(2048, budget_edges // 16)
    rp_np, fold = _split_long_rows(np.asarray(rowptr, np.int64), cap)
    cp_np, fold_t = _split_long_rows(np.asarray(colptr, np.int64), cap)
    bs_np, CR, EC = plan_edge_blocks(rp_np, feat_dim,
                                     target_bytes=target_bytes)
    bs_t_np, CRT, ECT = plan_edge_blocks(cp_np, feat_dim,
                                         target_bytes=target_bytes)
    interpret = not _tpu_platform()   # default_device(cpu) aware
    num_pseudo = int(rp_np.shape[0]) - 1
    num_pseudo_t = int(cp_np.shape[0]) - 1
    from .kernels.spmm_pallas import _stream_env
    plan = SpmmPlan(num_rows, num_cols, CR, EC, CRT, ECT,
                    num_pseudo=num_pseudo, num_pseudo_t=num_pseudo_t,
                    nblocks=int(bs_np.shape[0]) - 1,
                    nblocks_t=int(bs_t_np.shape[0]) - 1,
                    interpret=interpret, stream=_stream_env())
    idx = jnp.int32

    def scatter_pos(bs, CRv, P):
        nb = bs.shape[0] - 1
        i = np.arange(nb * CRv, dtype=np.int64)
        b = i // CRv
        off = i - b * CRv
        pos = bs[b].astype(np.int64) + off
        pos = np.where(off < (bs[b + 1] - bs[b]), pos, P + 1)
        return pos.astype(np.int32)

    structure = SpmmStructure(
        jnp.asarray(rp_np, idx), row, col, jnp.asarray(cp_np, idx),
        row_t, col_t, perm,
        fold=(jnp.asarray(fold) if fold is not None
              else jnp.zeros((0,), idx)),
        fold_t=(jnp.asarray(fold_t) if fold_t is not None
                else jnp.zeros((0,), idx)),
        bs=jnp.asarray(bs_np, idx),
        pos=jnp.asarray(scatter_pos(bs_np, CR, num_pseudo), idx),
        bs_t=jnp.asarray(bs_t_np, idx),
        pos_t=jnp.asarray(scatter_pos(bs_t_np, CRT, num_pseudo_t), idx),
        dv_map=jnp.asarray(
            _dv_window_map(np.asarray(cp_np, np.int64), bs_t_np, ECT,
                           np.asarray(perm, np.int64)), idx))
    return plan, structure


def _dv_window_map(colptr_np, bs_t_np, ECT: int, perm_np):
    """(nnz,) COO edge -> flat slot in the backward pass's stacked dv
    windows, composed at plan time so d_value is ONE gather (the scatter
    formulation cost two full scalar passes per step)."""
    import numpy as np
    nnz = perm_np.shape[0]
    e0s = colptr_np[bs_t_np.astype(np.int64)]          # window starts
    i = np.arange(nnz, dtype=np.int64)                 # CSC positions
    b = np.searchsorted(e0s, i, side="right") - 1
    flat_of_csc = b * ECT + (i - e0s[b])
    inv = np.empty(nnz, np.int64)
    inv[perm_np] = i
    return flat_of_csc[inv]


def _pseudo_rows(plan: SpmmPlan, transpose: bool) -> int:
    if transpose:
        return (plan.num_pseudo_t if plan.num_pseudo_t >= 0
                else plan.num_cols)
    return plan.num_pseudo if plan.num_pseudo >= 0 else plan.num_rows


def _fold_rows(out, fold, num_rows: int):
    """Collapse split pseudo-rows back to real rows (sorted segments)."""
    if int(out.shape[0]) == num_rows:
        return out
    return jax.ops.segment_sum(out, fold, num_segments=num_rows,
                               indices_are_sorted=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def spmm_chunked(plan: SpmmPlan, s: SpmmStructure,
                 value: Optional[jax.Array], x: jax.Array) -> jax.Array:
    """Memory-bounded fused Pallas SpMM (sum), differentiable in
    ``(value, x)``.  Backward d_x runs as a chunked *sorted* transpose
    SpMM over the CSC structure instead of an unsorted scatter; d_value is
    a chunked SDDMM."""
    from .kernels.spmm_pallas import spmm_csr_chunked
    out = spmm_csr_chunked(s.rowptr, s.row, s.col, value, x,
                           _pseudo_rows(plan, False),
                           plan.rows_per_chunk,
                           plan.edge_capacity, interpret=plan.interpret,
                           block_starts=s.bs, out_scatter=s.pos,
                           nblocks=plan.nblocks, stream=plan.stream)
    out = _fold_rows(out, s.fold, plan.num_rows)
    return out.astype(x.dtype)  # uniform dtype contract (ADVICE r1)


def _spmm_chunked_fwd(plan, s, value, x):
    return spmm_chunked(plan, s, value, x), (s, value, x)


def _spmm_chunked_bwd(plan, res, g):
    import numpy as np

    from .kernels.spmm_pallas import spmm_csr_chunked, spmm_sddmm_chunked
    s, value, x = res
    if value is not None:
        # fused pass over the CSC structure: d_x (transpose SpMM) and the
        # SDDMM d_value share the random g[col_t] gather — two gathered
        # streams instead of three (VERDICT r2 item 6)
        value_t = jnp.take(value, s.perm)
        d_x, dv_stack = spmm_sddmm_chunked(
            s.rowptr_t, s.row_t, s.col_t, value_t, g, x,
            num_rows=_pseudo_rows(plan, True),
            rows_per_chunk=plan.rows_per_chunk_t,
            edge_capacity=plan.edge_capacity_t, interpret=plan.interpret,
            block_starts=s.bs_t, out_scatter=s.pos_t,
            nblocks=plan.nblocks_t, raw_windows=True, stream=plan.stream)
        # one precomposed gather from the stacked windows to COO order
        d_value = jnp.take(dv_stack, s.dv_map,
                           mode="clip").astype(value.dtype)
    else:
        d_value = None
        d_x = spmm_csr_chunked(s.rowptr_t, s.row_t, s.col_t, None, g,
                               _pseudo_rows(plan, True),
                               plan.rows_per_chunk_t,
                               plan.edge_capacity_t,
                               interpret=plan.interpret,
                               block_starts=s.bs_t, out_scatter=s.pos_t,
                               nblocks=plan.nblocks_t, stream=plan.stream)
    d_x = _fold_rows(d_x, s.fold_t, plan.num_cols)
    d_s = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), s)
    return d_s, d_value, d_x.astype(x.dtype)


spmm_chunked.defvjp(_spmm_chunked_fwd, _spmm_chunked_bwd)


# plan caches: keyed on the col array's identity (jax.Arrays are
# unhashable, so id + weakref liveness check) so repeated eager calls on
# the same sparse structure plan once
_SPMM_PLAN_CACHE = {}
_SELL_CACHE = {}


def _cached_spmm_plan(row, col, num_rows: int, num_cols: int,
                      feat_dim: int, key_row=None, key_col=None):
    """Plan cache keyed on the CALLER'S index objects.

    ``key_row``/``key_col`` default to ``row``/``col`` but callers that
    convert inputs first (``spmm_coo`` runs ``jnp.asarray`` before
    dispatch) pass the pre-conversion objects — otherwise a numpy/list
    input mints a fresh jax array (new ``id``) per call and the full plan
    build reruns on every eager invocation (ADVICE r3, medium).  Mutating
    a cached numpy index array in place yields a stale plan; reconstruct
    the array instead."""
    import weakref
    key_row = row if key_row is None else key_row
    key_col = col if key_col is None else key_col
    key = (id(key_col), feat_dim)
    ent = _SPMM_PLAN_CACHE.get(key)
    if (ent is not None and ent[0]() is key_col and ent[1]() is key_row
            and ent[2] == (num_rows, num_cols)):
        return ent[3], ent[4]
    plan, structure = make_spmm_plan(row, col, num_rows, num_cols,
                                     feat_dim)
    try:
        _SPMM_PLAN_CACHE[key] = (
            weakref.ref(key_col,
                        lambda _: _SPMM_PLAN_CACHE.pop(key, None)),
            weakref.ref(key_row), (num_rows, num_cols), plan, structure)
    except TypeError:       # unweakrefable index type (e.g. np scalar)
        pass
    return plan, structure


def _cached_sell_plan(row, col, num_rows: int, num_cols: int,
                      feat_dim: int, key_row=None, key_col=None):
    import weakref

    from .spmm_sell import make_sell_plan
    key_row = row if key_row is None else key_row
    key_col = col if key_col is None else key_col
    key = id(key_col)
    ent = _SELL_CACHE.get(key)
    if (ent is not None and ent[0]() is key_col and ent[1]() is key_row
            and ent[2] == (num_rows, num_cols)):
        return ent[3], ent[4]
    plan, structure = make_sell_plan(row, col, num_rows, num_cols,
                                     feat_dim=feat_dim)
    try:
        _SELL_CACHE[key] = (
            weakref.ref(key_col, lambda _: _SELL_CACHE.pop(key, None)),
            weakref.ref(key_row), (num_rows, num_cols), plan, structure)
    except TypeError:       # unweakrefable index type (e.g. np scalar)
        pass
    return plan, structure


def _sell_applicable(x, reduce) -> bool:
    return (reduce in ("sum", "add") and x.ndim == 2
            and jnp.issubdtype(x.dtype, jnp.floating))


def spmm_coo(row: jax.Array, col: jax.Array, value: Optional[jax.Array],
             x: jax.Array, num_rows: int, reduce: str = "sum",
             backend: str = "auto") -> jax.Array:
    """``out[m] = reduce_{e: row[e]=m} value[e] * x[col[e]]``.

    ``row`` must be sorted ascending (canonical storage order).  ``value``
    may be ``None`` (implicit ones).  ``num_rows`` and ``reduce`` are static.
    Differentiable in ``value`` and ``x``.

    ``backend``: "auto" picks, on TPU, the Pallas streaming kernel (the
    memory-bounded chunked driver for concrete structures);
    elsewhere the XLA segment formulation.  "xla" / "pallas" / "sell"
    force a path.  The padded-group "sell" path is explicit-only: measured
    on v5e (round 3) its unrolled gather sum does not stay fused once the
    output must be materialized, so it is slower than the Pallas path at
    scale.
    """
    concrete = not (isinstance(row, jax.core.Tracer)
                    or isinstance(col, jax.core.Tracer))
    row_in, col_in = row, col   # pre-asarray objects: plan-cache keys
    row = jnp.asarray(row)
    col = jnp.asarray(col)

    use_sell = backend == "sell"
    if use_sell:
        if not (concrete and _sell_applicable(x, reduce)):
            raise ValueError(
                "backend='sell' needs concrete (non-traced) indices, a 2-D "
                "float dense operand and reduce='sum' — build a plan with "
                "ops.spmm_sell.make_sell_plan for jitted use")
        from .spmm_sell import spmm_sell
        if value is not None:
            value = jnp.asarray(value)
        plan, structure = _cached_sell_plan(row, col, num_rows,
                                            int(x.shape[0]),
                                            int(x.shape[-1]),
                                            key_row=row_in,
                                            key_col=col_in)
        return spmm_sell(plan, structure, value, x)

    use_pallas = (backend == "pallas"
                  or (backend == "auto" and _tpu_platform()
                      and _pallas_applicable(x, reduce)))
    if use_pallas and _pallas_applicable(x, reduce):
        if value is not None:
            value = jnp.asarray(value)
            common = jnp.promote_types(value.dtype, x.dtype)
            value = value.astype(common)
            x = x.astype(common)
        # Concrete structures always take the chunked driver: it bounds
        # peak HBM AND its backward d_x runs as a *sorted* transpose SpMM
        # over the CSC view instead of an unsorted scatter (VERDICT r2
        # item 6).  Plans are cached per structure identity.
        if concrete:
            plan, structure = _cached_spmm_plan(row, col, num_rows,
                                                int(x.shape[0]),
                                                int(x.shape[-1]),
                                                key_row=row_in,
                                                key_col=col_in)
            return spmm_chunked(plan, structure, value, x).astype(x.dtype)
        from .convert import ind2ptr
        rowptr = ind2ptr(row, num_rows)
        return _spmm_sum_pallas_vjp(row, col, rowptr, num_rows)(value, x)
    if value is not None:
        value = jnp.asarray(value)
        if value.ndim != 1:
            raise ValueError("spmm expects scalar edge values (1-D)")
        common = jnp.promote_types(value.dtype, x.dtype)
        value = value.astype(common)
        x = x.astype(common)

    if reduce in ("sum", "add", "mean"):
        out = jax.ops.segment_sum(_products(col, value, x), row,
                                  num_segments=num_rows,
                                  indices_are_sorted=True)
        if reduce == "mean":
            deg = _row_counts(row, num_rows, out.dtype)
            deg = jnp.maximum(deg, 1).reshape((-1,) + (1,) * (out.ndim - 1))
            out = out / deg
        return out

    if reduce in ("min", "max"):
        fn = jax.ops.segment_max if reduce == "max" else jax.ops.segment_min
        out = fn(_products(col, value, x), row, num_segments=num_rows,
                 indices_are_sorted=True)
        counts = _row_counts(row, num_rows, jnp.int32)
        mask = (counts == 0).reshape((-1,) + (1,) * (out.ndim - 1))
        return jnp.where(mask, jnp.zeros((), out.dtype), out)

    raise ValueError(f"unknown reduction {reduce!r}")


def spmm_csr(rowptr: jax.Array, col: jax.Array, value: Optional[jax.Array],
             x: jax.Array, reduce: str = "sum",
             backend: str = "auto") -> jax.Array:
    """CSR entry point: derives sorted COO rows from ``rowptr``."""
    from .convert import ptr2ind
    num_rows = int(rowptr.shape[0]) - 1
    row = ptr2ind(rowptr, int(col.shape[0]))
    return spmm_coo(row, col, value, x, num_rows, reduce, backend=backend)
