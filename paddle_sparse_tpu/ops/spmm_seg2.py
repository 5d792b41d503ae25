"""Segment-outer source-blocked SpMM — the round-4 flagship forward path.

Measured basis (TPU v5e, experiments/r4_gather_curve.py / r4_gather_width.py):

* XLA's materializing row-gather runs ~2x faster (190M rows/s, bf16
  K=256) when the source buffer is at most ~64 MB — regardless of source
  ROW count; the gate is source *bytes* (the emitter keeps a small source
  resident on-chip).  Larger sources run ~100-120M rows/s.
* Independent gathers do not overlap; sorted indices are not faster; the
  per-edge multiply by ``value`` rides along free.

Round-3's ``spmm_seg`` exploited the same fast mode but looped
(row-block x segment) windows, re-slicing each 64 MB segment once per
row block (~150 GB of copies at ogbn-products scale) and paying the
work-item kernel's tile-visit overhead per window — it tied the flagship
in situ.  This module restructures the computation *segment-outer*:

    for s in segments:                         # S = ceil(N / SR) passes
        src   = x[s*SR:(s+1)*SR]               # one 64 MB slice per pass
        prod  = take(src, local_cols) * vals   # FAST-mode gather
        out   = reduce_rows(prod, acc=out)     # Pallas kernel, acc fused

Each segment is sliced exactly once, the (nnz, K) product stream exists
only one segment window at a time, and the output accumulates across
passes *inside* the reduction kernel (one read + one write per tile per
pass — no separate add).

Edge order: the structure stores edges in (segment, row)-sorted order;
values live in that packed layout (convert once with :func:`pack_values`
— like CSR keeps values in CSR order).  The backward runs the same
machinery over the transpose structure (d_x = A^T @ g with g-segments in
fast mode) and fuses the SDDMM value-gradient into the same pass, sharing
the fast g-gather.

The reference has no SpMM (unsupported list, /root/reference/README.md:45);
the functional contract implemented here is the upstream one documented
at /root/reference/README.md:267-300 (autograd on values only,
README.md:96).
"""
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# fast-gather source ceiling (bytes), measured on v5e: 64 MB sources hit
# ~190M rows/s; 128 MB fall to ~100M rows/s
FAST_SRC_BYTES = 64 << 20


class Seg2Plan(NamedTuple):
    """Static (hashable) geometry for :func:`spmm_seg2`."""
    num_rows: int
    num_cols: int
    S: int             # number of source segments (forward)
    SR: int            # rows per source segment (power of two)
    S_t: int           # segments over the transpose source (g rows)
    SR_t: int
    EC: int            # max edges per forward segment window (chunk-padded)
    EC_t: int
    chunk: int = 1024  # kernel edge-chunk size E
    interpret: bool = False
    stream: str = "f32"


class Seg2Structure(NamedTuple):
    """Device-resident reordered index structure.

    Forward layout: edges sorted by (source segment, row).  Transpose
    layout: edges sorted by (g-segment of ``row``, col).  All passed to
    jitted code as ARGUMENTS (remote-compile transports reject giant
    constants)."""
    col_f: jax.Array       # (nnz,) segment-LOCAL cols, fwd layout
    rp_f: jax.Array        # (S, M+1) absolute row pointers per segment
    perm_f: jax.Array      # (nnz,) fwd position -> COO position
    col_t: jax.Array       # (nnz,) segment-local g-rows, transpose layout
    rp_t: jax.Array        # (S_t, N+1) absolute out-row pointers
    xrow_t: jax.Array      # (nnz,) global x-row (= colA) per t-edge
    relay_ft: jax.Array    # (nnz,) t position -> fwd position (values)
    dv_map: jax.Array      # (nnz,) fwd position -> dv window slot


def _lg2(v: int) -> int:
    return int(v).bit_length() - 1


def _pick_sr(num_src_rows: int, feat_dim: int, stream_bytes: int) -> int:
    sr = 1 << _lg2(max(8, FAST_SRC_BYTES // max(1, feat_dim
                                                * stream_bytes)))
    # no point segmenting finer than the (pow2-rounded) source itself
    while sr // 2 >= num_src_rows and sr > 8:
        sr //= 2
    return sr


def _counting_order(bucket: jax.Array, S: int):
    """Stable counting sort by a small-range key: returns ``(order,
    wptr)`` with ``order[i]`` the input position of sorted slot ``i``.
    ``S`` passes of cumsum — no device argsort (an int argsort of a
    full-scale edge stream is ~minutes on this toolchain)."""
    nnz = bucket.shape[0]
    counts = jnp.zeros((S,), jnp.int32).at[bucket].add(1)
    wptr = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(counts).astype(jnp.int32)])
    rank = jnp.zeros((nnz,), jnp.int32)
    for s_i in range(S):
        m = bucket == s_i
        cum = jnp.cumsum(m.astype(jnp.int32))
        rank = jnp.where(m, cum - 1, rank)
    pos = jnp.take(wptr, bucket) + rank
    order = jnp.zeros((nnz,), jnp.int32).at[pos].set(
        jnp.arange(nnz, dtype=jnp.int32))
    return order, wptr


def _seg_rowptrs(seg_sorted: jax.Array, row_sorted: jax.Array, S: int,
                 M: int):
    """(S, M+1) absolute row pointers of a (segment, row)-sorted stream,
    via a 2-D count + per-segment cumsum (no composite sort keys — no
    int32 overflow hazard at any M, N)."""
    counts = jnp.zeros((S, M), jnp.int32).at[seg_sorted, row_sorted].add(1)
    within = jnp.concatenate(
        [jnp.zeros((S, 1), jnp.int32),
         jnp.cumsum(counts, axis=1).astype(jnp.int32)], axis=1)
    seg_tot = within[:, -1]
    base = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(seg_tot).astype(jnp.int32)[:-1]])
    return within + base[:, None]


def make_seg2_plan(row, col, num_rows: int, num_cols: int, *,
                   feat_dim: int, stream: Optional[str] = None,
                   chunk_edges: int = 1024,
                   sr: Optional[int] = None):
    """Plan builder (eager; concrete indices).  Returns
    ``(plan, structure)`` for :func:`spmm_seg2`.

    All nnz-sized work runs ON DEVICE in two jitted programs — through a
    remote-attached device (axon tunnel) host round-trips of edge-stream
    arrays cost minutes, so only two scalars (the window maxima) ever
    reach the host.

    CONTRACT: ``row`` sorted ascending (canonical COO order).  ``sr``
    overrides the measured fast-gather segment size (power of two;
    testing/tuning only)."""
    from .kernels.spmm_pallas import _stream_env

    stream = stream or _stream_env()
    stream_bytes = 2 if stream == "bf16" else 4

    row = jnp.asarray(row, jnp.int32)
    col = jnp.asarray(col, jnp.int32)
    nnz = int(row.shape[0])
    M, N = num_rows, num_cols

    def cdiv(a, b):
        return -(-a // b)

    def rnd(v, m):
        return max(m, cdiv(int(v), m) * m)

    SR = sr or _pick_sr(N, feat_dim, stream_bytes)
    assert SR & (SR - 1) == 0, "segment size must be a power of two"
    S = max(1, cdiv(N, SR))
    SR_t = sr or _pick_sr(M, feat_dim, stream_bytes)
    S_t = max(1, cdiv(M, SR_t))

    @functools.partial(jax.jit, static_argnames=("S", "SR", "S_t", "SR_t",
                                                 "M", "N"))
    def build(row, col, *, S, SR, S_t, SR_t, M, N):
        sorted_ok = jnp.all(jnp.diff(row) >= 0) if row.shape[0] else \
            jnp.bool_(True)
        # ---- forward layout: stable bucket by x-segment (rows stay
        # sorted within each segment because the input is row-sorted) ----
        seg = (col >> _lg2(SR)).astype(jnp.int32)
        order_f, _ = _counting_order(seg, S)
        col_f = jnp.take(col, order_f) - (jnp.take(seg, order_f)
                                          << _lg2(SR))
        rp_f = _seg_rowptrs(jnp.take(seg, order_f),
                            jnp.take(row, order_f), S, M)

        # ---- transpose layout: CSC order (argsort by col — stable), then
        # stable bucket by g-segment of the original row ----
        perm_c = jnp.argsort(col, stable=True).astype(jnp.int32)
        rowc = jnp.take(row, perm_c)
        seg_t = (rowc >> _lg2(SR_t)).astype(jnp.int32)
        order_t2, _ = _counting_order(seg_t, S_t)
        perm_t = jnp.take(perm_c, order_t2)
        col_t = jnp.take(rowc, order_t2) - (jnp.take(seg_t, order_t2)
                                            << _lg2(SR_t))
        xrow_t = jnp.take(jnp.take(col, perm_c), order_t2)
        rp_t = _seg_rowptrs(jnp.take(seg_t, order_t2), xrow_t, S_t, N)

        max_f = (rp_f[:, -1] - rp_f[:, 0]).max() if S else jnp.int32(nnz)
        max_t = (rp_t[:, -1] - rp_t[:, 0]).max() if S_t else \
            jnp.int32(nnz)
        return (order_f, col_f, rp_f, perm_t, col_t, xrow_t, rp_t,
                max_f, max_t, sorted_ok)

    (order_f, col_f, rp_f, perm_t, col_t, xrow_t, rp_t,
     max_f, max_t, sorted_ok) = build(row, col, S=S, SR=SR, S_t=S_t,
                                      SR_t=SR_t, M=M, N=N)
    if not bool(sorted_ok):
        raise ValueError(
            "make_seg2_plan requires row indices sorted ascending "
            "(canonical COO order); sort/coalesce the structure first")
    EC = rnd(int(max_f), chunk_edges)
    EC_t = rnd(int(max_t), chunk_edges)

    @functools.partial(jax.jit, static_argnames=("EC_t",))
    def relays(order_f, perm_t, wptr_t, *, EC_t):
        nnz_ = order_f.shape[0]
        ar = jnp.arange(nnz_, dtype=jnp.int32)
        inv_f = jnp.zeros((nnz_,), jnp.int32).at[order_f].set(ar)
        inv_t = jnp.zeros((nnz_,), jnp.int32).at[perm_t].set(ar)
        relay_ft = jnp.take(inv_f, perm_t)       # t pos -> fwd pos
        relay_tf = jnp.take(inv_t, order_f)      # fwd pos -> t pos
        # dv window slot of each t position: window s spans
        # [wptr_t[s], wptr_t[s]+EC_t) of the stacked (S_t, EC_t) buffer
        s_of_t = (jnp.searchsorted(wptr_t, ar, side="right") - 1
                  ).astype(jnp.int32)
        slot_t = s_of_t * EC_t + (ar - jnp.take(wptr_t, s_of_t))
        dv_map = jnp.take(slot_t, relay_tf)      # fwd pos -> dv slot
        return relay_ft, dv_map

    wptr_t = jnp.concatenate([rp_t[:, 0], rp_t[-1:, -1]])
    relay_ft, dv_map = relays(order_f, perm_t, wptr_t, EC_t=EC_t)

    plan = Seg2Plan(M, N, S, SR, S_t, SR_t, EC, EC_t,
                    chunk=chunk_edges,
                    interpret=jax.default_backend() == "cpu",
                    stream=stream)
    structure = Seg2Structure(
        col_f=col_f, rp_f=rp_f, perm_f=order_f, col_t=col_t, rp_t=rp_t,
        xrow_t=xrow_t, relay_ft=relay_ft, dv_map=dv_map)
    return plan, structure


@jax.jit
def pack_values(s: Seg2Structure, value: jax.Array) -> jax.Array:
    """COO-ordered (nnz,) values -> the format's fwd layout (one-time
    conversion per operand; the packed vector is the autograd leaf)."""
    return jnp.take(value, s.perm_f)


@jax.jit
def unpack_values(s: Seg2Structure, packed: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_values`."""
    nnz = packed.shape[0]
    return jnp.zeros((nnz,), packed.dtype).at[s.perm_f].set(packed)


def _seg_pass(cols, rp, vals, x, *, out_rows: int, S: int, SR: int,
              EC: int, E: int, interpret: bool, pdt,
              extra_per_seg=None):
    """Shared segment-outer pass: fast-mode gather + accumulated Pallas
    row reduction.  ``extra_per_seg(s, raw_rows, cols_l, e0)`` optionally
    computes a per-segment side product (the fused SDDMM); its stacked
    results are returned alongside the output."""
    import jax.experimental.pallas as pl

    from .kernels.spmm_pallas import (_reduce_call, _row_bounds,
                                      _work_items_chunk_major)

    K = x.shape[1]
    R = 128
    num_tiles = pl.cdiv(out_rows, R)
    NCE = EC // E

    pad_src = S * SR - x.shape[0]
    x_n = x.astype(pdt)
    x_pad = (jnp.concatenate([x_n, jnp.zeros((pad_src, K), pdt)])
             if pad_src else x_n)
    colp = jnp.concatenate([cols, jnp.zeros((EC,), jnp.int32)])
    valp = (jnp.concatenate([vals.astype(pdt), jnp.zeros((EC,), pdt)])
            if vals is not None else None)

    row_pad = num_tiles * R - out_rows
    arange_tp = jnp.arange(num_tiles + 1, dtype=jnp.int32) * R

    def body(s, carry):
        out, extra = carry
        w0 = rp[s, 0]
        cnt = rp[s, out_rows] - w0
        rp_l = jnp.clip(rp[s] - w0, 0, EC).astype(jnp.int32)
        rp_full = jnp.concatenate(
            [rp_l, jnp.broadcast_to(cnt.astype(jnp.int32), (row_pad,))])
        bounds_start, bounds_end = _row_bounds(rp_full, num_tiles, R, EC)
        tp = rp_full[jnp.minimum(arange_tp, num_tiles * R)]
        items = _work_items_chunk_major(tp, NCE, num_tiles, E)

        cols_l = jax.lax.dynamic_slice(colp, (w0,), (EC,))
        src = jax.lax.optimization_barrier(jax.lax.dynamic_slice(
            x_pad, ((s * SR).astype(jnp.int32), jnp.int32(0)), (SR, K)))
        raw = jnp.take(src, cols_l, axis=0, mode="clip")
        prod = raw if valp is None else (
            raw * jax.lax.dynamic_slice(valp, (w0,), (EC,))[:, None])
        out = _reduce_call(bounds_start, bounds_end, prod, items,
                           num_tiles, R, E, K, split=True,
                           interpret=interpret, acc=out)
        if extra_per_seg is not None:
            extra = extra.at[s].set(extra_per_seg(s, raw, cols_l, w0))
        return out, extra

    out0 = jnp.zeros(((num_tiles + 1) * R, K), jnp.float32)
    extra0 = (jnp.zeros((S, EC), jnp.float32)
              if extra_per_seg is not None else jnp.zeros((0,)))
    out, extra = jax.lax.fori_loop(0, S, body, (out0, extra0))
    return out[:out_rows], extra


def _fwd_impl(plan: Seg2Plan, s: Seg2Structure, packed_value, x):
    from .kernels.spmm_pallas import _product_dtype
    pdt = _product_dtype(packed_value, x, plan.stream)
    out, _ = _seg_pass(s.col_f, s.rp_f, packed_value, x,
                       out_rows=plan.num_rows, S=plan.S, SR=plan.SR,
                       EC=plan.EC, E=plan.chunk,
                       interpret=plan.interpret, pdt=pdt)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def spmm_seg2(plan: Seg2Plan, s: Seg2Structure,
              packed_value: Optional[jax.Array],
              x: jax.Array) -> jax.Array:
    """``A @ x`` (sum reduction), differentiable in ``(packed_value, x)``.

    ``packed_value``: values in the fwd layout (:func:`pack_values`), or
    ``None`` for structural ones."""
    out = _fwd_impl(plan, s, packed_value, x)
    return out.astype(x.dtype)


def _spmm_seg2_fwd(plan, s, packed_value, x):
    return spmm_seg2(plan, s, packed_value, x), (s, packed_value, x)


def _spmm_seg2_bwd(plan, res, g):
    from .kernels.spmm_pallas import _product_dtype
    s, packed_value, x = res
    pdt = _product_dtype(packed_value, g, plan.stream)
    if packed_value is not None:
        value_t = jnp.take(packed_value, s.relay_ft)
        xrow_p = jnp.concatenate(
            [s.xrow_t, jnp.zeros((plan.EC_t,), jnp.int32)])
        x_n = x.astype(pdt)

        def sddmm(si, g_raw, cols_l, w0):
            # shares the fast g-gather (g_raw); x rows come from the
            # big-source gather (slow mode — the one unavoidable big
            # gather of the backward)
            xr = jnp.take(x_n, jax.lax.dynamic_slice(
                xrow_p, (w0,), (plan.EC_t,)), axis=0, mode="clip")
            return (g_raw.astype(jnp.float32)
                    * xr.astype(jnp.float32)).sum(axis=1)

        d_x, dv_stack = _seg_pass(
            s.col_t, s.rp_t, value_t, g, out_rows=plan.num_cols,
            S=plan.S_t, SR=plan.SR_t, EC=plan.EC_t, E=plan.chunk,
            interpret=plan.interpret, pdt=pdt, extra_per_seg=sddmm)
        d_value = jnp.take(dv_stack.reshape(-1), s.dv_map,
                           mode="clip").astype(packed_value.dtype)
    else:
        d_value = None
        d_x, _ = _seg_pass(s.col_t, s.rp_t, None, g,
                           out_rows=plan.num_cols, S=plan.S_t,
                           SR=plan.SR_t, EC=plan.EC_t, E=plan.chunk,
                           interpret=plan.interpret, pdt=pdt)
    d_s = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), s)
    return d_s, d_value, d_x.astype(x.dtype)


spmm_seg2.defvjp(_spmm_seg2_fwd, _spmm_seg2_bwd)
