"""Segment-gathered, band-reduced SpMM — the round-4 flagship path.

Measured basis (TPU v5e, experiments/r4_gather_curve.py, r4_gather_width.py,
r4_gather_insitu.py, r4_reduce_cost.py):

* XLA's materializing row-gather runs ~217M rows/s when the source
  buffer is at most ~64 MB (the gate is source *bytes*; offsets may be
  traced) vs ~100-130M rows/s for big sources.  Independent gathers do
  not overlap; sorted indices are not faster; the multiply by ``value``
  rides along free.
* The round-3 work-item reduction kernel costs ~1.3 us of fixed
  overhead per (chunk, tile) grid step — per-step tiny bounds/output
  block DMAs — which at S gather segments implies S x (rows/128) paid
  steps per full pass: ~0.8 s/iteration at ogbn-products scale, larger
  than the gather itself.

Design:

1. **Gather segment-wise** (fast mode): edges are (x-segment, row)-
   sorted; each segment's rows are gathered from a <= 64 MB slice of the
   dense operand.
2. **Reduce band-wise**: output rows are cut into bands sized so a whole
   band (f32) plus its per-(segment, row) bounds fit VMEM (v5e has
   128 MB physical VMEM; the default 16 MB compiler cap is raised).  For
   one band, ALL segments' edge windows are gathered into one stacked
   stream and a single Pallas call (``band_reduce_call``) folds every
   segment's contribution: the band and bounds stay VMEM-resident for
   the whole call, the grid walks edge chunks only, and each chunk
   touches a couple of consecutive 128-row slices via an inner loop.
   No cross-pass output accumulation ever touches HBM.

Values live in the packed (segment, row)-sorted layout (convert once
with :func:`pack_values` — like CSR keeps values in CSR order).  The
backward runs the same machinery over the transpose structure
(d_x = A^T @ g with g-segments in fast mode) and fuses the SDDMM
value-gradient into the same band passes, sharing the fast g-gather.

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
# ~190-217M rows/s; 128 MB fall to ~100M rows/s
FAST_SRC_BYTES = 64 << 20
# VMEM budget for the resident output band (f32)
BAND_VMEM_BYTES = 28 << 20


class Seg2Plan(NamedTuple):
    """Static (hashable) geometry for :func:`spmm_seg2`."""
    num_rows: int
    num_cols: int
    S: int             # source segments (forward)
    SR: int            # rows per source segment (power of two)
    BAND: int          # output rows per band (multiple of 128)
    cap: int           # edge capacity per (band, segment) window
    TMAX: int          # max 128-row slices a chunk touches
    S_t: int           # transpose-side geometry (source = g)
    SR_t: int
    BAND_t: int
    cap_t: int
    TMAX_t: int
    chunk: int = 512   # kernel edge-chunk size E
    interpret: bool = False
    stream: str = "f32"

    @property
    def bands(self) -> int:
        return -(-self.num_rows // self.BAND)

    @property
    def bands_t(self) -> int:
        return -(-self.num_cols // self.BAND_t)


class Seg2Structure(NamedTuple):
    """Device-resident reordered index structure.

    Forward layout: edges sorted by (source segment, row).  Transpose
    layout: edges sorted by (g-segment of ``row``, col).  All passed to
    jitted code as ARGUMENTS (remote-compile transports reject giant
    constants)."""
    col_f: jax.Array       # (nnz,) source-slice-LOCAL cols, fwd layout
    rp_f: jax.Array        # (S, bands*BAND+1) padded abs row pointers
    perm_f: jax.Array      # (nnz,) fwd position -> COO position
    sbase_f: jax.Array     # (S,) source slice base rows (clamped)
    col_t: jax.Array       # (nnz,) slice-local g-rows, transpose layout
    rp_t: jax.Array        # (S_t, bands_t*BAND_t+1)
    sbase_t: jax.Array     # (S_t,)
    xrow_t: jax.Array      # (nnz,) global x-row (= colA) per t-edge
    relay_ft: jax.Array    # (nnz,) t position -> fwd position (values)
    dv_map: jax.Array      # (nnz,) fwd position -> dv band-window slot


def _lg2(v: int) -> int:
    return int(v).bit_length() - 1


def _pick_sr(num_src_rows: int, feat_dim: int, stream_bytes: int) -> int:
    sr = 1 << _lg2(max(8, FAST_SRC_BYTES // max(1, feat_dim
                                                * stream_bytes)))
    # no point segmenting finer than the (pow2-rounded) source itself
    while sr // 2 >= num_src_rows and sr > 8:
        sr //= 2
    return sr


def _pick_band(feat_dim: int) -> int:
    rows = BAND_VMEM_BYTES // max(1, feat_dim * 4)
    return max(128, (rows // 128) * 128)


def _counting_order(bucket: jax.Array, S: int):
    """Stable counting sort by a small-range key: returns ``order`` with
    ``order[i]`` the input position of sorted slot ``i``.  ``S`` passes
    of cumsum — no device argsort (an int argsort of a full-scale edge
    stream is ~minutes on this toolchain)."""
    nnz = bucket.shape[0]
    counts = jnp.zeros((S,), jnp.int32).at[bucket].add(1)
    wptr = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(counts).astype(jnp.int32)])

    def body(s_i, rank):
        m = bucket == s_i
        cum = jnp.cumsum(m.astype(jnp.int32))
        return jnp.where(m, cum - 1, rank)

    # fori (not an unrolled python loop): the unrolled form let XLA keep
    # all S per-pass cumsum buffers live at once and OOM'd at full scale
    rank = jax.lax.fori_loop(0, S, body, jnp.zeros((nnz,), jnp.int32))
    pos = jnp.take(wptr, bucket) + rank
    return jnp.zeros((nnz,), jnp.int32).at[pos].set(
        jnp.arange(nnz, dtype=jnp.int32))


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


def _pad_rp(rp, M: int, rows_pad: int):
    """Pad the row dimension of (S, M+1) pointers to rows_pad+1 columns
    with each segment's end value (empty trailing rows)."""
    if rows_pad == M:
        return rp
    return jnp.concatenate(
        [rp, jnp.repeat(rp[:, -1:], rows_pad - M, axis=1)], axis=1)


@functools.partial(jax.jit, static_argnames=("S", "BAND", "bands"))
def _band_windows(rp, *, S: int, BAND: int, bands: int):
    """Plan-time (device): max edges over (band, segment) windows."""
    idx = jnp.arange(bands + 1, dtype=jnp.int32) * BAND
    sl = jnp.take(rp, idx, axis=1)              # (S, bands+1)
    return (sl[:, 1:] - sl[:, :-1]).max()


@functools.partial(jax.jit, static_argnames=("S", "BAND", "bands",
                                             "cap", "E"))
def _band_spans(rp, *, S: int, BAND: int, bands: int, cap: int, E: int):
    """Plan-time (device): max row span (from the 8-aligned first row)
    any E-edge chunk touches — bounds the kernel's inner slice loop."""
    ncs = max(1, cap // E)

    def one_band(b):
        sl = jax.lax.dynamic_slice(
            rp, (jnp.int32(0), (b * BAND).astype(jnp.int32)),
            (S, BAND + 1))
        local = sl - sl[:, :1]

        def one_seg(loc):
            q = jnp.arange(ncs, dtype=jnp.int32) * E
            r_lo = jnp.clip(
                jnp.searchsorted(loc, q, side="right") - 1, 0, BAND - 1)
            r_hi = jnp.clip(
                jnp.searchsorted(loc, q + E, side="left") - 1, 0,
                BAND - 1)
            return (jnp.maximum(r_hi, r_lo)
                    - (r_lo // 8) * 8 + 1).max()

        return jax.vmap(one_seg)(local).max()

    return jax.lax.map(one_band,
                       jnp.arange(bands, dtype=jnp.int32)).max()


def make_seg2_plan(row, col, num_rows: int, num_cols: int, *,
                   feat_dim: int, stream: Optional[str] = None,
                   chunk_edges: int = 512,
                   sr: Optional[int] = None,
                   band_rows: Optional[int] = None):
    """Plan builder (eager; concrete indices).  Returns
    ``(plan, structure)`` for :func:`spmm_seg2`.

    All nnz-sized work runs ON DEVICE in a handful of jitted phases —
    through a remote-attached device (axon tunnel) host round-trips of
    edge-stream arrays cost minutes, and a single fused program at
    ogbn-products scale overflows HBM; only a few scalars (window
    maxima) reach the host.

    CONTRACT: ``row`` sorted ascending (canonical COO order).  ``sr`` /
    ``band_rows`` override the measured geometry (testing/tuning)."""
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
    BAND = band_rows or _pick_band(feat_dim)
    BAND_t = BAND
    bands = max(1, cdiv(M, BAND))
    bands_t = max(1, cdiv(N, BAND_t))
    E = chunk_edges

    # ---- phase 1: forward layout (bucket by x-segment; rows stay
    # sorted within each segment because the input is row-sorted) -------
    @functools.partial(jax.jit, static_argnames=("S", "SR", "M", "N",
                                                 "rows_pad"))
    def build_fwd(row, col, *, S, SR, M, N, rows_pad):
        sorted_ok = jnp.all(jnp.diff(row) >= 0) if row.shape[0] else \
            jnp.bool_(True)
        seg = (col >> _lg2(SR)).astype(jnp.int32)
        order_f = _counting_order(seg, S)
        seg_f = jnp.take(seg, order_f)
        sbase = jnp.minimum(
            jnp.arange(S, dtype=jnp.int32) * SR,
            jnp.int32(max(0, N - SR)))   # clamped: last slice stays in x
        col_f = jnp.take(col, order_f) - jnp.take(sbase, seg_f)
        rp_f = _pad_rp(_seg_rowptrs(seg_f, jnp.take(row, order_f), S, M),
                       M, rows_pad)
        return order_f, col_f, rp_f, sbase, sorted_ok

    order_f, col_f, rp_f, sbase_f, sorted_ok = build_fwd(
        row, col, S=S, SR=SR, M=M, N=N, rows_pad=bands * BAND)
    if not bool(sorted_ok):
        raise ValueError(
            "make_seg2_plan requires row indices sorted ascending "
            "(canonical COO order); sort/coalesce the structure first")

    # ---- phase 2: transpose layout (CSC order, then bucket by the
    # g-segment of the original row) ------------------------------------
    @functools.partial(jax.jit, static_argnames=("S_t", "SR_t", "M", "N",
                                                 "rows_pad"))
    def build_t(row, col, *, S_t, SR_t, M, N, rows_pad):
        perm_c = jnp.argsort(col, stable=True).astype(jnp.int32)
        rowc = jnp.take(row, perm_c)
        seg_t = (rowc >> _lg2(SR_t)).astype(jnp.int32)
        order_t2 = _counting_order(seg_t, S_t)
        perm_t = jnp.take(perm_c, order_t2)
        sbase = jnp.minimum(
            jnp.arange(S_t, dtype=jnp.int32) * SR_t,
            jnp.int32(max(0, M - SR_t)))
        col_t = jnp.take(rowc, order_t2) - jnp.take(
            sbase, jnp.take(seg_t, order_t2))
        xrow_t = jnp.take(jnp.take(col, perm_c), order_t2)
        rp_t = _pad_rp(_seg_rowptrs(jnp.take(seg_t, order_t2), xrow_t,
                                    S_t, N), N, rows_pad)
        return perm_t, col_t, rp_t, sbase, xrow_t

    perm_t, col_t, rp_t, sbase_t, xrow_t = build_t(
        row, col, S_t=S_t, SR_t=SR_t, M=M, N=N,
        rows_pad=bands_t * BAND_t)

    # ---- phase 3: band geometry (two host scalars per orientation) ----
    cap = rnd(int(_band_windows(rp_f, S=S, BAND=BAND, bands=bands)), E)
    span_f = _band_spans(rp_f, S=S, BAND=BAND, bands=bands, cap=cap,
                         E=E)
    TMAX = max(1, cdiv(int(span_f), 128) + 1)
    cap_t = rnd(int(_band_windows(rp_t, S=S_t, BAND=BAND_t,
                                  bands=bands_t)), E)
    span_t = _band_spans(rp_t, S=S_t, BAND=BAND_t, bands=bands_t,
                         cap=cap_t, E=E)
    TMAX_t = max(1, cdiv(int(span_t), 128) + 1)

    # ---- phase 4: relays (precomposed scalar maps) ---------------------
    @functools.partial(jax.jit, static_argnames=("S_t", "BAND_t",
                                                 "cap_t"))
    def relays(order_f, perm_t, wptr_t, rp_t, xrow_t, *, S_t, BAND_t,
               cap_t):
        nnz_ = order_f.shape[0]
        ar = jnp.arange(nnz_, dtype=jnp.int32)
        inv_f = jnp.zeros((nnz_,), jnp.int32).at[order_f].set(ar)
        inv_t = jnp.zeros((nnz_,), jnp.int32).at[perm_t].set(ar)
        relay_ft = jnp.take(inv_f, perm_t)       # t pos -> fwd pos
        relay_tf = jnp.take(inv_t, order_f)      # fwd pos -> t pos
        # dv slot of each t position in the stacked per-band
        # (bands_t, S_t*cap_t) buffer: window (band b, span s) starts at
        # edge rp_t[s, b*BAND_t]
        s_of_t = (jnp.searchsorted(wptr_t, ar, side="right") - 1
                  ).astype(jnp.int32)
        # the transpose pass's output row of t-edge i IS xrow_t[i] (colA)
        b_of_t = (xrow_t // BAND_t).astype(jnp.int32)
        ncols = rp_t.shape[1]
        w0 = jnp.take(rp_t.reshape(-1),
                      s_of_t * ncols + b_of_t * BAND_t)
        slot = (b_of_t * S_t + s_of_t) * cap_t + (ar - w0)
        return relay_ft, jnp.take(slot, relay_tf)

    wptr_t = jnp.concatenate([rp_t[:, 0], rp_t[-1:, -1]])
    relay_ft, dv_map = relays(order_f, perm_t, wptr_t, rp_t, xrow_t,
                              S_t=S_t, BAND_t=BAND_t, cap_t=cap_t)

    plan = Seg2Plan(M, N, S, SR, BAND, cap, TMAX, S_t, SR_t, BAND_t,
                    cap_t, TMAX_t, chunk=E,
                    interpret=jax.default_backend() == "cpu",
                    stream=stream)
    structure = Seg2Structure(
        col_f=col_f, rp_f=rp_f, perm_f=order_f, sbase_f=sbase_f,
        col_t=col_t, rp_t=rp_t, sbase_t=sbase_t, xrow_t=xrow_t,
        relay_ft=relay_ft, dv_map=dv_map)
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


def _band_pass(cols, rp, sbase, vals, x, *, out_rows: int, S: int,
               SR: int, BAND: int, cap: int, TMAX: int, E: int,
               interpret: bool, pdt, extra_per_span=None):
    """Shared machinery: for each output band, gather every segment's
    edge window (fast mode) into one stacked stream and fold it with a
    single band-resident Pallas reduction.

    ``extra_per_span(s, raw_rows, e0)`` optionally computes a per-
    (band, segment) side product (the fused SDDMM); stacked results
    (bands, S*cap) are returned alongside the output."""
    from .kernels.spmm_pallas import band_reduce_call

    K = x.shape[1]
    R = 128
    bands = -(-out_rows // BAND)
    BR_pad = BAND + R
    ncs = cap // E

    x = x.astype(pdt)
    if x.shape[0] < SR:       # tiny operand: pad so the slice is legal
        x = jnp.concatenate(
            [x, jnp.zeros((SR - x.shape[0], K), x.dtype)])
    colp = jnp.concatenate([cols, jnp.zeros((cap,), jnp.int32)])
    valp = (jnp.concatenate([vals, jnp.zeros((cap,), vals.dtype)])
            if vals is not None else None)

    chunk_span = jnp.repeat(jnp.arange(S, dtype=jnp.int32), ncs)

    def band_fn(b):
        sl = jax.lax.dynamic_slice(
            rp, (jnp.int32(0), (b * BAND).astype(jnp.int32)),
            (S, BAND + 1))
        local = sl - sl[:, :1]                   # (S, BAND+1)
        win = local[:, -1]                       # edges per span

        # bounds, padded to BR_pad rows per span (empty pad rows)
        offs = (jnp.arange(S, dtype=jnp.int32) * cap)[:, None]
        padv = jnp.broadcast_to(win[:, None], (S, R))
        bst = jnp.concatenate([local[:, :-1], padv], axis=1) + offs
        ben = jnp.concatenate([local[:, 1:], padv], axis=1) + offs
        bst = bst.reshape(-1, 1)
        ben = ben.reshape(-1, 1)

        # per-chunk first row / slice count
        def seg_chunks(loc):
            q = jnp.arange(ncs, dtype=jnp.int32) * E
            r_lo = jnp.clip(
                jnp.searchsorted(loc, q, side="right") - 1, 0, BAND - 1)
            r_hi = jnp.clip(
                jnp.searchsorted(loc, q + E, side="left") - 1, 0,
                BAND - 1)
            r0 = (r_lo // 8) * 8
            nj = jnp.clip(-(-(jnp.maximum(r_hi, r_lo) - r0 + 1) // R),
                          0, TMAX)
            # empty chunk (start at/after span end): skip entirely
            nj = jnp.where(q < loc[-1], nj, 0)
            return r0, nj

        r0s, njs = jax.vmap(seg_chunks)(local)
        chunk_row0 = r0s.reshape(-1).astype(jnp.int32)
        chunk_nj = njs.reshape(-1).astype(jnp.int32)

        # stacked gather stream: one fast-mode gather per span
        parts = []
        extras = []
        for s_i in range(S):
            e0 = sl[s_i, 0]
            cols_l = jax.lax.dynamic_slice(colp, (e0,), (cap,))
            src = jax.lax.optimization_barrier(jax.lax.dynamic_slice(
                x, (jnp.take(sbase, s_i), jnp.int32(0)), (SR, K)))
            raw = jnp.take(src, cols_l, axis=0, mode="clip")
            if valp is None:
                parts.append(raw)
            else:
                vals_l = jax.lax.dynamic_slice(valp, (e0,), (cap,))
                parts.append(raw * vals_l[:, None].astype(pdt))
            if extra_per_span is not None:
                extras.append(extra_per_span(s_i, raw, e0))
        stream = jnp.concatenate(parts, axis=0)

        out_b = band_reduce_call(
            chunk_span, chunk_row0, chunk_nj, bst, ben, stream,
            S=S, BR_pad=BR_pad, E=E, K=K, R=R, TMAX=TMAX,
            split=True, interpret=interpret)[:BAND]
        extra_b = (jnp.concatenate(extras)
                   if extra_per_span is not None else jnp.zeros((0,)))
        return out_b, extra_b

    out, extra = jax.lax.map(band_fn, jnp.arange(bands, dtype=jnp.int32))
    return out.reshape(bands * BAND, K)[:out_rows], extra


def _fwd_impl(plan: Seg2Plan, s: Seg2Structure, packed_value, x):
    from .kernels.spmm_pallas import _product_dtype
    pdt = _product_dtype(packed_value, x, plan.stream)
    out, _ = _band_pass(s.col_f, s.rp_f, s.sbase_f, packed_value, x,
                        out_rows=plan.num_rows, S=plan.S, SR=plan.SR,
                        BAND=plan.BAND, cap=plan.cap, TMAX=plan.TMAX,
                        E=plan.chunk, interpret=plan.interpret, pdt=pdt)
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
            [s.xrow_t, jnp.zeros((plan.cap_t,), jnp.int32)])

        def sddmm(s_i, g_raw, e0):
            # shares the fast g-gather (g_raw); x rows come from the
            # big-source gather (slow mode — the one unavoidable big
            # gather of the backward); the narrow cast fuses into it
            xr = jnp.take(x, jax.lax.dynamic_slice(
                xrow_p, (e0,), (plan.cap_t,)), axis=0,
                mode="clip").astype(pdt)
            return (g_raw.astype(jnp.float32)
                    * xr.astype(jnp.float32)).sum(axis=1)

        d_x, dv_stack = _band_pass(
            s.col_t, s.rp_t, s.sbase_t, value_t, g,
            out_rows=plan.num_cols, S=plan.S_t, SR=plan.SR_t,
            BAND=plan.BAND_t, cap=plan.cap_t, TMAX=plan.TMAX_t,
            E=plan.chunk, interpret=plan.interpret, pdt=pdt,
            extra_per_span=sddmm)
        d_value = jnp.take(dv_stack.reshape(-1), s.dv_map,
                           mode="clip").astype(packed_value.dtype)
    else:
        d_value = None
        d_x, _ = _band_pass(s.col_t, s.rp_t, s.sbase_t, None, g,
                            out_rows=plan.num_cols, S=plan.S_t,
                            SR=plan.SR_t, BAND=plan.BAND_t,
                            cap=plan.cap_t, TMAX=plan.TMAX_t,
                            E=plan.chunk, interpret=plan.interpret,
                            pdt=pdt)
    d_s = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), s)
    return d_s, d_value, d_x.astype(x.dtype)


spmm_seg2.defvjp(_spmm_seg2_fwd, _spmm_seg2_bwd)
