"""Segment-outer source-blocked SpMM — the round-4 flagship path.

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
in situ.  This module restructures the computation *segment-outer*, with
each segment's edge window processed in W bounded sub-windows so the
product stream never exceeds a few hundred MB of HBM (full-scale
operands OOM'd a 16 GB chip otherwise):

    for s in segments:                   # S = ceil(N / SR) passes
      for w in sub-windows(s):           # bounded edge windows
        src  = x[sbase[s] : +SR]         # 64 MB slice (fast-mode gate)
        prod = take(src, local_cols) * vals        # FAST gather
        out[rlo..rlo+CRW] += reduce_rows(prod)     # Pallas, in-place

The reduction kernel accumulates IN PLACE into the full running output
(``input_output_aliases`` + a tile offset fed through scalar prefetch):
a sub-window touches only its own row range — one read + one write per
visited tile per pass, nothing else moves.  Edges are (segment,
row)-sorted, so each sub-window's rows are a contiguous range whose
tile-aligned starts (``rlo``) are precomputed at plan time.

Values live in the packed (segment, row)-sorted layout (convert once
with :func:`pack_values` — like CSR keeps values in CSR order).  The
backward (round-5 redesign, measured in experiments/r5_bwd_bisect.py /
r5_sddmm_micro.py) runs two passes:

* d_x = A^T @ g over the transpose structure (g-segments in fast mode)
  — same machinery as the forward, ~1.0x its cost;
* d_value (SDDMM) as a SEPARATE pass over the FORWARD geometry where
  BOTH gathers run fast-mode: x rows come from the 64 MB x-segment
  slice (as in the forward) and g rows from the sub-window's contiguous
  row-range slice — rows are sorted within a segment, so a sub-window's
  g rows live in one bounded slice.  dv is written directly in
  fwd-packed order, which eliminates round 4's two full-nnz relays
  (the (S_t*W_t, ECW_t) dv window stack — the full-scale power-law
  backward OOM — and the dv_map permutation gather, measured at
  ~8 ns/edge, pure issue cost).

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
# per-sub-window product-stream budget (bytes of gathered rows)
WINDOW_BYTES = 384 << 20


class Seg2Plan(NamedTuple):
    """Static (hashable) geometry for :func:`spmm_seg2`.

    Round-5: window counts are TOTALS over a FLATTENED edge-balanced
    window list (each segment contributes ceil(seg_edges / ECW)
    windows), not a per-segment-uniform grid — a per-segment-uniform
    (S, W) grid pads every segment to the largest one, which inflated
    the power-law transpose stream ~12x at full scale (the hot row
    holds most edges in ONE t-segment) and cost the zipf backward
    ~8 s of gathers on padding."""
    num_rows: int
    num_cols: int
    S: int             # source segments (forward)
    SR: int            # rows per source segment (power of two)
    W: int             # TOTAL fwd sub-windows (flattened, edge-balanced)
    ECW: int           # edge capacity per sub-window (chunk-padded)
    CRW: int           # max row span per sub-window (tile-padded)
    S_t: int           # transpose-side geometry (source = g)
    SR_t: int
    W_t: int           # TOTAL transpose sub-windows
    ECW_t: int
    CRW_t: int
    chunk: int = 512   # kernel edge-chunk size E
    interpret: bool = False
    stream: str = "f32"
    # SDDMM (d_value) pass geometry: same fwd segments, finer windows
    # so the row span fits the fast-gather gate as a g-source slice
    W_s: int = 1       # TOTAL sddmm sub-windows
    ECW_s: int = 0     # edge capacity per sddmm sub-window
    CRW_s: int = 128   # g-source slice height (0 = global-gather mode)


class Seg2Structure(NamedTuple):
    """Device-resident reordered index structure.

    Forward layout: edges sorted by (source segment, row).  Transpose
    layout: edges sorted by (g-segment of ``row``, col).  All passed to
    jitted code as ARGUMENTS (remote-compile transports reject giant
    constants)."""
    col_f: jax.Array       # (nnz,) source-slice-LOCAL cols, fwd layout
    rp_f: jax.Array        # (S, M+1) absolute row pointers per segment
    perm_f: jax.Array      # (nnz,) fwd position -> COO position
    sbase_f: jax.Array     # (S,) source slice base rows (clamped)
    rlo_f: jax.Array       # (S*W,) tile-aligned first row per sub-window
    col_t: jax.Array       # (nnz,) slice-local g-rows, transpose layout
    rp_t: jax.Array        # (S_t, N+1) absolute out-row pointers
    sbase_t: jax.Array     # (S_t,)
    rlo_t: jax.Array       # (W_t,)
    relay_ft: jax.Array    # (nnz,) t position -> fwd position (values)
    row_f: jax.Array       # (nnz,) GLOBAL rows, fwd layout (sddmm pass)
    rlo_s: jax.Array       # (W_s,) tile-aligned first row per sddmm
                           # sub-window
    # flattened-window maps (round 5): segment of window k and the
    # cumulative window count per segment (wptr[s] = first window of s)
    seg_of_f: jax.Array    # (W,)
    wptr_f: jax.Array      # (S+1,)
    seg_of_t: jax.Array    # (W_t,)
    wptr_t: jax.Array      # (S_t+1,)
    seg_of_s: jax.Array    # (W_s,)
    wptr_s: jax.Array      # (S+1,)


def _interpret_mode() -> bool:
    """Pallas interpret needed?  True when lowering targets CPU — keyed
    on the default DEVICE override first (like ops.spmm._tpu_platform): a
    ``jax.default_device(cpu)`` context (the multichip dry run on a
    TPU-attached process) must get interpret kernels even though
    ``jax.default_backend()`` still reports the TPU plugin."""
    from .spmm import _tpu_platform
    return not _tpu_platform()


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


@functools.partial(jax.jit, static_argnames=("S", "SR", "M", "N"))
def _build_fwd(row, col, *, S, SR, M, N):
    """Phase 1: forward layout — stable bucket by x-segment (rows stay
    sorted within each segment because the input is row-sorted).
    Module-level & shape-polymorphic so the sharded planner can vmap it
    over a device axis."""
    sorted_ok = jnp.all(jnp.diff(row) >= 0) if row.shape[0] else \
        jnp.bool_(True)
    seg = (col >> _lg2(SR)).astype(jnp.int32)
    order_f = _counting_order(seg, S)
    seg_f = jnp.take(seg, order_f)
    sbase = jnp.minimum(
        jnp.arange(S, dtype=jnp.int32) * SR,
        jnp.int32(max(0, N - SR)))   # clamped: last slice stays in x
    col_f = jnp.take(col, order_f) - jnp.take(sbase, seg_f)
    rp_f = _seg_rowptrs(seg_f, jnp.take(row, order_f), S, M)
    max_f = (rp_f[:, -1] - rp_f[:, 0]).max()
    return order_f, col_f, rp_f, sbase, max_f, sorted_ok


@functools.partial(jax.jit, static_argnames=("S_t", "SR_t", "M", "N"))
def _build_t(row, col, *, S_t, SR_t, M, N):
    """Phase 2: transpose layout — CSC order, then stable bucket by the
    g-segment of the original row."""
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
    rp_t = _seg_rowptrs(jnp.take(seg_t, order_t2), xrow_t, S_t, N)
    max_t = (rp_t[:, -1] - rp_t[:, 0]).max()
    return perm_t, col_t, rp_t, sbase, xrow_t, max_t


@functools.partial(jax.jit, static_argnames=("ECW",))
def _window_counts(rp, *, ECW):
    """Edge-balanced window count per segment: ceil(seg_edges / ECW)."""
    seg_len = rp[:, -1] - rp[:, 0]
    return -(-seg_len // ECW)


@functools.partial(jax.jit, static_argnames=("ECW", "NW", "M"))
def _flat_geom(rp, w_counts, *, ECW, NW, M):
    """Phase 3 (round 5): FLATTENED edge-balanced windows.  Window k of
    segment s = seg_of[k] covers edges [rp[s,0] + (k - wptr[s]) * ECW,
    +ECW) — every segment gets exactly the windows its edge count
    needs, so total capacity is ~nnz + S*ECW for ANY degree skew (the
    per-segment-uniform grid was O(S * max_seg) — 12x padding on
    power-law transpose streams).  Rows sorted within a segment => each
    window's touched rows are one contiguous range; returns their
    tile-aligned starts and the max span."""
    from .convert import _expand_ptr
    S = rp.shape[0]
    wptr = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(w_counts).astype(jnp.int32)])
    seg_of = jnp.clip(_expand_ptr(wptr, NW), 0, S - 1).astype(jnp.int32)
    ar = jnp.arange(NW, dtype=jnp.int32)
    # windows past the true total (padded NW) alias segment S-1 with
    # e0 past its end -> cnt 0 no-ops
    e0 = jnp.take(rp[:, 0], seg_of) + (ar - jnp.take(wptr, seg_of)
                                       ) * ECW

    def seg_body(s, carry):
        rlo, rhi = carry
        rps = rp[s]
        mask = seg_of == s
        q = jnp.where(mask, e0, 0)
        lo = jnp.clip(jnp.searchsorted(rps, q, side="right") - 1,
                      0, M - 1)
        # clamp the end query to the segment's last edge: a window
        # straddling the segment end must not claim the empty tail rows
        # (on skewed graphs that inflates the span to the whole row
        # space and the kernel fails to compile)
        hi = jnp.clip(
            jnp.searchsorted(rps, jnp.minimum(q + ECW, rps[-1]),
                             side="left") - 1, 0, M - 1)
        hi = jnp.maximum(hi, lo)
        return (jnp.where(mask, lo, rlo), jnp.where(mask, hi, rhi))

    rlo, rhi = jax.lax.fori_loop(
        0, S, seg_body, (jnp.zeros((NW,), jnp.int32),
                         jnp.zeros((NW,), jnp.int32)))
    rlo_t = ((rlo // 128) * 128).astype(jnp.int32)
    span = (rhi - rlo_t + 1).max()
    return seg_of, wptr, rlo_t, span


@jax.jit
def _relays(order_f, perm_t):
    """Phase 4: the value relay fwd->transpose (the one remaining
    full-nnz permutation of the backward — its cost is pure gather-issue
    rate, ~8 ns/edge measured)."""
    nnz_ = order_f.shape[0]
    ar = jnp.arange(nnz_, dtype=jnp.int32)
    inv_f = jnp.zeros((nnz_,), jnp.int32).at[order_f].set(ar)
    return jnp.take(inv_f, perm_t)           # t pos -> fwd pos


def make_seg2_plan(row, col, num_rows: int, num_cols: int, *,
                   feat_dim: int, stream: Optional[str] = None,
                   chunk_edges: Optional[int] = None,
                   sr: Optional[int] = None,
                   window_bytes: int = WINDOW_BYTES):
    """Plan builder (eager; concrete indices).  Returns
    ``(plan, structure)`` for :func:`spmm_seg2`.

    All nnz-sized work runs ON DEVICE in a handful of jitted phases —
    through a remote-attached device (axon tunnel) host round-trips of
    edge-stream arrays cost minutes, and a single fused program at
    ogbn-products scale overflows HBM; only a few scalars (window
    maxima) reach the host.

    CONTRACT: ``row`` sorted ascending (canonical COO order).  ``sr``
    overrides the measured fast-gather segment size (power of two;
    testing/tuning only)."""
    from .kernels.spmm_pallas import _stream_env

    stream = stream or _stream_env()
    stream_bytes = 2 if stream == "bf16" else 4
    if chunk_edges is None:
        # keep the kernel's per-chunk BYTES roughly constant: narrow K
        # pays the same per-grid-step fixed cost for fewer edges, so
        # scale the chunk up (measured: K=64 fwd 196 -> 189 ms at
        # E=2048; r5: K=256 fwd 136 -> 131 ms at E=1024)
        chunk_edges = min(4096, max(1024,
                                    512 * (512 // max(feat_dim, 1))))

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

    # ---- phase 1: forward layout ---------------------------------------
    order_f, col_f, rp_f, sbase_f, max_f, sorted_ok = _build_fwd(
        row, col, S=S, SR=SR, M=M, N=N)
    if not bool(sorted_ok):
        raise ValueError(
            "make_seg2_plan requires row indices sorted ascending "
            "(canonical COO order); sort/coalesce the structure first")

    # ---- phase 2: transpose layout -------------------------------------
    perm_t, col_t, rp_t, sbase_t, xrow_t, max_t = _build_t(
        row, col, S_t=S_t, SR_t=SR_t, M=M, N=N)

    # ---- window geometry (host scalars -> static plan) -----------------
    # flattened edge-balanced windows (round 5): window size = min of
    # the product-stream budget and the largest segment; each segment
    # gets ceil(seg_edges / ECW) windows
    E = chunk_edges
    win_edges = max(E, window_bytes // max(1, feat_dim * stream_bytes))

    def fit_ecw(max_seg):
        # fit the LARGEST segment with equal windows instead of fixing
        # ECW = the budget: a fixed ECW leaves each segment's last
        # window mostly empty (ceil slack — measured 12% slot blowup
        # and +10% full-scale fwd on uniform)
        max_seg = max(int(max_seg), 1)
        return rnd(cdiv(max_seg, cdiv(max_seg, win_edges)), E)

    ECW = fit_ecw(max_f)
    ECW_t = fit_ecw(max_t)

    # ---- phase 3: flattened windows + row spans ------------------------
    wc_f = _window_counts(rp_f, ECW=ECW)
    wc_t = _window_counts(rp_t, ECW=ECW_t)
    W = max(1, int(wc_f.sum()))
    W_t = max(1, int(wc_t.sum()))
    seg_of_f, wptr_f, rlo_f, span_f = _flat_geom(rp_f, wc_f, ECW=ECW,
                                                 NW=W, M=M)
    seg_of_t, wptr_t, rlo_t, span_t = _flat_geom(rp_t, wc_t, ECW=ECW_t,
                                                 NW=W_t, M=N)
    CRW = rnd(int(span_f), 128)
    CRW_t = rnd(int(span_t), 128)

    # ---- phase 3b: SDDMM (d_value) pass geometry ----------------------
    # shrink sub-windows until the row span fits the fast gate as a
    # g-source slice.  When no feasible span exists (power-law tails:
    # rows with ~1 edge spread a 64k-edge window over millions of rows,
    # and per-window slice COPIES of a near-full g would dominate),
    # fall back to a GLOBAL g-gather (slow mode) via CRW_s = 0.
    fast_rows = max(128, (FAST_SRC_BYTES // max(1, feat_dim
                                                * stream_bytes)))
    ECW_s = ECW
    while True:
        wc_s = _window_counts(rp_f, ECW=ECW_s)
        W_s = max(1, int(wc_s.sum()))
        seg_of_s, wptr_s, rlo_s, span_s = _flat_geom(
            rp_f, wc_s, ECW=ECW_s, NW=W_s, M=M)
        if int(span_s) <= fast_rows or ECW_s <= 65536:
            break
        ECW_s = rnd(cdiv(ECW_s, 2), E)
    if int(span_s) <= 2 * fast_rows:
        CRW_s = rnd(int(span_s), 128)
    else:                                      # global-gather mode
        W_s, ECW_s, CRW_s = W, ECW, 0
        seg_of_s, wptr_s, rlo_s = seg_of_f, wptr_f, rlo_f

    # ---- phase 4: value relay -----------------------------------------
    relay_ft = _relays(order_f, perm_t)
    row_f = jnp.take(row, order_f)

    plan = Seg2Plan(M, N, S, SR, W, ECW, CRW, S_t, SR_t, W_t, ECW_t,
                    CRW_t, chunk=E,
                    interpret=_interpret_mode(),
                    stream=stream, W_s=W_s, ECW_s=ECW_s, CRW_s=CRW_s)
    structure = Seg2Structure(
        col_f=col_f, rp_f=rp_f, perm_f=order_f, sbase_f=sbase_f,
        rlo_f=rlo_f, col_t=col_t, rp_t=rp_t, sbase_t=sbase_t,
        rlo_t=rlo_t, relay_ft=relay_ft, row_f=row_f, rlo_s=rlo_s,
        seg_of_f=seg_of_f, wptr_f=wptr_f, seg_of_t=seg_of_t,
        wptr_t=wptr_t, seg_of_s=seg_of_s, wptr_s=wptr_s)
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


def _seg_pass(cols, rp, sbase, rlo, seg_of, wptr, vals, x, *,
              out_rows: int, S: int, SR: int, W: int, ECW: int,
              CRW: int, E: int, interpret: bool, pdt):
    """Shared segment-outer pass: fast-mode gather + in-place accumulated
    Pallas row reduction over W flattened edge-balanced sub-windows
    (window k belongs to segment seg_of[k] and covers edges
    [rp[s,0] + (k - wptr[s]) * ECW, +ECW))."""
    import jax.experimental.pallas as pl

    from .kernels.spmm_pallas import (_reduce_call, _row_bounds,
                                      _work_items_chunk_major)

    K = x.shape[1]
    R = 128
    T = CRW // R
    NCE = ECW // E
    # running buffer: enough tiles that any sub-window (tile_base + T +
    # dummy) stays in range
    buf_tiles = pl.cdiv(out_rows, R) + T + 1

    # cast ONCE before slicing: the fast-gather mode is gated on source
    # BYTES (~64 MB), so the slice must already be in the (narrow)
    # stream dtype
    x = x.astype(pdt)
    if x.shape[0] < SR:       # tiny operand: pad so the slice is legal
        x = jnp.concatenate(
            [x, jnp.zeros((SR - x.shape[0], K), x.dtype)])
    colp = jnp.concatenate([cols, jnp.zeros((ECW,), jnp.int32)])
    valp = (jnp.concatenate([vals, jnp.zeros((ECW,), vals.dtype)])
            if vals is not None else None)
    # row-pointer rows padded so any (rlo, CRW+1) slice is legal
    rp_pad = jnp.concatenate(
        [rp, jnp.repeat(rp[:, -1:], CRW + 1, axis=1)], axis=1)

    arange_tp = jnp.arange(T + 1, dtype=jnp.int32) * R

    def body(k, out):
        s = seg_of[k]
        e0 = rp[s, 0] + (k - wptr[s]) * ECW
        cnt_w = jnp.clip(rp[s, out_rows] - e0, 0, ECW)
        r0 = rlo[k]
        rp_l = jnp.clip(
            jax.lax.dynamic_slice(rp_pad[s], (r0,), (CRW + 1,)) - e0,
            0, cnt_w).astype(jnp.int32)
        bounds_start, bounds_end = _row_bounds(rp_l, T, R, ECW)
        tp = rp_l[arange_tp]
        items = _work_items_chunk_major(tp, NCE, T, E)

        cols_l = jax.lax.dynamic_slice(colp, (e0,), (ECW,))
        src = jax.lax.optimization_barrier(jax.lax.dynamic_slice(
            x, (jnp.take(sbase, s), jnp.int32(0)), (SR, K)))
        raw = jnp.take(src, cols_l, axis=0, mode="clip")
        prod = raw if valp is None else (
            raw * jax.lax.dynamic_slice(valp, (e0,), (ECW,)
                                        )[:, None].astype(pdt))
        return _reduce_call(bounds_start, bounds_end, prod, items,
                            T, R, E, K, split=True, interpret=interpret,
                            acc=out, tile_base=(r0 // R)[None])

    out0 = jnp.zeros((buf_tiles * R, K), jnp.float32)
    out = jax.lax.fori_loop(0, W, body, out0)
    return out[:out_rows]


def _sddmm_pass(col_f, row_f, rp, sbase, rlo_s, seg_of, wptr, g, x, *,
                M: int, S: int, SR: int, W_s: int, ECW_s: int,
                CRW_s: int, pdt, interpret: bool = False):
    """d_value in fwd-packed order: one pass over the FORWARD geometry.

    Per sub-window both gathers are fast-mode — x rows from the 64 MB
    x-segment slice (indices ``col_f``, slice-local), g rows from the
    window's contiguous row-range slice ``g[rlo .. rlo+CRW_s)`` (rows
    are sorted within a segment).  dv is written with a masked
    read-modify-write dynamic-update-slice at the window's own fwd
    offset: window tails past the segment end keep old values, which
    the next segment's windows then overwrite (window order is
    ascending, segments are contiguous in fwd order).

    ``CRW_s == 0`` selects global-gather mode: g rows come from the
    full (M, K) buffer (slow mode) — the power-law fallback where no
    bounded row span exists (tail rows with ~1 edge spread a window
    over millions of rows and per-window slice copies of a near-full g
    would dominate)."""
    nnz = col_f.shape[0]
    K = x.shape[1]
    x2 = x.astype(pdt)
    g2 = g.astype(pdt)
    if CRW_s > 0:
        gp = jnp.concatenate([g2, jnp.zeros((CRW_s, K), g2.dtype)])
    if x2.shape[0] < SR:
        x2 = jnp.concatenate(
            [x2, jnp.zeros((SR - x2.shape[0], K), x2.dtype)])
    cp = jnp.concatenate([col_f, jnp.zeros((ECW_s,), jnp.int32)])
    rpe = jnp.concatenate([row_f, jnp.zeros((ECW_s,), jnp.int32)])
    arange_w = jnp.arange(ECW_s, dtype=jnp.int32)

    def body(k, dv):
        s = seg_of[k]
        e0 = rp[s, 0] + (k - wptr[s]) * ECW_s
        cnt = jnp.clip(rp[s, M] - e0, 0, ECW_s)
        cols_l = jax.lax.dynamic_slice(cp, (e0,), (ECW_s,))
        rows_l = jax.lax.dynamic_slice(rpe, (e0,), (ECW_s,))
        src_x = jax.lax.optimization_barrier(jax.lax.dynamic_slice(
            x2, (jnp.take(sbase, s), jnp.int32(0)), (SR, K)))
        xg = jnp.take(src_x, cols_l, axis=0, mode="clip")
        if CRW_s > 0:
            r0 = rlo_s[k]
            src_g = jax.lax.optimization_barrier(jax.lax.dynamic_slice(
                gp, (r0, jnp.int32(0)), (CRW_s, K)))
            gg = jnp.take(src_g, rows_l - r0, axis=0, mode="clip")
        else:
            gg = jnp.take(g2, rows_l, axis=0, mode="clip")
        import os as _os
        if _os.environ.get("PSP_SDDMM_MULKERNEL", "0") == "1":
            # streaming multiply-reduce kernel (opt-in, measured LOSS):
            # XLA materializes both f32 upcast streams when two gather
            # outputs meet in an elementwise multiply (+97 ms / 15.3M
            # edges), but the kernel's per-window launch + per-step
            # small-block costs measured WORSE at full scale (fwd+bwd
            # 5627 vs 5047 ms) — kept as the record of the experiment
            from .kernels.spmm_pallas import mul_rowsum_call
            w_dv = mul_rowsum_call(jax.lax.optimization_barrier(xg),
                                   jax.lax.optimization_barrier(gg),
                                   interpret=interpret)
        else:
            w_dv = (xg.astype(jnp.float32)
                    * gg.astype(jnp.float32)).sum(axis=1)
        old = jax.lax.dynamic_slice(dv, (e0,), (ECW_s,))
        new = jnp.where(arange_w < cnt, w_dv, old)
        return jax.lax.dynamic_update_slice(dv, new, (e0,))

    dv = jax.lax.fori_loop(0, W_s, body,
                           jnp.zeros((nnz + ECW_s,), jnp.float32))
    return dv[:nnz]


def _fwd_impl(plan: Seg2Plan, s: Seg2Structure, packed_value, x):
    from .kernels.spmm_pallas import _product_dtype
    pdt = _product_dtype(packed_value, x, plan.stream)
    return _seg_pass(s.col_f, s.rp_f, s.sbase_f, s.rlo_f, s.seg_of_f,
                     s.wptr_f, packed_value,
                     x, out_rows=plan.num_rows, S=plan.S, SR=plan.SR,
                     W=plan.W, ECW=plan.ECW, CRW=plan.CRW,
                     E=plan.chunk, interpret=plan.interpret, pdt=pdt)


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
        # value relay: the one full-nnz permutation left (issue-bound)
        value_t = jnp.take(packed_value, s.relay_ft)
        d_x = _seg_pass(
            s.col_t, s.rp_t, s.sbase_t, s.rlo_t, s.seg_of_t, s.wptr_t,
            value_t, g,
            out_rows=plan.num_cols, S=plan.S_t, SR=plan.SR_t,
            W=plan.W_t, ECW=plan.ECW_t, CRW=plan.CRW_t, E=plan.chunk,
            interpret=plan.interpret, pdt=pdt)
        d_value = _sddmm_pass(
            s.col_f, s.row_f, s.rp_f, s.sbase_f, s.rlo_s, s.seg_of_s,
            s.wptr_s, g, x,
            M=plan.num_rows, S=plan.S, SR=plan.SR, W_s=plan.W_s,
            ECW_s=plan.ECW_s, CRW_s=plan.CRW_s, pdt=pdt,
            interpret=plan.interpret).astype(packed_value.dtype)
    else:
        d_value = None
        d_x = _seg_pass(s.col_t, s.rp_t, s.sbase_t, s.rlo_t,
                        s.seg_of_t, s.wptr_t, None, g,
                        out_rows=plan.num_cols, S=plan.S_t,
                        SR=plan.SR_t, W=plan.W_t, ECW=plan.ECW_t,
                        CRW=plan.CRW_t, E=plan.chunk,
                        interpret=plan.interpret, pdt=pdt)
    d_s = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), s)
    return d_s, d_value, d_x.astype(x.dtype)


spmm_seg2.defvjp(_spmm_seg2_fwd, _spmm_seg2_bwd)
