"""Tile-span staged SpMM (``seg3``) — round-4 full-scale specialist.

Same gather layout as the ``seg2`` flagship (edges (x-segment,
row)-sorted; every gather reads a <= 64 MB slice at the measured ~217M
rows/s fast rate), but a different reduction: output rows are processed
band by band, and within a band ONE grid step per 128-row tile stages
that tile's edge spans from ALL S segments into VMEM with
double-buffered async DMAs and folds them with a single MXU dot
(``kernels/spmm_pallas.py::tilespan_call``).  Each output tile is
written exactly once; the (chunk, tile) work-item machinery — whose
~1.3 us/step fixed cost dominated the seg2 reduction at full scale
(S x rows/128 steps) — shrinks to rows/128 steps total.

Capacity model: ``CAP_TS`` bounds any (tile, segment) span.  On
uniform-degree graphs that is ~128 x deg / S (+16 alignment); on
heavily skewed graphs a hot tile inflates it and the planner REFUSES
(``Seg3Infeasible``) — callers fall back to ``seg2``, whose sub-window
capacity is degree-agnostic.  The bench wires exactly that policy.

The reference has no SpMM (unsupported list, /root/reference/README.md:45);
functional contract: /root/reference/README.md:267-300 (value-only
autograd, README.md:96).
"""
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .spmm_seg2 import (_interpret_mode,  # noqa: F401
                        _build_fwd, _build_t, _lg2, _pick_sr,
                        FAST_SRC_BYTES)  # noqa: F401  (shared phases)


class Seg3Plan(NamedTuple):
    """Static (hashable) geometry for :func:`spmm_seg3`."""
    num_rows: int
    num_cols: int
    S: int
    SR: int
    BAND: int          # output rows per band (multiple of 128)
    cap: int           # per-(band, segment) window capacity (mult 16)
    CAP_TS: int        # per-(tile, segment) staged capacity (mult 16)
    S_t: int
    SR_t: int
    BAND_t: int
    cap_t: int
    CAP_TS_t: int
    interpret: bool = False
    stream: str = "f32"


class Seg3Tables(NamedTuple):
    """Plan-precomputed per-band kernel tables (one orientation)."""
    e0a: jax.Array     # (bands, T_B*S) 16-aligned staged starts
    bst: jax.Array     # (bands, T_B, S, 128) staging-relative starts
    ben: jax.Array     # (bands, T_B, S, 128) staging-relative ends


class Seg3Structure(NamedTuple):
    col_f: jax.Array
    rp_f: jax.Array        # (S, bands*BAND+1) edge-padded row pointers
    perm_f: jax.Array
    sbase_f: jax.Array
    tab_f: Seg3Tables
    col_t: jax.Array
    rp_t: jax.Array
    sbase_t: jax.Array
    tab_t: Seg3Tables
    xrow_t: jax.Array
    relay_ft: jax.Array
    dv_map: jax.Array      # fwd pos -> (band, span) window slot


class Seg3Infeasible(ValueError):
    """Row skew inflates CAP_TS beyond the VMEM staging budget — use the
    degree-agnostic seg2 flagship instead."""


def _pad_rp(rp, M: int, rows_pad: int):
    if rows_pad == M:
        return rp
    return jnp.concatenate(
        [rp, jnp.repeat(rp[:, -1:], rows_pad - M, axis=1)], axis=1)


@functools.partial(jax.jit, static_argnames=("S", "BAND", "bands"))
def _windows_and_spans(rp, *, S: int, BAND: int, bands: int):
    """(max (band,seg) window edges, max staged span incl. alignment)."""
    idx = jnp.arange(bands + 1, dtype=jnp.int32) * BAND
    sl = jnp.take(rp, idx, axis=1)
    win = (sl[:, 1:] - sl[:, :-1]).max()

    def one_band(b):
        blk = jax.lax.dynamic_slice(
            rp, (jnp.int32(0), (b * BAND).astype(jnp.int32)),
            (S, BAND + 1))
        local = blk - blk[:, :1]                    # (S, BAND+1)
        ts = local[:, :BAND:128]                    # (S, T_B) tile starts
        te = local[:, 128::128]
        te = jnp.concatenate([te, local[:, -1:]], axis=1)[:, :ts.shape[1]]
        return (te - (ts // 16) * 16).max()

    span = jax.lax.map(one_band,
                       jnp.arange(bands, dtype=jnp.int32)).max()
    return win, span


@functools.partial(jax.jit, static_argnames=("S", "BAND", "bands", "cap",
                                             "CAP_TS"))
def _tables(rp, *, S: int, BAND: int, bands: int, cap: int,
            CAP_TS: int) -> Seg3Tables:
    R = 128
    T_B = BAND // R
    s_ids = jnp.arange(S, dtype=jnp.int32)

    def one_band(b):
        blk = jax.lax.dynamic_slice(
            rp, (jnp.int32(0), (b * BAND).astype(jnp.int32)),
            (S, BAND + 1))
        local = blk - blk[:, :1]                    # (S, BAND+1)
        stream = local + (s_ids * cap)[:, None]     # band-stream position
        ts = stream[:, :BAND:128]                   # (S, T_B)
        e0a = (ts // 16) * 16
        st3 = stream[:, :BAND].reshape(S, T_B, R)
        en3 = stream[:, 1:BAND + 1].reshape(S, T_B, R)
        off = (e0a - (s_ids * CAP_TS)[:, None])[:, :, None]
        bst = jnp.transpose(st3 - off, (1, 0, 2)).astype(jnp.int32)
        ben = jnp.transpose(en3 - off, (1, 0, 2)).astype(jnp.int32)
        return (jnp.transpose(e0a, (1, 0)).reshape(-1).astype(jnp.int32),
                bst, ben)

    e0a, bst, ben = jax.lax.map(one_band,
                                jnp.arange(bands, dtype=jnp.int32))
    return Seg3Tables(e0a=e0a, bst=bst, ben=ben)


def make_seg3_plan(row, col, num_rows: int, num_cols: int, *,
                   feat_dim: int, stream: Optional[str] = None,
                   band_rows: int = 28672, sr: Optional[int] = None,
                   staging_budget: int = 24 << 20):
    """Plan builder (eager; concrete indices).  Raises
    :class:`Seg3Infeasible` when the staged-span capacity would exceed
    ``staging_budget`` bytes of VMEM (power-law hot tiles)."""
    from .kernels.spmm_pallas import _stream_env

    stream = stream or _stream_env()
    stream_bytes = 2 if stream == "bf16" else 4

    row = jnp.asarray(row, jnp.int32)
    col = jnp.asarray(col, jnp.int32)
    M, N = num_rows, num_cols

    def cdiv(a, b):
        return -(-a // b)

    def rnd16(v):
        return max(16, cdiv(int(v), 16) * 16)

    SR = sr or _pick_sr(N, feat_dim, stream_bytes)
    # non-pow2 SR silently corrupts: seg = col >> lg2(SR) then uses a
    # narrower effective segment than S = ceil(N/SR) and edges vanish
    # into dropped scatter slots (ADVICE r4)
    assert SR & (SR - 1) == 0, "segment size must be a power of two"
    S = max(1, cdiv(N, SR))
    SR_t = sr or _pick_sr(M, feat_dim, stream_bytes)
    assert SR_t & (SR_t - 1) == 0, "segment size must be a power of two"
    S_t = max(1, cdiv(M, SR_t))
    BAND = max(128, (band_rows // 128) * 128)
    bands = max(1, cdiv(M, BAND))
    bands_t = max(1, cdiv(N, BAND))

    order_f, col_f, rp_f, sbase_f, _, ok = _build_fwd(
        row, col, S=S, SR=SR, M=M, N=N)
    if not bool(ok):
        raise ValueError("make_seg3_plan requires row sorted ascending")
    perm_t, col_t, rp_t, sbase_t, xrow_t, _ = _build_t(
        row, col, S_t=S_t, SR_t=SR_t, M=M, N=N)
    rp_f = _pad_rp(rp_f, M, bands * BAND)
    rp_t = _pad_rp(rp_t, N, bands_t * BAND)

    win_f, span_f = _windows_and_spans(rp_f, S=S, BAND=BAND, bands=bands)
    win_t, span_t = _windows_and_spans(rp_t, S=S_t, BAND=BAND,
                                       bands=bands_t)
    cap, CAP_TS = rnd16(int(win_f)), rnd16(int(span_f))
    cap_t, CAP_TS_t = rnd16(int(win_t)), rnd16(int(span_t))
    need = 2 * max(S * CAP_TS, S_t * CAP_TS_t) * feat_dim * stream_bytes
    if need > staging_budget:
        raise Seg3Infeasible(
            f"staged spans need {need >> 20} MB VMEM (> "
            f"{staging_budget >> 20} MB) — skewed rows; use seg2")

    tab_f = _tables(rp_f, S=S, BAND=BAND, bands=bands, cap=cap,
                    CAP_TS=CAP_TS)
    tab_t = _tables(rp_t, S=S_t, BAND=BAND, bands=bands_t, cap=cap_t,
                    CAP_TS=CAP_TS_t)

    @functools.partial(jax.jit, static_argnames=("S_t", "BAND_t",
                                                 "cap_t"))
    def relays(order_f, perm_t, wptr_t, rp_t, xrow_t, *, S_t, BAND_t,
               cap_t):
        nnz_ = order_f.shape[0]
        ar = jnp.arange(nnz_, dtype=jnp.int32)
        inv_f = jnp.zeros((nnz_,), jnp.int32).at[order_f].set(ar)
        inv_t = jnp.zeros((nnz_,), jnp.int32).at[perm_t].set(ar)
        relay_ft = jnp.take(inv_f, perm_t)
        relay_tf = jnp.take(inv_t, order_f)
        s_of_t = (jnp.searchsorted(wptr_t, ar, side="right") - 1
                  ).astype(jnp.int32)
        b_of_t = (xrow_t // BAND_t).astype(jnp.int32)
        ncols = rp_t.shape[1]
        w0 = jnp.take(rp_t.reshape(-1),
                      s_of_t * ncols + b_of_t * BAND_t)
        slot = (b_of_t * S_t + s_of_t) * cap_t + (ar - w0)
        return relay_ft, jnp.take(slot, relay_tf)

    wptr_t = jnp.concatenate([rp_t[:, 0], rp_t[-1:, -1]])
    relay_ft, dv_map = relays(order_f, perm_t, wptr_t, rp_t, xrow_t,
                              S_t=S_t, BAND_t=BAND, cap_t=cap_t)

    plan = Seg3Plan(M, N, S, SR, BAND, cap, CAP_TS, S_t, SR_t, BAND,
                    cap_t, CAP_TS_t,
                    interpret=_interpret_mode(),
                    stream=stream)
    structure = Seg3Structure(
        col_f=col_f, rp_f=rp_f, perm_f=order_f, sbase_f=sbase_f,
        tab_f=tab_f, col_t=col_t, rp_t=rp_t, sbase_t=sbase_t,
        tab_t=tab_t, xrow_t=xrow_t, relay_ft=relay_ft, dv_map=dv_map)
    return plan, structure


@jax.jit
def pack_values(s: Seg3Structure, value: jax.Array) -> jax.Array:
    """COO-ordered values -> the fwd packed layout (once per operand)."""
    return jnp.take(value, s.perm_f)


@jax.jit
def unpack_values(s: Seg3Structure, packed: jax.Array) -> jax.Array:
    nnz = packed.shape[0]
    return jnp.zeros((nnz,), packed.dtype).at[s.perm_f].set(packed)


def _band_pass(cols, rp, sbase, tab: Seg3Tables, vals, x, *,
               out_rows: int, S: int, SR: int, BAND: int, cap: int,
               CAP_TS: int, interpret: bool, pdt, extra_per_span=None):
    from .kernels.spmm_pallas import tilespan_call

    K = x.shape[1]
    R = 128
    T_B = BAND // R
    bands = -(-out_rows // BAND)

    x = x.astype(pdt)
    if x.shape[0] < SR:
        x = jnp.concatenate(
            [x, jnp.zeros((SR - x.shape[0], K), x.dtype)])
    colp = jnp.concatenate([cols, jnp.zeros((cap,), jnp.int32)])
    valp = (jnp.concatenate([vals, jnp.zeros((cap,), vals.dtype)])
            if vals is not None else None)
    pad_tail = jnp.zeros((CAP_TS, K), pdt)   # staged-copy overrun room

    def band_fn(args):
        b, e0a, bst, ben = args
        sl = jax.lax.dynamic_slice(
            rp, (jnp.int32(0), (b * BAND).astype(jnp.int32)),
            (S, BAND + 1))
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
        stream = jnp.concatenate(parts + [pad_tail], axis=0)

        out_b = tilespan_call(e0a, bst, ben, stream, S=S, T_B=T_B,
                              CAP_TS=CAP_TS, K=K, R=R, split=True,
                              interpret=interpret)
        extra_b = (jnp.concatenate(extras)
                   if extra_per_span is not None else jnp.zeros((0,)))
        return out_b, extra_b

    out, extra = jax.lax.map(
        band_fn, (jnp.arange(bands, dtype=jnp.int32), tab.e0a, tab.bst,
                  tab.ben))
    return out.reshape(bands * BAND, K)[:out_rows], extra


def _fwd_impl(plan: Seg3Plan, s: Seg3Structure, packed_value, x):
    from .kernels.spmm_pallas import _product_dtype
    pdt = _product_dtype(packed_value, x, plan.stream)
    out, _ = _band_pass(s.col_f, s.rp_f, s.sbase_f, s.tab_f,
                        packed_value, x, out_rows=plan.num_rows,
                        S=plan.S, SR=plan.SR, BAND=plan.BAND,
                        cap=plan.cap, CAP_TS=plan.CAP_TS,
                        interpret=plan.interpret, pdt=pdt)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def spmm_seg3(plan: Seg3Plan, s: Seg3Structure,
              packed_value: Optional[jax.Array],
              x: jax.Array) -> jax.Array:
    """``A @ x`` (sum), differentiable in ``(packed_value, x)``."""
    return _fwd_impl(plan, s, packed_value, x).astype(x.dtype)


def _spmm_seg3_fwd(plan, s, packed_value, x):
    return spmm_seg3(plan, s, packed_value, x), (s, packed_value, x)


def _spmm_seg3_bwd(plan, res, g):
    from .kernels.spmm_pallas import _product_dtype
    s, packed_value, x = res
    pdt = _product_dtype(packed_value, g, plan.stream)
    if packed_value is not None:
        value_t = jnp.take(packed_value, s.relay_ft)
        xrow_p = jnp.concatenate(
            [s.xrow_t, jnp.zeros((plan.cap_t,), jnp.int32)])

        def sddmm(s_i, g_raw, e0):
            xr = jnp.take(x, jax.lax.dynamic_slice(
                xrow_p, (e0,), (plan.cap_t,)), axis=0,
                mode="clip").astype(pdt)
            return (g_raw.astype(jnp.float32)
                    * xr.astype(jnp.float32)).sum(axis=1)

        d_x, dv_stack = _band_pass(
            s.col_t, s.rp_t, s.sbase_t, s.tab_t, value_t, g,
            out_rows=plan.num_cols, S=plan.S_t, SR=plan.SR_t,
            BAND=plan.BAND_t, cap=plan.cap_t, CAP_TS=plan.CAP_TS_t,
            interpret=plan.interpret, pdt=pdt, extra_per_span=sddmm)
        d_value = jnp.take(dv_stack.reshape(-1), s.dv_map,
                           mode="clip").astype(packed_value.dtype)
    else:
        d_value = None
        d_x, _ = _band_pass(s.col_t, s.rp_t, s.sbase_t, s.tab_t, None,
                            g, out_rows=plan.num_cols, S=plan.S_t,
                            SR=plan.SR_t, BAND=plan.BAND_t,
                            cap=plan.cap_t, CAP_TS=plan.CAP_TS_t,
                            interpret=plan.interpret, pdt=pdt)
    d_s = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0), s)
    return d_s, d_value, d_x.astype(x.dtype)


spmm_seg3.defvjp(_spmm_seg3_fwd, _spmm_seg3_bwd)
