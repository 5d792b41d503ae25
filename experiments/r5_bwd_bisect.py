"""Round-5: stage-bisect the seg2 backward (VERDICT r4 item 1).

The r4 record: full-scale fwd 1356 ms but fwd+bwd 6471 ms (ratio 4.8).
The backward = transpose pass (should be ~ fwd) + relay_ft value
permutation + SDDMM with a slow-mode x-gather + dv_map gather over the
stacked window buffer.  This measures each stage alone at 1/8 scale
(15.3M nnz, K=256, bf16 stream) the way r4 bisected SpGEMM, then
prototypes the planned replacement: a SEPARATE SDDMM pass over the
forward geometry where BOTH gathers run fast-mode (x from the 64 MB
x-segment slice; g from the sub-window's contiguous row-range slice —
rows are sorted within a segment) and dv is written directly in
fwd-packed order (no dv stack, no dv_map relay).

Usage:  python experiments/r5_bwd_bisect.py [scale]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from paddle_sparse_tpu.ops.spmm_seg2 import (  # noqa: E402
    _seg_pass, make_seg2_plan, pack_values, spmm_seg2)

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 0.125
NODES = max(1024, int(2_449_029 * SCALE))
NNZ = max(16384, int(123_718_280 * SCALE))
DIM = 256
ITERS = 5
FAST_ROWS = (64 << 20) // (DIM * 2)   # bf16 fast-gather source row cap


def log(m):
    print(f"[{time.perf_counter() - T0:7.1f}s] {m}", flush=True)


T0 = time.perf_counter()


@functools.partial(jax.jit, static_argnames=("n", "e", "d"))
def gen(key, n, e, d):
    row = (jnp.arange(e, dtype=jnp.int32) // (e // n)).astype(jnp.int32)
    kc, kv, kx = jax.random.split(key, 3)
    col = jax.random.randint(kc, (e,), 0, n, dtype=jnp.int32)
    value = jax.random.uniform(kv, (e,), jnp.float32)
    x = jax.random.normal(kx, (n, d), jnp.float32)
    return row, col, value, x


def timed(tag, fn, *args, n=ITERS):
    f = jax.jit(fn, static_argnames=("n",))
    t0 = time.perf_counter()
    float(f(*args, n=n))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(*args, n=n))
    per = (time.perf_counter() - t0) / n
    log(f"{tag:28s} {per * 1e3:9.2f} ms/iter   (compile {compile_s:.1f}s)")
    return per


def main():
    import os
    os.environ["PSP_SPMM_STREAM"] = "bf16"
    deg = max(1, NNZ // NODES)
    nnz = deg * NODES
    row, col, value, x = gen(jax.random.PRNGKey(0), NODES, nnz, DIM)
    jax.block_until_ready(x)
    log(f"data ready: nodes={NODES} nnz={nnz} K={DIM}")

    plan, s = make_seg2_plan(row, col, NODES, NODES, feat_dim=DIM,
                             stream="bf16")
    packed = pack_values(s, value)
    g = x + 1.0   # stand-in cotangent
    jax.block_until_ready((s, packed, g))
    log(f"plan: S={plan.S} W={plan.W} ECW={plan.ECW} CRW={plan.CRW} "
        f"S_t={plan.S_t} W_t={plan.W_t} ECW_t={plan.ECW_t} "
        f"CRW_t={plan.CRW_t}")

    # ---- reference points ------------------------------------------------
    def fwd_loop(s_, v, xx, n):
        def body(i, acc):
            out = spmm_seg2(plan, s_, v + acc * 0.0, xx + acc * 0.0)
            return (jnp.sum(out) * 1e-12).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    fwd = timed("fwd", fwd_loop, s, packed, x)

    def fwdbwd_loop(s_, v, xx, n):
        def loss(vv, xy):
            return spmm_seg2(plan, s_, vv, xy).sum()

        def body(i, acc):
            l, (dv, dx) = jax.value_and_grad(loss, (0, 1))(
                v + acc * 0.0, xx + acc * 0.0)
            return ((jnp.sum(dv) + jnp.sum(dx) + l) * 1e-12).astype(
                jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    fb = timed("fwd+bwd (current)", fwdbwd_loop, s, packed, x)
    log(f"  -> bwd alone {1e3 * (fb - fwd):.2f} ms, ratio "
        f"{fb / fwd:.2f}")

    # ---- stage: relay_ft value permutation ------------------------------
    def relay_loop(s_, v, n):
        def body(i, acc):
            vt = jnp.take(v + acc * 0.0, s_.relay_ft)
            return (jnp.sum(vt) * 1e-12).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("relay_ft take", relay_loop, s, packed)

    # (historical: the r4 dv_map stage measured 119.6 ms here before the
    # redesign removed the field — the r5 structure no longer carries it)

    # ---- stage: transpose pass alone (value_t precomputed) --------------
    value_t = jnp.take(packed, s.relay_ft)
    jax.block_until_ready(value_t)

    def tpass_loop(s_, vt, gg, n):
        def body(i, acc):
            dx = _seg_pass(s_.col_t, s_.rp_t, s_.sbase_t, s_.rlo_t,
                              s_.seg_of_t, s_.wptr_t,
                              vt + acc * 0.0, gg + acc * 0.0,
                              out_rows=plan.num_cols, S=plan.S_t,
                              SR=plan.SR_t, W=plan.W_t, ECW=plan.ECW_t,
                              CRW=plan.CRW_t, E=plan.chunk,
                              interpret=plan.interpret, pdt=jnp.bfloat16)
            return (jnp.sum(dx) * 1e-12).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("t-pass alone (d_x)", tpass_loop, s, value_t, g)

    # ---- prototype: fwd-geometry SDDMM pass, both gathers fast ----------
    # second-level windows: shrink until the row span fits the 64 MB
    # fast-gate as a g source slice
    row_f = jnp.take(row, s.perm_f)
    E = plan.chunk
    # geometry now comes from the planner itself (round-5 flattened
    # windows landed in ops/spmm_seg2)
    W_s, ECW_s, CRW_s, rlo_s = plan.W_s, plan.ECW_s, plan.CRW_s, s.rlo_s
    log(f"sddmm pass: W_s={W_s} ECW_s={ECW_s} CRW_s={CRW_s} "
        f"(fast row cap {FAST_ROWS})")
    jax.block_until_ready((row_f, rlo_s))

    M = NODES

    def sddmm_pass(colp, rowp, rp, sbase, rlo, gg, xx):
        x2 = xx.astype(jnp.bfloat16)
        g2 = gg.astype(jnp.bfloat16)
        gp = jnp.concatenate([g2, jnp.zeros((CRW_s, DIM), g2.dtype)])
        if x2.shape[0] < plan.SR:
            x2 = jnp.concatenate(
                [x2, jnp.zeros((plan.SR - x2.shape[0], DIM), x2.dtype)])
        cp = jnp.concatenate([colp, jnp.zeros((ECW_s,), jnp.int32)])
        rp_e = jnp.concatenate([rowp, jnp.zeros((ECW_s,), jnp.int32)])
        dv = jnp.zeros((nnz + ECW_s,), jnp.float32)
        arange_w = jnp.arange(ECW_s, dtype=jnp.int32)

        def body(k, dv):
            sseg = s.seg_of_s[k]
            e0 = rp[sseg, 0] + (k - s.wptr_s[sseg]) * ECW_s
            cnt = jnp.clip(rp[sseg, M] - e0, 0, ECW_s)
            cols_l = jax.lax.dynamic_slice(cp, (e0,), (ECW_s,))
            rows_l = jax.lax.dynamic_slice(rp_e, (e0,), (ECW_s,))
            r0 = rlo[k]
            src_x = jax.lax.optimization_barrier(jax.lax.dynamic_slice(
                x2, (jnp.take(sbase, sseg), jnp.int32(0)),
                (plan.SR, DIM)))
            src_g = jax.lax.optimization_barrier(jax.lax.dynamic_slice(
                gp, (r0, jnp.int32(0)), (CRW_s, DIM)))
            xg = jnp.take(src_x, cols_l, axis=0, mode="clip")
            gg_ = jnp.take(src_g, rows_l - r0, axis=0, mode="clip")
            w_dv = (xg.astype(jnp.float32) * gg_.astype(jnp.float32)
                    ).sum(axis=1)
            old = jax.lax.dynamic_slice(dv, (e0,), (ECW_s,))
            new = jnp.where(arange_w < cnt, w_dv, old)
            return jax.lax.dynamic_update_slice(dv, new, (e0,))

        dv = jax.lax.fori_loop(0, W_s, body, dv)
        return dv[:nnz]

    def sddmm_loop(s_, rf, rl, gg, xx, n):
        def body(i, acc):
            dv = sddmm_pass(s_.col_f, rf, s_.rp_f, s_.sbase_f, rl,
                            gg + acc * 0.0, xx + acc * 0.0)
            return (jnp.sum(dv) * 1e-12).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("NEW sddmm pass (fast/fast)", sddmm_loop, s, row_f, rlo_s, g, x)

    # correctness vs direct: dv[e] = g[row_e] . x[col_e] in fwd order
    # (prefix only — the full direct gather would materialize 2x
    # (nnz, K) f32 = 31 GB)
    CHK = min(nnz, 1_000_000)

    @jax.jit
    def direct_prefix(rf, cf, gg, xx):
        g2 = gg.astype(jnp.bfloat16).astype(jnp.float32)
        x2 = xx.astype(jnp.bfloat16).astype(jnp.float32)
        return (jnp.take(g2, rf[:CHK], axis=0)
                * jnp.take(x2, cf[:CHK], axis=0)).sum(axis=1)

    dv_new = sddmm_pass(s.col_f, row_f, s.rp_f, s.sbase_f, rlo_s, g, x)
    want = direct_prefix(row_f, jnp.take(col, s.perm_f), g, x)
    err = float(jnp.max(jnp.abs(dv_new[:CHK] - want))
                / jnp.maximum(1e-9, jnp.max(jnp.abs(want))))
    log(f"sddmm prototype max rel err vs direct (f32-of-bf16): {err:.2e}")

    # ---- stage: slow-mode big-source gather (the r4 sddmm inner
    # gather shape; indices = fwd-order rows against the full x) -------
    def slowgather_loop(s_, xx, n):
        def body(i, acc):
            xr = jnp.take(xx + acc * 0.0, s_.row_f, axis=0,
                          mode="clip").astype(jnp.bfloat16)
            return (jnp.sum(xr.astype(jnp.float32)) * 1e-12).astype(
                jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("slow big-src gather", slowgather_loop, s, x)


if __name__ == "__main__":
    main()
