"""Round-5: micro-bisect the fwd-geometry SDDMM pass prototype.

r5_bwd_bisect measured the two-fast-gather SDDMM at 255 ms for 15.3M
edges (16.7 ns/edge) where two fast gathers should cost ~170 ms.  This
probes each component alone: x-gather only, g-slice-gather only, both
plus multiply, full (with masked RMW writes), and a variant that skips
the f32 upcast ordering.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from paddle_sparse_tpu.ops.spmm_seg2 import (  # noqa: E402
    make_seg2_plan, pack_values)

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 0.125
NODES = max(1024, int(2_449_029 * SCALE))
NNZ = max(16384, int(123_718_280 * SCALE))
DIM = 256
ITERS = 5
FAST_ROWS = (64 << 20) // (DIM * 2)


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
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(*args, n=n))
    per = (time.perf_counter() - t0) / n
    log(f"{tag:36s} {per * 1e3:9.2f} ms/iter  (compile {c:.1f}s)")
    return per


def main():
    import os
    os.environ["PSP_SPMM_STREAM"] = "bf16"
    deg = max(1, NNZ // NODES)
    nnz = deg * NODES
    row, col, value, x = gen(jax.random.PRNGKey(0), NODES, nnz, DIM)
    jax.block_until_ready(x)
    plan, s = make_seg2_plan(row, col, NODES, NODES, feat_dim=DIM,
                             stream="bf16")
    packed = pack_values(s, value)
    g = x + 1.0
    row_f = jnp.take(row, s.perm_f)
    E = plan.chunk
    # geometry now comes from the planner itself (round-5 flattened
    # windows landed in ops/spmm_seg2)
    W_s, ECW_s, CRW_s, rlo_s = plan.W_s, plan.ECW_s, plan.CRW_s, s.rlo_s
    jax.block_until_ready((row_f, rlo_s, packed))
    log(f"S={plan.S} W_s={W_s} ECW_s={ECW_s} CRW_s={CRW_s} nnz={nnz}")
    M = NODES
    SR = plan.SR

    def make_pass(mode):
        def run(colp, rowp, rp, sbase, rlo, gg, xx):
            x2 = xx.astype(jnp.bfloat16)
            g2 = gg.astype(jnp.bfloat16)
            gp = jnp.concatenate([g2, jnp.zeros((CRW_s, DIM), g2.dtype)])
            if x2.shape[0] < SR:
                x2 = jnp.concatenate(
                    [x2, jnp.zeros((SR - x2.shape[0], DIM), x2.dtype)])
            cp = jnp.concatenate([colp, jnp.zeros((ECW_s,), jnp.int32)])
            rpe = jnp.concatenate([rowp, jnp.zeros((ECW_s,), jnp.int32)])
            dv = jnp.zeros((nnz + ECW_s,), jnp.float32)
            arange_w = jnp.arange(ECW_s, dtype=jnp.int32)

            def body(k, dv):
                sseg = k // W_s
                w = k % W_s
                e0 = rp[sseg, 0] + w * ECW_s
                cnt = jnp.clip(rp[sseg, M] - e0, 0, ECW_s)
                cols_l = jax.lax.dynamic_slice(cp, (e0,), (ECW_s,))
                rows_l = jax.lax.dynamic_slice(rpe, (e0,), (ECW_s,))
                r0 = rlo[k]
                src_x = jax.lax.optimization_barrier(
                    jax.lax.dynamic_slice(
                        x2, (jnp.take(sbase, sseg), jnp.int32(0)),
                        (SR, DIM)))
                src_g = jax.lax.optimization_barrier(
                    jax.lax.dynamic_slice(gp, (r0, jnp.int32(0)),
                                          (CRW_s, DIM)))
                if mode == "xonly":
                    xg = jnp.take(src_x, cols_l, axis=0, mode="clip")
                    w_dv = xg.astype(jnp.float32).sum(axis=1)
                elif mode == "gonly":
                    gg_ = jnp.take(src_g, rows_l - r0, axis=0,
                                   mode="clip")
                    w_dv = gg_.astype(jnp.float32).sum(axis=1)
                elif mode == "both_nomul":
                    xg = jnp.take(src_x, cols_l, axis=0, mode="clip")
                    gg_ = jnp.take(src_g, rows_l - r0, axis=0,
                                   mode="clip")
                    w_dv = (xg.astype(jnp.float32).sum(axis=1)
                            + gg_.astype(jnp.float32).sum(axis=1))
                elif mode == "full_bf16mul":
                    xg = jnp.take(src_x, cols_l, axis=0, mode="clip")
                    gg_ = jnp.take(src_g, rows_l - r0, axis=0,
                                   mode="clip")
                    w_dv = (xg * gg_).astype(jnp.float32).sum(axis=1)
                elif mode == "fuse_g":
                    # materialize xg (bf16, 373 MB/window) behind a
                    # barrier; the multiply+reduce then fuses into the
                    # g-gather as its only gather consumer
                    xg = jax.lax.optimization_barrier(
                        jnp.take(src_x, cols_l, axis=0, mode="clip"))
                    gg_ = jnp.take(src_g, rows_l - r0, axis=0,
                                   mode="clip")
                    w_dv = (gg_.astype(jnp.float32)
                            * xg.astype(jnp.float32)).sum(axis=1)
                elif mode == "fuse_x":
                    gg_ = jax.lax.optimization_barrier(
                        jnp.take(src_g, rows_l - r0, axis=0,
                                 mode="clip"))
                    xg = jnp.take(src_x, cols_l, axis=0, mode="clip")
                    w_dv = (xg.astype(jnp.float32)
                            * gg_.astype(jnp.float32)).sum(axis=1)
                else:  # full
                    xg = jnp.take(src_x, cols_l, axis=0, mode="clip")
                    gg_ = jnp.take(src_g, rows_l - r0, axis=0,
                                   mode="clip")
                    w_dv = (xg.astype(jnp.float32)
                            * gg_.astype(jnp.float32)).sum(axis=1)
                old = jax.lax.dynamic_slice(dv, (e0,), (ECW_s,))
                new = jnp.where(arange_w < cnt, w_dv, old)
                return jax.lax.dynamic_update_slice(dv, new, (e0,))

            dv = jax.lax.fori_loop(0, plan.S * W_s, body, dv)
            return dv[:nnz]
        return run

    for mode in ("fuse_g", "fuse_x", "full"):
        p = make_pass(mode)

        def loop(s_, rf, rl, gg, xx, n, p=p):
            def body(i, acc):
                dv = p(s_.col_f, rf, s_.rp_f, s_.sbase_f, rl,
                       gg + acc * 0.0, xx + acc * 0.0)
                return (jnp.sum(dv) * 1e-12).astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        timed(f"sddmm[{mode}]", loop, s, row_f, rlo_s, g, x)


if __name__ == "__main__":
    main()
