"""Round-5: can the value relay (fwd->t permutation of a (nnz,) f32
vector) beat the measured 121 ms/15.3M-edge gather?

Variants: permutation gather (baseline), scatter-set by the inverse
permutation, gather from a 2-wide pair-packed source, half-split
gathers, and the dv relay analog.
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
ITERS = 10


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
    log(f"{tag:40s} {per * 1e3:9.2f} ms/iter  (compile {c:.1f}s)")
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
    relay_ft = s.relay_ft
    ar = jnp.arange(nnz, dtype=jnp.int32)
    relay_tf = jnp.zeros((nnz,), jnp.int32).at[relay_ft].set(ar)
    jax.block_until_ready((packed, relay_tf))
    log(f"nnz={nnz}")

    def g_loop(v, idx, n):
        def body(i, acc):
            vt = jnp.take(v + acc * 0.0, idx)
            return (jnp.sum(vt) * 1e-12).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("gather take(v, relay_ft)", g_loop, packed, relay_ft)

    def s_loop(v, idx, n):
        def body(i, acc):
            vt = jnp.zeros((nnz,), jnp.float32).at[idx].set(
                v + acc * 0.0, mode="drop", unique_indices=True)
            return (jnp.sum(vt) * 1e-12).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("scatter zeros.at[relay_tf].set(v)", s_loop, packed, relay_tf)

    # sanity: scatter-set == gather
    a = jnp.take(packed, relay_ft)
    b = jnp.zeros((nnz,), jnp.float32).at[relay_tf].set(packed)
    log(f"scatter == gather: {bool(jnp.all(a == b))}")

    # 2-wide pair-packed source (value bitcast pairs with itself/an int)
    packed2 = jnp.stack([packed, packed], axis=1)
    jax.block_until_ready(packed2)

    def g2_loop(v2, idx, n):
        def body(i, acc):
            vt = jnp.take(v2 + acc * 0.0, idx, axis=0)[:, 0]
            return (jnp.sum(vt) * 1e-12).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("gather 2-wide rows", g2_loop, packed2, relay_ft)

    # gather as (nnz/8, 8) blocks when indices happen to be block ids —
    # NOT the real relay; measures the 8-wide issue rate ceiling
    blk = packed.reshape(-1, 8)
    idx8 = (relay_ft[: nnz // 8] // 8).astype(jnp.int32)
    jax.block_until_ready((blk, idx8))

    def g8_loop(vb, idx, n):
        def body(i, acc):
            vt = jnp.take(vb + acc * 0.0, idx, axis=0)
            return (jnp.sum(vt) * 1e-12).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("gather 8-wide rows (1/8 issues)", g8_loop, blk, idx8)

    # bf16 value stream relay (half the bytes; rate is issue-bound?)
    pb = packed.astype(jnp.bfloat16)
    jax.block_until_ready(pb)

    def gb_loop(v, idx, n):
        def body(i, acc):
            vt = jnp.take(v + acc * 0.0, idx)
            return (jnp.sum(vt.astype(jnp.float32)) * 1e-12).astype(
                jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("gather bf16 stream", gb_loop, pb, relay_ft)


if __name__ == "__main__":
    main()
