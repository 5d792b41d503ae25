"""Round-5 (VERDICT r4 item 3): VMEM-resident two-level gather probe.

Can a one-hot MXU expansion from a VMEM-resident fine source slice beat
the XLA gather's ~4.6-5.6 ns/edge issue cost?  Model: edges sorted by
fine source segment (512 rows, 256 KB bf16 at K=256); each 2048-edge
chunk expands from ONE fine slice via sel(E, R) @ slice(R, K) on the
MXU — 512*256 MACs/edge ~= 1.33 ns/edge of MXU time at bf16 peak.

The probe's cols are drawn in [0, 512) per chunk — it models the
post-sort LOCAL (in-community) edge population of a clustered graph
(bench.py clustered graph: ~80% of edges in-community); uniform-random
graphs have no such population (measured r4: dedup can't help there).

Consumers are FULL sums — a sliced consumer lets XLA DCE through the
gather and fake the reference number (r3 lesson, re-verified here).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 512          # fine slice rows
E = 2048         # edges per chunk
K = 256
NCH = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
NROWS = 306_176  # x rows (1/8 scale, tile-aligned)
NSLICE = NROWS // R
ITERS = 5


def log(m):
    print(f"[{time.perf_counter() - T0:7.1f}s] {m}", flush=True)


T0 = time.perf_counter()


def timed(tag, fn, *args, n=ITERS):
    f = jax.jit(fn, static_argnames=("n",))
    t0 = time.perf_counter()
    float(f(*args, n=n))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(*args, n=n))
    per = (time.perf_counter() - t0) / n
    log(f"{tag:20s} {per * 1e3:9.2f} ms/iter = "
        f"{per / (NCH * E) * 1e9:6.2f} ns/edge  (compile {c:.1f}s)")
    return per


def make_call(variant: str):
    def kernel(fs_ref, cols_ref, xs_ref, out_ref):
        cols = cols_ref[:]                                   # (E, 1)
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (E, R), 1)
        sel = (r_iota == cols).astype(jnp.bfloat16)
        prod = jax.lax.dot_general(
            sel, xs_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if variant == "onehot_reduce":
            out_ref[:] = jnp.broadcast_to(
                prod.sum(axis=0, keepdims=True), (8, K)).astype(
                jnp.bfloat16)
        else:
            out_ref[:] = prod.astype(jnp.bfloat16)

    if variant == "onehot_reduce":
        out_shape = jax.ShapeDtypeStruct((NCH * 8, K), jnp.bfloat16)
        out_spec = pl.BlockSpec((8, K), lambda c, fs: (c, 0))
    else:
        out_shape = jax.ShapeDtypeStruct((NCH * E, K), jnp.bfloat16)
        out_spec = pl.BlockSpec((E, K), lambda c, fs: (c, 0))

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NCH,),
        in_specs=[
            pl.BlockSpec((E, 1), lambda c, fs: (c, 0)),
            pl.BlockSpec((R, K), lambda c, fs: (fs[c], 0)),
        ],
        out_specs=out_spec)
    return pl.pallas_call(
        kernel, grid_spec=gs, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)))


def main():
    key = jax.random.PRNGKey(0)
    kc, kx = jax.random.split(key)
    cols = jax.random.randint(kc, (NCH * E, 1), 0, R, dtype=jnp.int32)
    x = jax.random.normal(kx, (NROWS, K), jnp.float32).astype(
        jnp.bfloat16)
    fs = (jnp.arange(NCH, dtype=jnp.int32) * 37) % NSLICE
    jax.block_until_ready((cols, x, fs))
    log(f"data ready: {NCH} chunks x {E} edges, slice {R}x{K} bf16")

    for variant in ("onehot_write", "onehot_reduce"):
        try:
            call = make_call(variant)

            def loop(fs_, cols_, x_, n, call=call):
                def body(i, acc):
                    c2 = cols_ + (acc * 0.0).astype(jnp.int32)
                    out = call(fs_, c2, x_ + acc.astype(jnp.bfloat16)
                               * 0)
                    return (jnp.sum(out.astype(jnp.float32))
                            * 1e-9).astype(jnp.float32)
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))

            timed(variant, loop, fs, cols, x)
        except Exception as e:  # noqa: BLE001
            log(f"{variant}: FAILED {type(e).__name__}: {str(e)[:200]}")

    # reference 1: XLA gather of the same row count from a 64 MB source
    src = x[: (64 << 20) // (K * 2)]
    gcols = jax.random.randint(jax.random.PRNGKey(9), (NCH * E,), 0,
                               src.shape[0], dtype=jnp.int32)
    jax.block_until_ready((src, gcols))

    def xla_loop(s_, gc, n):
        def body(i, acc):
            g = jnp.take(s_ + acc.astype(jnp.bfloat16) * 0,
                         gc + (acc * 0.0).astype(jnp.int32), axis=0)
            return (jnp.sum(g.astype(jnp.float32)) * 1e-9).astype(
                jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("xla_gather", xla_loop, src, gcols)

    # reference 2: same gather + write bf16 stream (barrier forces the
    # materialization the real fwd pays before the Pallas reduce)
    def xla_loop_w(s_, gc, n):
        def body(i, acc):
            g = jax.lax.optimization_barrier(jnp.take(
                s_ + acc.astype(jnp.bfloat16) * 0,
                gc + (acc * 0.0).astype(jnp.int32), axis=0))
            return (jnp.sum(g.astype(jnp.float32)) * 1e-9).astype(
                jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("xla_gather+mat", xla_loop_w, src, gcols)

    # correctness of the one-hot expansion on the first chunk
    call = make_call("onehot_write")
    out = call(fs, cols, x)
    want = jnp.take(x[fs[0] * R:(fs[0] + 1) * R],
                    cols.reshape(-1)[:E], axis=0)
    err = float(jnp.max(jnp.abs(out[:E].astype(jnp.float32)
                                - want.astype(jnp.float32))))
    log(f"onehot expansion max abs err vs take: {err:.2e}")


if __name__ == "__main__":
    main()
