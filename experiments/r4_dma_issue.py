"""Measure in-kernel async-DMA issue cost on v5e: per grid step, issue
NS dynamic-offset copies (HBM stream -> VMEM staging) and one dot over
the staged rows.  This bounds the per-step cost of a tile-span staging
SpMM kernel (one step per 128-row tile, S spans staged per step).

Usage: python experiments/r4_dma_issue.py [NS] [CAP]
"""
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NS = int(sys.argv[1]) if len(sys.argv) > 1 else 19
CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 384
K = 256
R = 128
STEPS = 2048
ITERS = 10


def main():
    kc, kv = jax.random.split(jax.random.PRNGKey(0))
    stream = jax.random.normal(kv, (8 << 20 >> 9 << 9, K), jnp.bfloat16)
    nstream = stream.shape[0]
    # per (step, span) staged-slice starts, 16-aligned
    # 1-D prefetch: 2-D SMEM operands pad to 128 lanes and blow the
    # 1 MB SMEM budget
    e0 = (jax.random.randint(kc, (STEPS * NS,), 0, nstream - CAP,
                             dtype=jnp.int32) // 16) * 16
    _ = float(stream[0, 0].astype(jnp.float32))

    # stream stays in HBM (ANY); staging + sems scratch
    def run(stream, e0, seed):
        def kern(e0_ref, seed_ref, stream_ref, out_ref, staging, sems):
            t = pl.program_id(0)
            for s in range(NS):
                pltpu.make_async_copy(
                    stream_ref.at[pl.ds(pl.multiple_of(e0_ref[t * NS + s], 16), CAP), :],
                    staging.at[pl.ds(s * CAP, CAP), :],
                    sems.at[s]).start()
            for s in range(NS):
                pltpu.make_async_copy(
                    stream_ref.at[pl.ds(pl.multiple_of(e0_ref[t * NS + s], 16), CAP), :],
                    staging.at[pl.ds(s * CAP, CAP), :],
                    sems.at[s]).wait()
            sel = jnp.broadcast_to(
                seed_ref[0, :].astype(jnp.bfloat16)[None, :],
                (NS * CAP, R))
            out_ref[:] = jax.lax.dot_general(
                sel, staging[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec((1, R), lambda t, e: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((R, K), lambda t, e: (t % 8, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((NS * CAP, K), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((NS,)),
            ])
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((8 * R, K), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20),
        )(e0, seed, stream)

    seed = jnp.ones((1, R), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(stream, e0, seed, n):
        def body(i, acc):
            st = stream + (acc * 0).astype(stream.dtype)
            out = run(st, e0, seed)
            return (jnp.sum(out) * 1e-12).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    try:
        t0 = time.perf_counter()
        float(loop(stream, e0, seed, n=ITERS))
        cs = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(stream, e0, seed, n=ITERS))
        dt = (time.perf_counter() - t0) / ITERS
        per_step = dt / STEPS
        edges = NS * CAP
        print(json.dumps({
            "case": f"NS={NS} CAP={CAP}",
            "us_per_step": round(per_step * 1e6, 2),
            "us_per_dma": round(per_step * 1e6 / NS, 3),
            "edges_per_s_M": round(edges / per_step / 1e6, 1),
            "bytes_per_step_KB": edges * K * 2 // 1024,
            "compile_s": round(cs, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"error": f"{type(e).__name__}: {e}"[:20000]}),
              flush=True)


if __name__ == "__main__":
    main()
