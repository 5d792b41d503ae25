"""Patient test: full SpMM as ONE jit — fori over row blocks, each block an
unrolled fused gather-sum, written into the carried (M, K) output via
dynamic_update_slice.  Earlier attempts timed out in compile; compile is a
one-time cost (persistent JAX_COMPILATION_CACHE_DIR), so this run waits.

Usage: python experiments/r3_dus.py [NB] [BF16]
"""
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

NB = int(sys.argv[1]) if len(sys.argv) > 1 else 4
BF16 = len(sys.argv) > 2 and sys.argv[2] == "bf16"
B = 131072
MSRC = int(os.environ.get("DUS_SRC", 2_449_029))
DEG = 50
K = 256
M = NB * B

kc, kv, kx = jax.random.split(jax.random.PRNGKey(0), 3)
col2 = jax.random.randint(kc, (M, DEG), 0, MSRC, dtype=jnp.int32)
v2 = jax.random.uniform(kv, (M, DEG), jnp.float32)
x = jax.random.normal(kx, (MSRC, K), jnp.float32)
if BF16:
    v2 = v2.astype(jnp.bfloat16)
    x = x.astype(jnp.bfloat16)
_ = float(x[0, 0].astype(jnp.float32))
T0 = time.perf_counter()


def log(m):
    print(f"[{time.perf_counter() - T0:7.1f}s] {m}", flush=True)


@functools.partial(jax.jit, static_argnames=("n",))
def loop(c2, v2_, xx, n):
    def body(i, acc):
        vv = v2_ + (acc * 0).astype(v2_.dtype)

        def blk(b, out):
            c = jax.lax.dynamic_slice(c2, (b * B, 0), (B, DEG))
            v = jax.lax.dynamic_slice(vv, (b * B, 0), (B, DEG))
            o = jnp.zeros((B, K), jnp.float32)
            for g in range(DEG):
                o = o + (jnp.take(xx, c[:, g], axis=0)
                         * v[:, g, None]).astype(jnp.float32)
            return jax.lax.dynamic_update_slice(out, o, (b * B, 0))
        out = jax.lax.fori_loop(0, NB, blk,
                                jnp.zeros((M, K), jnp.float32))
        return (jnp.sum(out) * 1e-12).astype(jnp.float32)
    return jax.lax.fori_loop(0, n, body, jnp.float32(0))


t0 = time.perf_counter()
float(loop(col2, v2, x, n=3))
log(f"compiled+warm NB={NB} bf16={BF16}")
t0 = time.perf_counter()
float(loop(col2, v2, x, n=3))
dt = (time.perf_counter() - t0) / 3
nnz = M * DEG
nbytes = nnz * 8 + nnz * K * 4 + M * K * 4
print(json.dumps({"NB": NB, "bf16": BF16, "ms": round(dt * 1e3, 2),
                  "ms_per_blk": round(dt * 1e3 / NB, 2),
                  "gbps": round(nbytes / dt / 1e9, 1),
                  "frac": round(nbytes / dt / 819e9, 4)}), flush=True)
