"""Probe XLA gather-emitter variants + jax.experimental.sparse BCOO SpMM.

The measured wall: jnp.take materializes ~67-80M gathered rows/s on v5e
regardless of row width, order, or source size.  This probe checks whether
any exposed knob shifts it, and benchmarks jax's own BCOO sparse matmul as
an external comparison point.  All loops chain EVERY operand through the
carry (XLA hoists loop-invariant gathers — round-3 finding).

Usage: python experiments/r3_gather_modes.py [scale]
"""
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0625
M = max(1024, int(2_449_029 * SCALE))
DEG = 50
K = 256
NNZ = M * DEG

kc, kv, kx = jax.random.split(jax.random.PRNGKey(0), 3)
col = jax.random.randint(kc, (NNZ,), 0, M, dtype=jnp.int32)
cols_sorted = jnp.sort(col)
row = (jnp.arange(NNZ, dtype=jnp.int32) // DEG)
value = jax.random.uniform(kv, (NNZ,), jnp.float32)
x = jax.random.normal(kx, (M, K), jnp.float32)
_ = float(x[0, 0])
T0 = time.perf_counter()


def log(m):
    print(f"[{time.perf_counter() - T0:7.1f}s] {m}", flush=True)


def timed(name, fn, args, nbytes, iters=5):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(a, n):
        def body(i, acc):
            return (jnp.sum(fn(*a, acc)) * 1e-12).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    try:
        t0 = time.perf_counter()
        float(loop(args, n=iters))
        cs = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(args, n=iters))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "case": name, "ms": round(dt * 1e3, 2),
            "rows_per_s_M": round(NNZ / dt / 1e6, 1),
            "gbps": round(nbytes / dt / 1e9, 1),
            "compile_s": round(cs, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": name,
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)


GB = NNZ * K * 4 * 2 + NNZ * 4  # read + materialize write


def g_take(c, xx, acc):
    return jnp.take(xx + acc * 0.0, c, axis=0)


def g_sorted_hint(c, xx, acc):
    from jax import lax
    xx = xx + acc * 0.0
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
    return lax.gather(xx, c[:, None], dnums, slice_sizes=(1, K),
                      indices_are_sorted=True, unique_indices=False,
                      mode=lax.GatherScatterMode.CLIP)


def g_take_k128(c, xx, acc):
    # does halving the row width halve the time (byte-bound) or not
    # (row-rate-bound)?
    return jnp.take(xx[:, :128] + acc * 0.0, c, axis=0)


cases = [
    ("take_random", g_take, (col, x), GB),
    ("gather_sorted_hint", g_sorted_hint, (cols_sorted, x), GB),
    ("take_k128", g_take_k128, (col, x), GB // 2),
]
for name, fn, args, nb in cases:
    timed(name, fn, args, nb)

# --- jax.experimental.sparse BCOO comparison ---
try:
    from jax.experimental import sparse as jsparse
    mat = jsparse.BCOO((value, jnp.stack([row, col], axis=1)),
                       shape=(M, M), indices_sorted=True,
                       unique_indices=False)

    def bcoo_spmm(data, idx, xx, acc):
        m = jsparse.BCOO((data + acc * 0.0, idx), shape=(M, M),
                         indices_sorted=True, unique_indices=False)
        return m @ (xx + acc * 0.0)

    SPMM_BYTES = NNZ * 12 + NNZ * K * 4 + M * K * 4
    timed("bcoo_matmul", bcoo_spmm, (mat.data, mat.indices, x), SPMM_BYTES)
except Exception as e:  # noqa: BLE001
    print(json.dumps({"case": "bcoo_matmul",
                      "error": str(e)[:200]}), flush=True)
