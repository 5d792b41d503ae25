"""Round-4 follow-up: fast-mode (small-source) gather rate vs row WIDTH.

If the ~190M rows/s fast mode is issue-bound the rate is constant across
K; if byte-bound it scales ~1/bytes.  Also probes the lane-major (axis=1)
gather from a (K, N) source and a value-scaled fused gather (does the
multiply ride along free?).

Usage: python experiments/r4_gather_width.py
"""
import functools
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

NNZ = 4_000_000
ITERS = 4
T0 = time.perf_counter()


def timed(name, loop_fn, args, extra=None):
    try:
        t0 = time.perf_counter()
        float(loop_fn(*args, n=ITERS))
        cs = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop_fn(*args, n=ITERS))
        dt = (time.perf_counter() - t0) / ITERS
        rec = {"case": name, "ms": round(dt * 1e3, 2),
               "rows_per_s_M": round(NNZ / dt / 1e6, 1),
               "compile_s": round(cs, 1)}
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": name,
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)


def main():
    kc, kv, kx = jax.random.split(jax.random.PRNGKey(0), 3)

    # --- width sweep in fast mode: source fixed at 32MB bf16 ---
    for K in (64, 128, 256, 512):
        SR = (32 << 20) // (K * 2)          # 32MB source
        SR = (SR // 8) * 8
        x = jax.random.normal(kx, (SR, K), jnp.bfloat16)
        idx = jax.random.randint(kc, (NNZ,), 0, SR, dtype=jnp.int32)
        _ = float(x[0, 0].astype(jnp.float32))

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(x, idx, n):
            def body(i, acc):
                xx = x + (acc * 0.0).astype(x.dtype)
                g = jnp.take(xx, idx, axis=0, mode="clip")
                return (jnp.sum(g, dtype=jnp.float32) * 1e-12).astype(
                    jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        timed(f"bf16 K={K} src=32MB", loop, (x, idx),
              extra={"src_rows": SR, "out_MB": NNZ * K * 2 >> 20})

    # --- fused value multiply on top of the fast gather ---
    K, SR = 256, 1 << 16
    x = jax.random.normal(kx, (SR, K), jnp.bfloat16)
    idx = jax.random.randint(kc, (NNZ,), 0, SR, dtype=jnp.int32)
    val = jax.random.uniform(kv, (NNZ,), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop_mul(x, idx, val, n):
        def body(i, acc):
            xx = x + (acc * 0.0).astype(x.dtype)
            g = jnp.take(xx, idx, axis=0, mode="clip") * val[:, None]
            return (jnp.sum(g, dtype=jnp.float32) * 1e-12).astype(
                jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("bf16 K=256 gather*value", loop_mul, (x, idx, val))

    # --- lane-major: gather cols of a (K, N) source ---
    xT = jax.random.normal(kx, (K, SR), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop_T(xT, idx, n):
        def body(i, acc):
            xx = xT + (acc * 0.0).astype(xT.dtype)
            g = jnp.take(xx, idx, axis=1, mode="clip")
            return (jnp.sum(g, dtype=jnp.float32) * 1e-12).astype(
                jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("bf16 K=256 axis=1 (K,N) src", loop_T, (xT, idx))

    # --- big-source K=64 (dim64 probe expectation) ---
    K = 64
    N = 2_400_000
    xb = jax.random.normal(kx, (N, K), jnp.bfloat16)
    idxb = jax.random.randint(kc, (NNZ,), 0, N, dtype=jnp.int32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop_b(x, idx, n):
        def body(i, acc):
            xx = x + (acc * 0.0).astype(x.dtype)
            g = jnp.take(xx, idx, axis=0, mode="clip")
            return (jnp.sum(g, dtype=jnp.float32) * 1e-12).astype(
                jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("bf16 K=64 src=2.4M rows (big)", loop_b, (xb, idxb))


if __name__ == "__main__":
    main()
