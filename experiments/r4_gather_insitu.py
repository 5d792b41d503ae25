"""Why does the in-situ seg2 gather run ~100M rows/s when the
microbenchmark said 190M?  Isolate (traced vs constant slice offset) x
(materialized vs fused-away gather output).

Usage: python experiments/r4_gather_insitu.py
"""
import functools
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

N = 2_449_029
K = 256
SR = 1 << 17
NW = 16                  # windows per iteration
EW = 937_472             # gathered rows per window (full-scale ECW)
ITERS = 3
T0 = time.perf_counter()


def timed(name, loop_fn, args):
    try:
        t0 = time.perf_counter()
        float(loop_fn(*args, n=ITERS))
        cs = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop_fn(*args, n=ITERS))
        dt = (time.perf_counter() - t0) / ITERS
        rows = NW * EW
        print(json.dumps({"case": name, "ms": round(dt * 1e3, 2),
                          "rows_per_s_M": round(rows / dt / 1e6, 1),
                          "compile_s": round(cs, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": name,
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)


def main():
    kc, kx = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (N, K), jnp.bfloat16)
    idx = jax.random.randint(kc, (EW,), 0, SR, dtype=jnp.int32)
    _ = float(x[0, 0].astype(jnp.float32))

    def make(traced_offset, materialize, barrier_src=True):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(x, idx, n):
            def body(i, acc):
                xx = x + (acc * 0.0).astype(x.dtype)

                def win(k, tot):
                    if traced_offset:
                        base = (k * SR) % (N - SR)
                    else:
                        base = jnp.int32(0)
                    src = jax.lax.dynamic_slice(
                        xx, (base.astype(jnp.int32), jnp.int32(0)),
                        (SR, K))
                    if barrier_src:
                        src = jax.lax.optimization_barrier(src)
                    g = jnp.take(src, idx, axis=0, mode="clip")
                    if materialize:
                        g = jax.lax.optimization_barrier(g)
                    return tot + jnp.sum(g, dtype=jnp.float32)
                tot = jax.lax.fori_loop(0, NW, win, jnp.float32(0))
                return (tot * 1e-12).astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return loop

    for name, tr, mat in (
            ("constant offset, fused", False, False),
            ("constant offset, MATERIALIZED", False, True),
            ("traced offset, fused", True, False),
            ("traced offset, MATERIALIZED", True, True)):
        timed(name, make(tr, mat), (x, idx))

    # no slice at all: gather straight from the full array, materialized
    idx_full = jax.random.randint(kc, (EW,), 0, N, dtype=jnp.int32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def big(x, idx, n):
        def body(i, acc):
            xx = x + (acc * 0.0).astype(x.dtype)

            def win(k, tot):
                g = jax.lax.optimization_barrier(
                    jnp.take(xx, idx, axis=0, mode="clip"))
                return tot + jnp.sum(g, dtype=jnp.float32)
            tot = jax.lax.fori_loop(0, NW, win, jnp.float32(0))
            return (tot * 1e-12).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("big source, MATERIALIZED", big, (x, idx_full))


if __name__ == "__main__":
    main()


def variant_f():
    """Distinct cols per window (nothing hoistable): static python-unrolled
    offsets vs traced offsets, and the true big-source rate."""
    import jax
    import jax.numpy as jnp
    kc, kx = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (N, K), jnp.bfloat16)
    idx_all = jax.random.randint(kc, (NW * EW,), 0, SR, dtype=jnp.int32)
    idx_big = jax.random.randint(kc, (NW * EW,), 0, N, dtype=jnp.int32)
    _ = float(x[0, 0].astype(jnp.float32))

    def make(static_offset, big=False):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(x, idx_all, n):
            def body(i, acc):
                xx = x + (acc * 0.0).astype(x.dtype)
                tot = jnp.float32(0)
                if static_offset:
                    for k in range(NW):
                        src = jax.lax.optimization_barrier(
                            jax.lax.dynamic_slice(
                                xx, (jnp.int32((k * SR) % (N - SR)),
                                     jnp.int32(0)), (SR, K)))
                        ids = jax.lax.dynamic_slice(idx_all, (k * EW,),
                                                    (EW,))
                        g = jnp.take(src, ids, axis=0, mode="clip")
                        tot = tot + jnp.sum(g, dtype=jnp.float32)
                else:
                    def win(k, tot):
                        if big:
                            src = xx
                        else:
                            base = ((k * SR) % (N - SR)).astype(jnp.int32)
                            src = jax.lax.optimization_barrier(
                                jax.lax.dynamic_slice(
                                    xx, (base, jnp.int32(0)), (SR, K)))
                        ids = jax.lax.dynamic_slice(
                            idx_all, ((k * EW).astype(jnp.int32),), (EW,))
                        g = jnp.take(src, ids, axis=0, mode="clip")
                        return tot + jnp.sum(g, dtype=jnp.float32)
                    tot = jax.lax.fori_loop(0, NW, win, jnp.float32(0))
                return (tot * 1e-12).astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return loop

    timed("F1 static-offset slices, distinct cols", make(True),
          (x, idx_all))
    timed("F2 traced-offset slices, distinct cols", make(False),
          (x, idx_all))
    timed("F3 big source, distinct cols", make(False, big=True),
          (x, idx_big))


if __name__ == "__main__" and os.environ.get("VARIANT_F"):
    variant_f()
