"""Round-4: gather issue-rate vs SOURCE row count, on the real TPU.

Round-3 established: jnp.take materializes ~70M rows/s from big sources,
~210M rows/s from sources <= 2^17 rows (including an optimization_barrier'd
dynamic_slice of a big array).  This probe maps the full curve so the
seg-v2 SpMM can pick the optimal segment size, and answers:

  * does the rate keep rising below 2^17 rows?
  * how much does the per-iteration slice COPY cost (in-loop vs direct
    small source)?
  * do two INDEPENDENT gathers overlap (2 slices, summed)?
  * bf16 vs f32 stream.

All loops chain every operand through the carry (XLA hoists loop-invariant
gathers) and carries a full-reduction scalar (a scalar slice lets XLA
DCE-slice through the gather).

Usage: python experiments/r4_gather_curve.py
"""
import functools
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

NSRC = 1 << 22            # 4.2M-row master array
K = 256
NNZ = 4_000_000           # gathered rows per iteration
ITERS = 4

T0 = time.perf_counter()


def log(m):
    print(f"[{time.perf_counter() - T0:7.1f}s] {m}", flush=True)


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
        return dt
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": name,
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)
        return None


def main():
    kc, kx = jax.random.split(jax.random.PRNGKey(0))
    xf32 = jax.random.normal(kx, (NSRC, K), jnp.float32)
    xbf = xf32.astype(jnp.bfloat16)
    _ = float(xbf[0, 0].astype(jnp.float32))
    log("data ready")

    def make_loop(dtype_arr, SR, in_loop_slice=True, nslices=1):
        nnz_per = NNZ // nslices

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(x, idx, n):
            def body(i, acc):
                xx = x + (acc * 0.0).astype(x.dtype)
                total = acc
                for s in range(nslices):
                    base = jnp.int32(s * SR)
                    if in_loop_slice:
                        src = jax.lax.optimization_barrier(
                            jax.lax.dynamic_slice(xx, (base, jnp.int32(0)),
                                                  (SR, K)))
                    else:
                        src = jax.lax.dynamic_slice(xx, (base,
                                                         jnp.int32(0)),
                                                    (SR, K))
                    ids = jax.lax.dynamic_slice(idx, (s * nnz_per,),
                                                (nnz_per,))
                    g = jnp.take(src, ids, axis=0, mode="clip")
                    total = total + (jnp.sum(g, dtype=jnp.float32)
                                     * 1e-12)
                return total.astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        return loop

    # --- rate curve: segment size sweep, bf16 ---
    for lg in (13, 14, 15, 16, 17, 18, 19, 20, 22):
        SR = 1 << lg
        idx = jax.random.randint(kc, (NNZ,), 0, SR, dtype=jnp.int32)
        timed(f"bf16 slice+gather SR=2^{lg}",
              make_loop(jnp.bfloat16, SR), (xbf, idx),
              extra={"src_rows": SR})

    # --- f32 comparison at two sizes ---
    for lg in (16, 17):
        SR = 1 << lg
        idx = jax.random.randint(kc, (NNZ,), 0, SR, dtype=jnp.int32)
        timed(f"f32 slice+gather SR=2^{lg}",
              make_loop(jnp.float32, SR), (xf32, idx),
              extra={"src_rows": SR})

    # --- no-barrier variant: does the fused slice fall back to slow? ---
    SR = 1 << 17
    idx = jax.random.randint(kc, (NNZ,), 0, SR, dtype=jnp.int32)
    timed("bf16 gather SR=2^17 NO barrier",
          make_loop(jnp.bfloat16, SR, in_loop_slice=False), (xbf, idx))

    # --- overlap probe: 2 and 4 independent slice+gathers per iter ---
    for ns in (2, 4):
        SR = 1 << 17
        idx = jax.random.randint(kc, (NNZ,), 0, SR, dtype=jnp.int32)
        timed(f"bf16 {ns}x independent SR=2^17",
              make_loop(jnp.bfloat16, SR, nslices=ns), (xbf, idx))

    # --- sorted-index variant (locality within the small source) ---
    SR = 1 << 17
    idx = jnp.sort(jax.random.randint(kc, (NNZ,), 0, SR, dtype=jnp.int32))
    timed("bf16 SORTED idx SR=2^17",
          make_loop(jnp.bfloat16, SR), (xbf, idx))


if __name__ == "__main__":
    main()
