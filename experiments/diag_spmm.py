"""Microbenchmark the SpMM pipeline stages on the attached TPU."""
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    N = 100_000
    nnz = 5_000_000
    K = 64
    deg = nnz // N
    key = jax.random.PRNGKey(0)
    row = (jnp.arange(nnz, dtype=jnp.int32) // deg).astype(jnp.int32)
    col = jax.random.randint(key, (nnz,), 0, N, dtype=jnp.int32)
    val = jax.random.uniform(key, (nnz,), jnp.float32)
    x = jax.random.normal(key, (N, K), jnp.float32)
    jax.block_until_ready((row, col, val, x))

    noop = jax.jit(lambda v: v + 1.0)
    print(f"dispatch+noop:    {timeit(noop, val)*1e3:8.3f} ms")

    copy = jax.jit(lambda x: x * 2.0)
    big = jax.random.normal(key, (nnz,), jnp.float32)
    t = timeit(copy, big)
    print(f"stream 5M f32:    {t*1e3:8.3f} ms -> {2*nnz*4/t/1e9:6.1f} GB/s")

    gather = jax.jit(lambda x, col: x[col])
    t = timeit(gather, x, col)
    by = nnz * K * 4 * 2 + nnz * 4
    print(f"gather rows:      {t*1e3:8.3f} ms -> {by/t/1e9:6.1f} GB/s")

    seg = jax.jit(lambda p, row: jax.ops.segment_sum(
        p, row, num_segments=N, indices_are_sorted=True))
    p = jax.random.normal(key, (nnz, K), jnp.float32)
    t = timeit(seg, p, row)
    by = nnz * K * 4 + N * K * 4
    print(f"segsum sorted:    {t*1e3:8.3f} ms -> {by/t/1e9:6.1f} GB/s")

    seg_u = jax.jit(lambda p, row: jax.ops.segment_sum(
        p, row, num_segments=N))
    t = timeit(seg_u, p, row)
    print(f"segsum unsorted:  {t*1e3:8.3f} ms -> {by/t/1e9:6.1f} GB/s")

    def full(v, x):
        prod = x[col] * v[:, None]
        return jax.ops.segment_sum(prod, row, num_segments=N,
                                   indices_are_sorted=True)
    t = timeit(jax.jit(full), val, x)
    by = nnz * (8 + 4 + K * 4) + N * K * 4
    print(f"full spmm:        {t*1e3:8.3f} ms -> {by/t/1e9:6.1f} GB/s (roofline bytes)")

    # CSR-block formulation: fixed rows per block via reshape (uniform deg)
    def blocked(v, x):
        prod = x[col] * v[:, None]          # (nnz, K)
        return prod.reshape(N, deg, K).sum(axis=1)
    t = timeit(jax.jit(blocked), val, x)
    print(f"blocked (reshape):{t*1e3:8.3f} ms -> {by/t/1e9:6.1f} GB/s")

    # gather via take along axis=0 with mode clip
    gt = jax.jit(lambda x, col: jnp.take(x, col, axis=0, mode="clip"))
    t = timeit(gt, x, col)
    by2 = nnz * K * 4 * 2 + nnz * 4
    print(f"take(mode=clip):  {t*1e3:8.3f} ms -> {by2/t/1e9:6.1f} GB/s")


if __name__ == "__main__":
    main()
