"""Measure raw XLA row-gather / copy / scatter bandwidth on the TPU."""
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    N, K = 500_000, 64
    nnz = 8_000_000
    key = jax.random.PRNGKey(0)
    kc, kx = jax.random.split(key)
    col = jax.random.randint(kc, (nnz,), 0, N, dtype=jnp.int32)
    col_sorted = jnp.sort(col)
    x = jax.random.normal(kx, (N, K), jnp.float32)
    x128 = jax.random.normal(kx, (N, 128), jnp.float32)
    big = jax.random.normal(kx, (nnz, K), jnp.float32)
    jax.block_until_ready((col, x, big, x128, col_sorted))

    out_gb = nnz * K * 4 / 1e9

    t = timeit(jax.jit(lambda b: b * 2.0), big)
    print(f"copy*2 (nnz,64):      {t*1e3:8.2f} ms  {2*out_gb/t:7.1f} GB/s")

    t = timeit(jax.jit(lambda x, c: jnp.take(x, c, axis=0, mode='clip')),
               x, col)
    print(f"gather rand (nnz,64): {t*1e3:8.2f} ms  {out_gb/t:7.1f} GB/s out")

    t = timeit(jax.jit(lambda x, c: jnp.take(x, c, axis=0, mode='clip')),
               x, col_sorted)
    print(f"gather sort (nnz,64): {t*1e3:8.2f} ms  {out_gb/t:7.1f} GB/s out")

    t = timeit(jax.jit(lambda x, c: jnp.take(x, c, axis=0, mode='clip')),
               x128, col)
    print(f"gather rand (nnz,128):{t*1e3:8.2f} ms  {2*out_gb/t:7.1f} GB/s out")

    t = timeit(jax.jit(lambda x, c: x.at[c].add(1.0)), x, col)
    print(f"scatter-add const:    {t*1e3:8.2f} ms  {nnz*K*4/t/1e9:7.1f} GB/s")

    t = timeit(jax.jit(
        lambda b, c: jax.ops.segment_sum(b, c, num_segments=N,
                                         indices_are_sorted=True)),
        big, col_sorted)
    print(f"segsum sorted:        {t*1e3:8.2f} ms  {out_gb/t:7.1f} GB/s in")


if __name__ == "__main__":
    main()
