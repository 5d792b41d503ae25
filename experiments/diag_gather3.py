"""Bandwidth measurement with dependence chains (axon tunnel elides
repeated identical executions, so each iteration must consume the previous
output)."""
import time

import jax
import jax.numpy as jnp


def chain_time(fn, state, args, iters=8):
    """fn(state, *args) -> state; times the whole chain."""
    f = jax.jit(fn)
    state = f(state, *args)           # warmup/compile
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = f(state, *args)
    jax.block_until_ready(state)
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

    t = chain_time(lambda s, b: s * 1.0000001 + b, big, (big,))
    print(f"axpy (nnz,64):        {t*1e3:8.2f} ms  {3*out_gb/t:7.1f} GB/s")

    def g(s, x, c):
        return s * 0.5 + jnp.take(x, c, axis=0, mode='clip')
    t = chain_time(g, big, (x, col))
    print(f"gather rand (nnz,64): {t*1e3:8.2f} ms  {out_gb/t:7.1f} GB/s out")
    t = chain_time(g, big, (x, col_sorted))
    print(f"gather sort (nnz,64): {t*1e3:8.2f} ms  {out_gb/t:7.1f} GB/s out")

    big128 = jnp.concatenate([big, big], axis=1)
    jax.block_until_ready(big128)
    t = chain_time(g, big128, (x128, col))
    print(f"gather rand (nnz,128):{t*1e3:8.2f} ms  {2*out_gb/t:7.1f} GB/s out")

    def seg(s, b, c):
        return s * 0.5 + jax.ops.segment_sum(b, c, num_segments=N,
                                             indices_are_sorted=True)
    t = chain_time(seg, x, (big, col_sorted))
    print(f"segsum sorted:        {t*1e3:8.2f} ms  {out_gb/t:7.1f} GB/s in")


if __name__ == "__main__":
    main()
