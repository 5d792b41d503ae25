"""Stage microbenchmarks v2 — force real execution via scalar readback."""
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _ = float(out)          # force through the tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = float(out)
    return (time.perf_counter() - t0) / iters


def main():
    N = 100_000
    nnz = 5_000_000
    deg = nnz // N
    key = jax.random.PRNGKey(0)
    row = (jnp.arange(nnz, dtype=jnp.int32) // deg).astype(jnp.int32)
    col = jax.random.randint(key, (nnz,), 0, N, dtype=jnp.int32)
    col_sorted = jnp.sort(col)
    val = jax.random.uniform(key, (nnz,), jnp.float32)
    jax.block_until_ready((row, col, col_sorted, val))

    noop = jax.jit(lambda v: v.sum())
    t0 = timeit(noop, val)
    print(f"baseline sum(5M): {t0*1e3:8.3f} ms")

    for K in (64, 128, 256):
        x = jax.random.normal(key, (N, K), jnp.float32)
        jax.block_until_ready(x)

        g = jax.jit(lambda x, c: jnp.take(x, c, axis=0, mode="clip").sum())
        t = timeit(g, x, col) - t0
        by = nnz * K * 4 + nnz * 4   # read-side bytes only
        print(f"K={K:3d} take random: {t*1e3:8.2f} ms -> {by/t/1e9:6.1f} GB/s read")

        t = timeit(g, x, col_sorted) - t0
        print(f"K={K:3d} take sorted: {t*1e3:8.2f} ms -> {by/t/1e9:6.1f} GB/s read")

    K = 64
    x = jax.random.normal(key, (N, K), jnp.float32)

    def spmm_fused(v, x):
        prod = jnp.take(x, col, axis=0, mode="clip") * v[:, None]
        return jax.ops.segment_sum(prod, row, num_segments=N,
                                   indices_are_sorted=True).sum()
    t = timeit(jax.jit(spmm_fused), val, x) - t0
    by = nnz * (8 + 4 + K * 4) + N * K * 4
    print(f"spmm take+segsum: {t*1e3:8.2f} ms -> {by/t/1e9:6.1f} GB/s roofline")

    def spmm_reshape(v, x):
        prod = jnp.take(x, col, axis=0, mode="clip") * v[:, None]
        return prod.reshape(N, deg, K).sum(axis=1).sum()
    t = timeit(jax.jit(spmm_reshape), val, x) - t0
    print(f"spmm take+reshape:{t*1e3:8.2f} ms -> {by/t/1e9:6.1f} GB/s roofline")

    # basic indexing x[col] (what spmm_coo uses today)
    def spmm_basic(v, x):
        prod = x[col] * v[:, None]
        return jax.ops.segment_sum(prod, row, num_segments=N,
                                   indices_are_sorted=True).sum()
    t = timeit(jax.jit(spmm_basic), val, x) - t0
    print(f"spmm x[col]:      {t*1e3:8.2f} ms -> {by/t/1e9:6.1f} GB/s roofline")

    # one_hot matmul microcheck: MXU-based segment sum over blocks
    E = 2048
    R = 512
    nblk = nnz // E
    local_row = (row % R)

    def spmm_onehot(v, x):
        prod = jnp.take(x, col, axis=0, mode="clip") * v[:, None]
        prod = prod.reshape(nblk, E, K)
        lr = local_row.reshape(nblk, E)
        onehot = jax.nn.one_hot(lr, R, dtype=jnp.float32, axis=1)  # (nblk,R,E)
        partial = jnp.einsum("bre,bek->brk", onehot, prod)
        return partial.sum()
    t = timeit(jax.jit(spmm_onehot), val, x) - t0
    print(f"spmm onehot MXU:  {t*1e3:8.2f} ms -> {by/t/1e9:6.1f} GB/s roofline")


if __name__ == "__main__":
    main()
