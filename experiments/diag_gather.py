"""Gather strategies for K=64 rows (half a vreg): packed-row gather."""
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        _ = float(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    N = 100_000
    nnz = 5_000_000
    K = 64
    key = jax.random.PRNGKey(0)
    col = jax.random.randint(key, (nnz,), 0, N, dtype=jnp.int32)
    x = jax.random.normal(key, (N, K), jnp.float32)
    jax.block_until_ready((col, x))

    base = jax.jit(lambda v: v.sum())
    t0 = timeit(base, x)
    print(f"baseline: {t0*1e3:.2f} ms")

    g1 = jax.jit(lambda x, c: jnp.take(x, c, axis=0, mode="clip").sum())
    t = timeit(g1, x, col) - t0
    print(f"plain take K=64:     {t*1e3:8.2f} ms -> {nnz*K*4/t/1e9:6.1f} GB/s useful")

    # packed: view as (N//2, 128); gather row pairs, select the half we need
    x2 = x.reshape(N // 2, 2 * K)

    def packed(x2, c):
        pair = jnp.take(x2, c // 2, axis=0, mode="clip")      # (nnz, 128)
        left, right = pair[:, :K], pair[:, K:]
        sel = jnp.where((c % 2 == 0)[:, None], left, right)
        return sel.sum()
    t = timeit(jax.jit(packed), x2, col) - t0
    print(f"packed-pair gather:  {t*1e3:8.2f} ms -> {nnz*K*4/t/1e9:6.1f} GB/s useful")

    # packed x4: (N//4, 256)
    x4 = x.reshape(N // 4, 4 * K)

    def packed4(x4, c):
        quad = jnp.take(x4, c // 4, axis=0, mode="clip")      # (nnz, 256)
        r = c % 4
        quad = quad.reshape(nnz, 4, K)
        sel = jnp.where((r == 0)[:, None], quad[:, 0], 0)
        for i in (1, 2, 3):
            sel = sel + jnp.where((r == i)[:, None], quad[:, i], 0)
        return sel.sum()
    t = timeit(jax.jit(packed4), x4, col) - t0
    print(f"packed-quad gather:  {t*1e3:8.2f} ms -> {nnz*K*4/t/1e9:6.1f} GB/s useful")

    # one-hot select variant for pair (matmul-free broadcast select)
    def packed_oh(x2, c):
        pair = jnp.take(x2, c // 2, axis=0, mode="clip")
        pair = pair.reshape(nnz, 2, K)
        onehot = jax.nn.one_hot(c % 2, 2, dtype=x2.dtype)      # (nnz, 2)
        return (pair * onehot[:, :, None]).sum()
    t = timeit(jax.jit(packed_oh), x2, col) - t0
    print(f"packed onehot-sel:   {t*1e3:8.2f} ms -> {nnz*K*4/t/1e9:6.1f} GB/s useful")


if __name__ == "__main__":
    main()
