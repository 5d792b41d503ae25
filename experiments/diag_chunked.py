"""Component timing for the chunked SpMM pipeline on the real TPU."""
import time

import jax
import jax.numpy as jnp

from paddle_sparse_tpu.ops.kernels.spmm_pallas import (
    plan_row_chunks, segment_rows_matmul, spmm_csr_chunked)


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    num_nodes, nnz, K = 500_000, 25_000_000, 64
    deg = nnz // num_nodes
    row = (jnp.arange(nnz, dtype=jnp.int32) // deg).astype(jnp.int32)
    key = jax.random.PRNGKey(0)
    kc, kv, kx = jax.random.split(key, 3)
    col = jax.random.randint(kc, (nnz,), 0, num_nodes, dtype=jnp.int32)
    value = jax.random.uniform(kv, (nnz,), jnp.float32)
    x = jax.random.normal(kx, (num_nodes, K), jnp.float32)
    rowptr = jnp.searchsorted(row, jnp.arange(num_nodes + 1,
                                              dtype=jnp.int32)).astype(jnp.int32)
    jax.block_until_ready((row, col, value, x, rowptr))

    gather = jax.jit(lambda col, x: jnp.take(x, col, axis=0, mode="clip"))
    t = timeit(gather, col, x)
    gb = nnz * K * 4 / 1e9
    print(f"gather only:        {t*1e3:8.2f} ms  ({gb/t:7.1f} GB/s of output)")

    gather_scale = jax.jit(
        lambda col, v, x: jnp.take(x, col, axis=0, mode="clip") * v[:, None])
    t = timeit(gather_scale, col, value, x)
    print(f"gather+scale:       {t*1e3:8.2f} ms  ({gb/t:7.1f} GB/s of output)")

    products = gather_scale(col, value, x)
    jax.block_until_ready(products)

    for split in (True, False):
        f = jax.jit(lambda p, rp: segment_rows_matmul(
            p, None, rp, num_nodes, split=split),
            static_argnames=())
        t = timeit(f, products, rowptr)
        print(f"reduce split={split!s:5}: {t*1e3:8.2f} ms  "
              f"({gb/t:7.1f} GB/s of products)")

    del products
    CR, EC, nb = plan_row_chunks(jax.device_get(rowptr), K)
    print(f"plan: CR={CR} EC={EC} nblocks={nb}")
    f = jax.jit(lambda rp, r, c, v, xx: spmm_csr_chunked(
        rp, r, c, v, xx, num_nodes, CR, EC))
    t = timeit(f, rowptr, row, col, value, x)
    print(f"chunked full:       {t*1e3:8.2f} ms  ({gb/t:7.1f} GB/s)")


if __name__ == "__main__":
    main()
