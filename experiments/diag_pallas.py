"""Pallas segment-reduce kernel: correctness + perf on the real TPU."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/experiments")
from tpu_timing import bench_op

from paddle_sparse_tpu.ops.kernels.spmm_pallas import (segment_rows_matmul,
                                                       spmm_pallas)


def main():
    N = 100_000
    nnz = 5_000_000
    K = 64
    deg = nnz // N
    key = jax.random.PRNGKey(0)
    row = (jnp.arange(nnz, dtype=jnp.int32) // deg).astype(jnp.int32)
    rowptr = (jnp.arange(N + 1, dtype=jnp.int32) * deg).astype(jnp.int32)
    col = jax.random.randint(key, (nnz,), 0, N, dtype=jnp.int32)
    val = jax.random.uniform(key, (nnz,), jnp.float32)
    x = jax.random.normal(key, (N, K), jnp.float32)
    jax.block_until_ready((row, col, val, x))

    # --- correctness vs XLA reference (small slice) --------------------
    out_p = spmm_pallas(rowptr, col, val, x)
    prod = jnp.take(x, col, axis=0, mode="clip") * val[:, None]
    out_ref = jax.ops.segment_sum(prod, row, num_segments=N,
                                  indices_are_sorted=True)
    err = float(jnp.abs(out_p - out_ref).max())
    rel = err / float(jnp.abs(out_ref).max())
    print(f"pallas vs xla max abs err: {err:.3e} (rel {rel:.3e})")

    # --- perf ----------------------------------------------------------
    roof_bytes = nnz * (8 + 4 + K * 4) + N * K * 4

    t = bench_op(lambda i: spmm_pallas(rowptr, col,
                                       val + 0.0 * i.astype(jnp.float32),
                                       x).sum(), iters=10)
    print(f"spmm pallas full: {t*1e3:8.2f} ms -> {roof_bytes/t/1e9:6.1f} GB/s "
          f"roofline ({roof_bytes/t/1e9/819*100:.1f}%)")

    t = bench_op(lambda i: jnp.take(
        x, col + 0 * i, axis=0, mode="clip").sum(), iters=10)
    print(f"take only:        {t*1e3:8.2f} ms")

    def reduce_only(i):
        p = prod + 0.0 * i.astype(jnp.float32)
        return segment_rows_matmul(p, row, rowptr, N).sum()
    t = bench_op(reduce_only, iters=10)
    by = nnz * (4 * K + 4) + N * K * 4
    print(f"pallas reduce:    {t*1e3:8.2f} ms -> {by/t/1e9:6.1f} GB/s stream")

    def xla_spmm(i):
        p = jnp.take(x, col + 0 * i, axis=0, mode="clip") * val[:, None]
        return jax.ops.segment_sum(p, row, num_segments=N,
                                   indices_are_sorted=True).sum()
    t = bench_op(xla_spmm, iters=10)
    print(f"spmm xla take:    {t*1e3:8.2f} ms -> {roof_bytes/t/1e9:6.1f} GB/s "
          f"roofline ({roof_bytes/t/1e9/819*100:.1f}%)")


if __name__ == "__main__":
    main()
