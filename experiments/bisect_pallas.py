"""Bisect the TPU kernel hang: (1) trivial pallas, (2) manual-DMA copy with
scalar prefetch, (3) DMA + one-hot matmul (= the spmm kernel)."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stage(name, fn):
    t0 = time.time()
    out = fn()
    jax.block_until_ready(out)
    print(f"{name}: ok in {time.time()-t0:.1f}s, checksum "
          f"{float(jnp.asarray(out).sum()):.3f}", flush=True)


def trivial():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0
    x = jnp.ones((256, 128), jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)


def dma_copy(double_buffer: bool):
    """Grid over tiles; manual chunked DMA from an ANY input; sum chunks."""
    T, E, K = 8, 256, 128
    nchunks_per_tile = 4
    total = T * nchunks_per_tile * E

    def k(ptr_ref, src_hbm, o_ref, buf, acc, sems):
        t = pl.program_id(0)
        c0 = ptr_ref[t]
        c1 = ptr_ref[t + 1]

        def start(slot, c):
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(pl.multiple_of(c * E, E), E), :],
                buf.at[slot], sems.at[slot]).start()

        def wait(slot, c):
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(pl.multiple_of(c * E, E), E), :],
                buf.at[slot], sems.at[slot]).wait()

        start(0, c0)
        acc[:] = jnp.zeros_like(acc)

        def body(c, _):
            slot = jax.lax.rem(c - c0, 2) if double_buffer else 0
            if double_buffer:
                @pl.when(c + 1 < c1)
                def _():
                    start(jax.lax.rem(c + 1 - c0, 2), c + 1)
                wait(slot, c)
            else:
                wait(0, c)
                # sequential: start next after waiting current
                @pl.when(c + 1 < c1)
                def _():
                    start(0, c + 1)
            acc[:] += buf[slot]
            return 0

        jax.lax.fori_loop(c0, c1, body, 0)
        o_ref[:] = acc[:]

    src = jnp.arange(total * K, dtype=jnp.float32).reshape(total, K) % 7
    ptr = jnp.arange(T + 1, dtype=jnp.int32) * nchunks_per_tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((E, K), lambda i, p: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, E, K), jnp.float32),
                        pltpu.VMEM((E, K), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))])
    return pl.pallas_call(
        k, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * E, K), jnp.float32))(ptr, src)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "trivial"):
        stage("trivial", trivial)
    if which in ("all", "dma1"):
        stage("dma single-buffer", lambda: dma_copy(False))
    if which in ("all", "dma2"):
        stage("dma double-buffer", lambda: dma_copy(True))
    if which in ("all", "spmm"):
        from paddle_sparse_tpu.ops.kernels.spmm_pallas import \
            segment_rows_matmul
        rng = np.random.default_rng(0)
        M, K, nnz = 1024, 64, 20000
        row = np.sort(rng.integers(0, M, nnz))
        val = rng.standard_normal((nnz, K)).astype(np.float32)
        rowptr = np.searchsorted(row, np.arange(M + 1))
        stage("spmm kernel", lambda: segment_rows_matmul(
            jnp.asarray(val), jnp.asarray(row, jnp.int32),
            jnp.asarray(rowptr, jnp.int32), M))


if __name__ == "__main__":
    main()
