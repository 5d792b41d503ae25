"""Pallas TPU kernel: CSR segmented row-reduction for SpMM.

Why this kernel exists (measured on TPU v5e, experiments/diag_spmm2.py):
XLA's sorted ``segment_sum`` lowering runs at ~27 GB/s of roofline bytes —
the scatter-style emitter serializes.  This kernel replaces it with a
*streaming* formulation that never scatters:

1. XLA performs the feature gather + edge scaling
   (``take(x, col) * value``), producing the scaled product stream
   ``P (nnz, K)`` in row-sorted order.
2. This kernel walks row tiles (``R`` rows per grid step).  For each tile it
   streams the tile's edge chunks (``E`` edges) from HBM via double-buffered
   DMA, builds the 0/1 selection matrix ``S[r, e] = (row[e] == base + r)``
   *in registers* (two iotas — no HBM traffic), and accumulates
   ``acc += S @ P_chunk`` on the MXU.  All HBM reads/writes are sequential.

TPU-shape details:

* Mosaic requires HBM DMA slices to be 128-lane aligned, so for ``K < 128``
  the product stream is viewed as ``(nnz/f, 128)`` with ``f = 128 // K``
  edges packed per lane-row (bit-identical reshape).  The one-hot matmul is
  then done per sub-slot: ``acc += S_j @ P[:, j*K:(j+1)*K]`` where ``S_j``
  selects the edges in packing slot ``j``.
* Chunks are aligned to global ``E``-edge boundaries, not tile boundaries —
  a chunk may contain edges of neighboring tiles, which contribute zero
  because ``row`` is globally sorted and the one-hot range is
  ``[base, base + R)``.  (Padding edges carry ``row = M_pad``.)

Cost balance: flops/edge = ``R*K*2`` vs bytes/edge ``4*K + 4``; ``R = 128``,
``K = 64`` puts the MXU (HIGHEST precision = 3-pass bf16) slightly under the
HBM roofline, which is the target regime.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _reduce_kernel(
    tile_ptr_ref,       # scalar prefetch: (num_tiles + 1,) int32
    prod_hbm,           # (nnz_pad/f, 128) f32 — packed scaled products
    row_hbm,            # (f, nnz_pad/f) int32 — row ids per packing slot
    out_ref,            # (R, K) f32 — this tile's output rows
    chunk_buf,          # VMEM (2, E/f, 128) f32
    rowid_buf,          # VMEM (2, f, E/f) int32
    acc_ref,            # VMEM (R, K) f32
    sems,               # DMA semaphores (2, 2)
    *, R: int, E: int, K: int, f: int):
    rb = pl.program_id(0)
    e0 = tile_ptr_ref[rb]
    e1 = tile_ptr_ref[rb + 1]
    # chunk range aligned to global E boundaries
    c0 = e0 // E
    c1 = jax.lax.max((e1 + E - 1) // E, c0 + 1)
    base = rb * R
    Ef = E // f

    def start_dma(slot, c):
        start = pl.multiple_of(c * Ef, Ef)
        pltpu.make_async_copy(prod_hbm.at[pl.ds(start, Ef), :],
                              chunk_buf.at[slot], sems.at[slot, 0]).start()
        pltpu.make_async_copy(row_hbm.at[:, pl.ds(start, Ef)],
                              rowid_buf.at[slot], sems.at[slot, 1]).start()

    def wait_dma(slot, c):
        start = pl.multiple_of(c * Ef, Ef)
        pltpu.make_async_copy(prod_hbm.at[pl.ds(start, Ef), :],
                              chunk_buf.at[slot], sems.at[slot, 0]).wait()
        pltpu.make_async_copy(row_hbm.at[:, pl.ds(start, Ef)],
                              rowid_buf.at[slot], sems.at[slot, 1]).wait()

    start_dma(0, c0)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    local_r = jax.lax.broadcasted_iota(jnp.int32, (R, Ef), 0)

    def body(c, _):
        slot = jax.lax.rem(c - c0, jnp.int32(2))

        @pl.when(c + 1 < c1)
        def _():
            start_dma(jax.lax.rem(c + 1 - c0, jnp.int32(2)), c + 1)

        wait_dma(slot, c)
        chunk = chunk_buf[slot]                      # (Ef, 128)
        for j in range(f):
            rows_j = rowid_buf[slot, j:j + 1, :]     # (1, Ef)
            sel = (rows_j - base == local_r).astype(jnp.float32)
            acc_ref[:] += jax.lax.dot_general(
                sel, chunk[:, j * K:(j + 1) * K],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        return 0

    jax.lax.fori_loop(c0, c1, body, 0)
    out_ref[:] = acc_ref[:]


@functools.partial(jax.jit,
                   static_argnames=("num_rows", "tile_rows", "chunk_edges",
                                    "interpret"))
def segment_rows_matmul(products: jax.Array, row: jax.Array, rowptr: jax.Array,
                        num_rows: int, tile_rows: int = 128,
                        chunk_edges: int = 2048,
                        interpret: bool = False) -> jax.Array:
    """Streaming CSR row-reduction: ``out[m] = sum_{row[e]=m} products[e]``.

    ``products`` (nnz, K) must be row-sorted; ``row`` the sorted row ids;
    ``rowptr`` the CSR pointer (len num_rows + 1).  K must divide into 128
    or be a multiple of 128.  Returns (num_rows, K) f32.
    """
    R, E = tile_rows, chunk_edges
    nnz, K = products.shape
    if K >= LANES:
        assert K % LANES == 0, f"K={K} must be a multiple of {LANES}"
        f = 1
    else:
        assert LANES % K == 0, f"K={K} must divide {LANES}"
        f = LANES // K
    assert E % f == 0

    num_tiles = pl.cdiv(num_rows, R)
    M_pad = num_tiles * R

    # pad the edge stream to a whole number of chunks (+1 slack chunk so the
    # last tile's aligned range stays in bounds); pads sort after all tiles
    pad_e = E + (-nnz) % E
    products = jnp.pad(products.astype(jnp.float32), ((0, pad_e), (0, 0)))
    row_p = jnp.pad(row.astype(jnp.int32), (0, pad_e),
                    constant_values=M_pad)
    nnz_pad = nnz + pad_e

    packed = products.reshape(nnz_pad // f, f * K) if f > 1 else products
    # slot-j row ids: row of edge (i*f + j) at position (j, i)
    rows_packed = row_p.reshape(nnz_pad // f, f).T if f > 1 \
        else row_p.reshape(1, -1)

    tile_ptr = rowptr[jnp.minimum(
        jnp.arange(num_tiles + 1) * R, num_rows)].astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((R, K), lambda i, ptr: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, E // f, f * K), jnp.float32),
            pltpu.VMEM((2, f, E // f), jnp.int32),
            pltpu.VMEM((R, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    kernel = functools.partial(_reduce_kernel, R=R, E=E, K=K, f=f)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M_pad, K), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nnz * R * K,
            bytes_accessed=nnz * (4 * K + 4) + M_pad * K * 4,
            transcendentals=0),
        interpret=interpret,
    )(tile_ptr, packed, rows_packed)
    return out[:num_rows]


def spmm_pallas(rowptr: jax.Array, col: jax.Array,
                value: Optional[jax.Array], x: jax.Array,
                row: Optional[jax.Array] = None,
                tile_rows: int = 128, chunk_edges: int = 2048,
                interpret: bool = False) -> jax.Array:
    """Full SpMM (sum-reduce): XLA gather/scale + Pallas row reduction.

    Forward only; gradients are wired by ``ops.spmm`` (backward = transpose
    SpMM through the same kernel + an SDDMM for the value grad).
    """
    from ..convert import ptr2ind
    num_rows = int(rowptr.shape[0]) - 1
    if row is None:
        row = ptr2ind(rowptr, int(col.shape[0]))
    products = jnp.take(x, col, axis=0, mode="clip").astype(jnp.float32)
    if value is not None:
        products = products * value[:, None].astype(jnp.float32)
    return segment_rows_matmul(products, row, rowptr, num_rows,
                               tile_rows=tile_rows, chunk_edges=chunk_edges,
                               interpret=interpret)
