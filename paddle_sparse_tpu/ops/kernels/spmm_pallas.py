"""Pallas TPU kernel: CSR segmented row-reduction for SpMM.

Why this kernel exists (measured on TPU v5e, experiments/diag_spmm2.py):
XLA's sorted ``segment_sum`` lowering runs at ~27 GB/s of roofline bytes —
the scatter-style emitter serializes.  This kernel replaces it with a
*streaming* formulation that never scatters:

1. XLA performs the feature gather + edge scaling
   (``take(x, col) * value``), producing the scaled product stream
   ``P (nnz, K)`` in row-sorted order.
2. The kernel walks a flat grid of *work items* — (row-tile, edge-chunk)
   pairs, row-tiles of ``R`` rows, chunks of ``E`` edges.  Each item loads
   its chunk (automatic, double-buffered Pallas pipelining — no manual DMA),
   builds the 0/1 selection matrix ``S[r, e] = (row[e] == tile*R + r)`` from
   two iotas (registers only), and accumulates ``out += S @ P_chunk`` on the
   MXU.  Consecutive items of one tile map to the *same* output block, which
   Pallas keeps resident in VMEM until the tile changes (standard reduction
   grid pattern) — all HBM traffic is sequential.

Work-item construction (host/XLA side): tile t covers chunks
``[tile_ptr[t] // E, ceil(tile_ptr[t+1] / E))`` — boundary chunks are
processed by both adjacent tiles, and foreign/padded edges self-mask because
``row`` is globally sorted (their local index falls outside ``[0, R)``).
The item count is bounded statically by ``nchunks + ntiles``.

Cost balance: flops/edge = ``R*K*2`` vs bytes/edge ``~4*K``; with R=128,
K=64 and HIGHEST-precision f32 (3-pass bf16 MXU) the MXU stays at or under
the HBM roofline, which is the target regime.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reduce_kernel(item_tile_ref, item_chunk_ref, item_first_ref,
                   chunk_ref, rows_ref, out_ref, *, R: int, E: int):
    i = pl.program_id(0)
    t = item_tile_ref[i]

    @pl.when(item_first_ref[i] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    base = t * R
    local_r = jax.lax.broadcasted_iota(jnp.int32, (R, E), 0)
    sel = (rows_ref[:] - base == local_r).astype(jnp.float32)   # (R, E)
    out_ref[:] += jax.lax.dot_general(
        sel, chunk_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit,
                   static_argnames=("num_rows", "tile_rows", "chunk_edges",
                                    "interpret"))
def segment_rows_matmul(products: jax.Array, row: jax.Array, rowptr: jax.Array,
                        num_rows: int, tile_rows: int = 128,
                        chunk_edges: int = 2048,
                        interpret: bool = False) -> jax.Array:
    """Streaming CSR row-reduction: ``out[m] = sum_{row[e]=m} products[e]``.

    ``products`` (nnz, K) must be row-sorted; ``row`` the sorted row ids;
    ``rowptr`` the CSR pointer (len num_rows + 1).  Returns (num_rows, K)
    f32.
    """
    R, E = tile_rows, chunk_edges
    nnz, K = products.shape

    num_tiles = pl.cdiv(num_rows, R)
    M_pad = num_tiles * R

    pad_e = (-nnz) % E
    nnz_pad = nnz + pad_e
    nchunks = nnz_pad // E
    products = jnp.pad(products.astype(jnp.float32), ((0, pad_e), (0, 0)))
    rows2d = jnp.pad(row.astype(jnp.int32), (0, pad_e),
                     constant_values=M_pad).reshape(nchunks, E)

    # ---- work items: (tile, chunk) pairs, static bound ----------------
    # Trailing pad items route to a dummy tile (block sliced off at the
    # end): chunk 0's edges have local row >= R there, so they self-mask.
    ITEMS = nchunks + num_tiles
    tp = rowptr[jnp.minimum(jnp.arange(num_tiles + 1) * R,
                            num_rows)].astype(jnp.int32)
    c_start = tp[:-1] // E
    c_end = jnp.maximum((tp[1:] + E - 1) // E, c_start + 1)
    spans = c_end - c_start                       # >= 1 per tile
    spans_ext = jnp.concatenate(
        [spans, jnp.asarray([ITEMS], spans.dtype)])
    c_start_ext = jnp.concatenate(
        [c_start, jnp.zeros((1,), c_start.dtype)])
    item_tile = jnp.repeat(jnp.arange(num_tiles + 1, dtype=jnp.int32),
                           spans_ext, total_repeat_length=ITEMS)
    span_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(spans_ext).astype(jnp.int32)])
    pos = jnp.arange(ITEMS, dtype=jnp.int32) - span_start[item_tile]
    item_chunk = jnp.clip(c_start_ext[item_tile] + pos, 0, nchunks - 1)
    item_first = (pos == 0).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ITEMS,),
        in_specs=[
            pl.BlockSpec((E, K), lambda i, t, c, f: (c[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda i, t, c, f: (c[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, K), lambda i, t, c, f: (t[i], 0),
                               memory_space=pltpu.VMEM),
    )

    kernel = functools.partial(_reduce_kernel, R=R, E=E)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M_pad + R, K), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * ITEMS * R * E * K,
            bytes_accessed=nnz_pad * (4 * K + 4) + M_pad * K * 4,
            transcendentals=0),
        interpret=interpret,
    )(item_tile, item_chunk, item_first, products, rows2d)
    return out[:num_rows]


def spmm_pallas(rowptr: jax.Array, col: jax.Array,
                value: Optional[jax.Array], x: jax.Array,
                row: Optional[jax.Array] = None,
                tile_rows: int = 128, chunk_edges: int = 2048,
                interpret: bool = False) -> jax.Array:
    """Full SpMM (sum-reduce): XLA gather/scale + Pallas row reduction.

    Forward only; gradients are wired by ``ops.spmm`` (backward = transpose
    SpMM + an SDDMM for the value grad).
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
