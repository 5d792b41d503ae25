"""Pallas TPU kernel: CSR segmented row-reduction for SpMM.

Why this kernel exists (measured on TPU v5e, experiments/diag_spmm2.py):
XLA's sorted ``segment_sum`` lowering runs at ~27 GB/s of roofline bytes —
the scatter-style emitter serializes.  This kernel replaces it with a
*streaming* formulation that never scatters:

1. XLA performs the feature gather + edge scaling
   (``take(x, col) * value``), producing the scaled product stream
   ``P (nnz, K)`` in row-sorted order.
2. The kernel walks a flat grid of *work items* — (edge-chunk, row-tile)
   pairs ordered by chunk — chunks of ``E`` edges, tiles of ``R`` rows.
   Each item selects its tile's edges out of the chunk with a 0/1 mask
   built from the tile's CSR row bounds (two ``(R, 1)`` columns — no
   per-edge row ids cross HBM at all) and accumulates
   ``out_tile += S @ P_chunk`` on the MXU.

Work-item order matters: items are sorted by (chunk, tile), and because
edges are row-sorted BOTH the chunk index and the tile index are
non-decreasing along the item list.  Pallas keeps a block resident in
VMEM while consecutive items map to it, so every product chunk is fetched
from HBM exactly once and every output tile is written back exactly once
— all HBM traffic is sequential and minimal.  (Ordering by tile instead
would re-fetch every tile-boundary chunk.)

MXU precision: the selection matrix is exact in bf16, and the f32 product
chunk is split into hi/lo bf16 halves (Dekker-style), so two one-pass
bf16 matmuls reproduce ~f32 accuracy at 3x the throughput of
``precision=HIGHEST`` (six passes).  With R=128, K=64 the kernel is
memory-bound, which is the target regime.

The reference has no SpMM (unsupported list, /root/reference/README.md:45);
the functional contract implemented here is the upstream one documented at
/root/reference/README.md:267-300.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reduce_kernel(item_tile_ref, item_chunk_ref, item_first_ref,
                   *rest, R: int, E: int, split: bool, has_acc: bool,
                   has_base: bool):
    if has_base:
        rest = rest[1:]        # tile_base only feeds the index maps
    start_ref, end_ref, chunk_ref, *rest = rest
    if has_acc:
        acc_ref, out_ref = rest
    else:
        (out_ref,) = rest
    i = pl.program_id(0)

    @pl.when(item_first_ref[i] == 1)
    def _():
        # first visit of this output tile: seed from the running
        # accumulator (segment-outer SpMM carries the output across
        # passes) or from zeros
        if has_acc:
            out_ref[:] = acc_ref[:]
        else:
            out_ref[:] = jnp.zeros_like(out_ref)

    ch = item_chunk_ref[i]
    e_ids = jax.lax.broadcasted_iota(jnp.int32, (R, E), 1) + ch * E
    sel = (e_ids >= start_ref[:]) & (e_ids < end_ref[:])        # (R, E)
    p = chunk_ref[:]
    dn = (((1,), (0,)), ((), ()))
    if p.dtype == jnp.bfloat16:
        # bf16 product stream: the selection matrix is exact in bf16 and
        # the input carries no low bits to lose — one MXU pass, f32 acc.
        acc = jax.lax.dot_general(sel.astype(jnp.bfloat16), p,
                                  dimension_numbers=dn,
                                  preferred_element_type=jnp.float32)
    elif split:
        sel16 = sel.astype(jnp.bfloat16)
        hi = p.astype(jnp.bfloat16)
        lo = (p - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(sel16, hi, dimension_numbers=dn,
                                  preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(sel16, lo, dimension_numbers=dn,
                                        preferred_element_type=jnp.float32)
    else:
        acc = jax.lax.dot_general(sel.astype(jnp.float32), p,
                                  dimension_numbers=dn,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
    out_ref[:] += acc


def _work_items_chunk_major(tp, nchunks_e: int, num_tiles: int, E: int):
    """Work items ordered by (edge-chunk, row-tile).

    ``tp`` is the tile-granular edge pointer (len num_tiles + 1, values in
    [0, nchunks_e * E]).  Chunk c's items cover tiles
    [t_end[c-1], t_end[c]] where t_end[c] is the tile containing chunk c's
    last edge (forced to the last tile for the final chunk so empty
    trailing tiles still get zeroed).  Both the chunk and tile sequences
    are non-decreasing, so Pallas revisits == VMEM-resident blocks.

    ``item_first`` marks the first item of each *tile* (zero-init): a
    tile's first appearance is always at position > 0 inside some chunk's
    span except tile 0 at item 0.

    Static item count: ``nchunks_e + num_tiles`` (each chunk adds at most
    its span; spans telescope to ``num_tiles - 1 + nchunks_e``).
    """
    ITEMS = nchunks_e + num_tiles
    edge_last = jnp.arange(1, nchunks_e + 1, dtype=tp.dtype) * E - 1
    t_end = jnp.clip(
        jnp.searchsorted(tp, edge_last, side="right") - 1, 0, num_tiles - 1)
    t_end = t_end.at[-1].set(num_tiles - 1)
    t_prev = jnp.concatenate([jnp.zeros((1,), t_end.dtype), t_end[:-1]])
    spans = t_end - t_prev + 1                    # >= 1 per chunk
    spans_ext = jnp.concatenate(
        [spans, jnp.asarray([ITEMS], spans.dtype)])
    t_prev_ext = jnp.concatenate(
        [t_prev, jnp.asarray([num_tiles], t_prev.dtype)])
    item_chunk_raw = jnp.repeat(
        jnp.arange(nchunks_e + 1, dtype=jnp.int32), spans_ext,
        total_repeat_length=ITEMS)
    span_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(spans_ext).astype(jnp.int32)])
    pos = jnp.arange(ITEMS, dtype=jnp.int32) - span_start[item_chunk_raw]
    item_tile = jnp.clip(t_prev_ext[item_chunk_raw] + pos,
                         0, num_tiles).astype(jnp.int32)
    item_chunk = jnp.clip(item_chunk_raw, 0, nchunks_e - 1)
    item_first = ((pos > 0) |
                  (jnp.arange(ITEMS) == 0)).astype(jnp.int32)
    return ITEMS, item_tile, item_chunk, item_first


def _reduce_call(bounds_start, bounds_end, products2d, items, num_tiles,
                 R, E, K, split, interpret, acc=None, tile_base=None):
    """Shared pallas_call wrapper.

    Without ``tile_base``: output is ((num_tiles+1)*R, K) — the dummy
    tile is sliced off by the caller.  ``acc`` (optional, same padded
    shape) seeds each output tile on first visit.

    With ``tile_base`` (a (1,) int32 array): windowed in-place
    accumulation — ``acc`` is a FULL-SIZE running buffer, output/acc
    blocks are offset by ``tile_base[0]`` tiles, and acc is ALIASED to
    the output, so blocks this call never visits keep their accumulated
    values (one read + one write per visited tile; untouched tiles cost
    nothing).  The caller guarantees the buffer has at least
    ``tile_base[0] + num_tiles + 1`` tiles."""
    ITEMS, item_tile, item_chunk, item_first = items
    nchunks_e = products2d.shape[0] // E
    if tile_base is None:
        bspec = pl.BlockSpec((R, 1), lambda i, t, c, f: (t[i], 0),
                             memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((E, K), lambda i, t, c, f: (c[i], 0),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((R, K), lambda i, t, c, f: (t[i], 0),
                             memory_space=pltpu.VMEM)
        scalars = [item_tile, item_chunk, item_first]
        out_rows = (num_tiles + 1) * R
        aliases = {}
    else:
        assert acc is not None
        bspec = pl.BlockSpec((R, 1), lambda i, t, c, f, b: (t[i], 0),
                             memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((E, K), lambda i, t, c, f, b: (c[i], 0),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((R, K),
                             lambda i, t, c, f, b: (t[i] + b[0], 0),
                             memory_space=pltpu.VMEM)
        scalars = [item_tile, item_chunk, item_first, tile_base]
        out_rows = acc.shape[0]
        # acc operand index counts scalar-prefetch args: 4 scalars +
        # bounds_start + bounds_end + products -> 7
        aliases = {7: 0}
    in_specs = [bspec, bspec, cspec]
    operands = [bounds_start, bounds_end, products2d]
    if acc is not None:
        in_specs.append(ospec)
        operands.append(acc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(ITEMS,),
        in_specs=in_specs,
        out_specs=ospec,
    )
    kernel = functools.partial(_reduce_kernel, R=R, E=E, split=split,
                               has_acc=acc is not None,
                               has_base=tile_base is not None)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, K), jnp.float32),
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=2 * ITEMS * R * E * K * (2 if split else 6),
            bytes_accessed=nchunks_e * E * products2d.dtype.itemsize * K
            + (num_tiles + 1) * R * (K + 2) * 4,
            transcendentals=0),
        interpret=interpret,
    )(*scalars, *operands)


def _stream_env():
    import os
    return os.environ.get("PSP_SPMM_STREAM", "f32")


# Read ONCE at import: jit caches are not keyed on the environment, so a
# mid-process flip of PSP_SPMM_STREAM must not change traced behavior
# (ADVICE r3, medium).  Callers that want a per-structure choice thread an
# explicit ``stream`` through the plan (``SpmmPlan.stream``) instead.
_STREAM_DEFAULT = _stream_env()


def _product_dtype(value, x, stream: Optional[str] = None):
    """Product-stream dtype: bf16 when BOTH operands are bf16 (an f32
    value paired with bf16 x must not silently drop to bf16 — ADVICE r1)
    OR when ``stream == "bf16"`` opts in explicitly; everything else runs
    the f32 hi/lo-split path.

    ``stream=None`` falls back to the process-start value of
    ``PSP_SPMM_STREAM`` (read once at import — flipping the env var after
    import does not retrace; pass ``stream`` explicitly for a per-call
    choice).

    The opt-in halves the dominant HBM terms (the random x-row gather and
    the product-stream round trip) at ~3 decimal digits of per-element
    precision; accumulation stays f32 inside the kernel either way.
    Default is strict f32 so conformance tests see full precision
    (VERDICT r2 item 3)."""
    common = x.dtype if value is None else jnp.promote_types(value.dtype,
                                                             x.dtype)
    if common == jnp.bfloat16:
        return jnp.bfloat16
    if common == jnp.float32 and (stream or _STREAM_DEFAULT) == "bf16":
        return jnp.bfloat16
    return jnp.float32


def _row_bounds(rowptr_rows, num_tiles, R, cap):
    """(num_tiles+1)*R x 1 start/end columns from a per-row edge pointer
    (len rows+1, clipped to [0, cap]); dummy tile rows get start=end=cap
    (always-empty selection)."""
    rows = rowptr_rows.shape[0] - 1
    start = rowptr_rows[:-1]
    end = rowptr_rows[1:]
    pad = (num_tiles + 1) * R - rows
    capv = jnp.full((pad,), cap, start.dtype)
    start = jnp.concatenate([start, capv]).reshape(-1, 1)
    end = jnp.concatenate([end, capv]).reshape(-1, 1)
    return start, end


@functools.partial(jax.jit,
                   static_argnames=("num_rows", "tile_rows", "chunk_edges",
                                    "split", "interpret"))
def segment_rows_matmul(products: jax.Array, row: Optional[jax.Array],
                        rowptr: jax.Array, num_rows: int,
                        tile_rows: int = 128, chunk_edges: int = 2048,
                        split: bool = True,
                        interpret: bool = False,
                        acc: Optional[jax.Array] = None) -> jax.Array:
    """Streaming CSR row-reduction: ``out[m] = sum_{rowptr[m]<=e<rowptr[m+1]}
    products[e]``.

    ``products`` (nnz, K) must be row-sorted; ``rowptr`` the CSR pointer
    (len num_rows + 1).  ``row`` is accepted for API compatibility and
    ignored (the kernel works entirely off row *bounds*).  ``acc``
    (optional (num_rows, K) f32) is added to the result inside the kernel
    (each output tile seeds from it on first visit — no separate add
    pass).  Returns (num_rows, K) f32.
    """
    del row
    R, E = tile_rows, chunk_edges
    nnz, K = products.shape

    num_tiles = pl.cdiv(num_rows, R)
    pad_e = (-nnz) % E
    nnz_pad = nnz + pad_e
    nchunks_e = max(1, nnz_pad // E)
    # bf16 streams stay bf16 (half the HBM traffic, single MXU pass);
    # everything else runs through the f32 hi/lo-split path.
    pdt = jnp.bfloat16 if products.dtype == jnp.bfloat16 else jnp.float32
    products = jnp.pad(products.astype(pdt), ((0, pad_e), (0, 0)))

    rp = jnp.clip(rowptr.astype(jnp.int32), 0, nnz_pad)
    # per-row bounds padded to tile grid; rows beyond num_rows are empty
    pad_rows = num_tiles * R - num_rows
    rp_full = jnp.concatenate(
        [rp, jnp.full((pad_rows,), nnz, jnp.int32)])
    bounds_start, bounds_end = _row_bounds(rp_full, num_tiles, R, nnz_pad)

    tp = rp_full[jnp.minimum(jnp.arange(num_tiles + 1) * R,
                             num_tiles * R)].astype(jnp.int32)
    items = _work_items_chunk_major(tp, nchunks_e, num_tiles, E)

    if acc is not None:
        acc = jnp.pad(acc.astype(jnp.float32),
                      ((0, (num_tiles + 1) * R - acc.shape[0]), (0, 0)))
    out = _reduce_call(bounds_start, bounds_end, products, items,
                       num_tiles, R, E, K, split, interpret, acc=acc)
    return out[:num_rows]


def plan_edge_blocks(rowptr_host, feat_dim: int, value_bytes: int = 4,
                     target_bytes: int = 512 * 1024 * 1024,
                     tile_rows: int = 128, chunk_edges: int = 2048):
    """Edge-balanced block plan: variable row spans, bounded edge count.

    Greedily cuts the row space wherever the running edge count reaches
    the per-block budget, so a power-law degree distribution cannot
    inflate the max block (r3: equal-ROW blocks blew edge capacity ~20x
    on a zipf graph whose top row held 64%% of all edges — combine with
    long-row splitting so single rows stay under the budget).  Returns
    ``(block_starts, rows_per_chunk, edge_capacity)``: an int32 numpy
    array of nblocks+1 row cut points, the max span (tile-aligned,
    static) and the max block edge count (chunk-aligned, static).
    """
    import numpy as np

    def cdiv(a, b):
        return -(-a // b)

    ptr = np.asarray(rowptr_host, dtype=np.int64)
    num_rows = int(ptr.shape[0]) - 1
    nnz = int(ptr[-1])
    budget = max(chunk_edges,
                 target_bytes // max(1, feat_dim * value_bytes))
    # cut before the row that would push a block past the budget
    cuts = np.searchsorted(ptr, np.arange(1, cdiv(nnz, budget) + 1,
                                          dtype=np.int64) * budget,
                           side="left") - 1
    starts = np.unique(np.concatenate(
        [[0], np.clip(cuts, 1, num_rows), [num_rows]])).astype(np.int32)
    spans = np.diff(starts)
    edges = ptr[starts[1:]] - ptr[starts[:-1]]
    CR = max(tile_rows,
             cdiv(int(spans.max()), tile_rows) * tile_rows)
    EC = max(chunk_edges,
             cdiv(int(edges.max()), chunk_edges) * chunk_edges)
    return starts, CR, EC


def plan_row_chunks(rowptr_host, feat_dim: int, value_bytes: int = 4,
                    target_bytes: int = 512 * 1024 * 1024,
                    tile_rows: int = 128, chunk_edges: int = 2048):
    """Host-side chunk plan for :func:`spmm_csr_chunked`.

    Splits the row space into equal contiguous blocks such that each
    block's gathered product stream (``edges * feat_dim * value_bytes``)
    stays near ``target_bytes``.  Returns ``(rows_per_chunk,
    edge_capacity, num_chunks)`` — all static ints.  ``edge_capacity`` is
    the max edge count over blocks (rounded up to ``chunk_edges``), so a
    skewed row distribution inflates the per-chunk gather; callers with
    power-law graphs should pass a smaller ``target_bytes``.
    """
    import numpy as np

    def cdiv(a, b):
        return -(-a // b)

    ptr = np.asarray(rowptr_host, dtype=np.int64)
    num_rows = int(ptr.shape[0]) - 1
    nnz = int(ptr[-1])
    total = max(1, nnz * feat_dim * value_bytes)
    nchunks = max(1, cdiv(total, target_bytes))
    R = tile_rows
    CR = max(R, cdiv(cdiv(num_rows, nchunks), R) * R)
    nchunks = max(1, cdiv(num_rows, CR))
    bounds = ptr[np.minimum(np.arange(nchunks + 1) * CR, num_rows)]
    ec = int(np.max(np.diff(bounds))) if nchunks > 0 else nnz
    E = chunk_edges
    EC = max(E, cdiv(ec, E) * E)
    return CR, EC, nchunks


@functools.partial(jax.jit,
                   static_argnames=("num_rows", "rows_per_chunk",
                                    "edge_capacity", "tile_rows",
                                    "chunk_edges", "split", "interpret",
                                    "nblocks", "stream"))
def spmm_csr_chunked(rowptr: jax.Array, row: jax.Array, col: jax.Array,
                     value: Optional[jax.Array], x: jax.Array,
                     num_rows: int, rows_per_chunk: int, edge_capacity: int,
                     tile_rows: int = 128, chunk_edges: int = 2048,
                     split: bool = True,
                     interpret: bool = False,
                     block_starts: Optional[jax.Array] = None,
                     out_scatter: Optional[jax.Array] = None,
                     nblocks: Optional[int] = None,
                     stream: Optional[str] = None) -> jax.Array:
    """Memory-bounded fused SpMM: gather + scale + Pallas row reduction,
    processed in contiguous row blocks so the scaled product stream never
    exceeds ``edge_capacity * K * 4`` bytes of HBM (vs ``nnz * K * 4`` for
    the single-shot :func:`segment_rows_matmul` path — 31.7 GB at
    ogbn-products scale, which cannot exist on a 16 GB chip).

    Requirements: ``row`` sorted ascending; every ``rows_per_chunk`` block
    of rows holds at most ``edge_capacity`` edges (use
    :func:`plan_row_chunks`).  Runs as a sequential ``lax.map`` over
    blocks; each step gathers its edge window with XLA and reduces it with
    the streaming work-item kernel.
    """
    del row
    R, E = tile_rows, chunk_edges
    CR, EC = rows_per_chunk, edge_capacity
    assert CR % R == 0 and EC % E == 0
    T = CR // R
    NCE = EC // E
    if nblocks is None:
        nblocks = pl.cdiv(num_rows, CR)
    M_pad_total = max(nblocks * CR, num_rows)
    nnz = col.shape[0]
    K = x.shape[1]

    rowptr = rowptr.astype(jnp.int32)
    rowptr_pad = jnp.concatenate(
        [rowptr, jnp.full((M_pad_total + 1 - rowptr.shape[0],),
                          nnz, jnp.int32)])
    col_pad = jnp.concatenate(
        [col.astype(jnp.int32), jnp.zeros((EC,), jnp.int32)])
    pdt = _product_dtype(value, x, stream)
    x32 = x.astype(pdt)
    val_pad = None
    if value is not None:
        val_pad = jnp.concatenate(
            [value.astype(pdt), jnp.zeros((EC,), pdt)])

    row_off = jnp.arange(CR + 1, dtype=jnp.int32)

    if block_starts is not None:
        bs = jnp.clip(block_starts.astype(jnp.int32), 0, M_pad_total)

    def block_fn(c):
        if block_starts is None:
            r0 = c * CR
            win_hi = jnp.int32(EC)
        else:
            # edge-balanced variable-span blocks: rows beyond this
            # block's span get empty bound windows via the upper clip
            r0 = bs[c]
            win_hi = jnp.minimum(
                jnp.take(rowptr_pad, bs[c + 1], mode="clip")
                - jnp.take(rowptr_pad, r0, mode="clip"), EC)
        rp_l = jnp.take(rowptr_pad, r0 + row_off, mode="clip")
        e0 = rp_l[0]
        rp_l = jnp.clip(rp_l - e0, 0, win_hi)
        bounds_start, bounds_end = _row_bounds(rp_l, T, R, EC)

        cols_l = jax.lax.dynamic_slice(col_pad, (e0,), (EC,))
        prod = jnp.take(x32, cols_l, axis=0, mode="clip")
        if val_pad is not None:
            vals_l = jax.lax.dynamic_slice(val_pad, (e0,), (EC,))
            prod = prod * vals_l[:, None]
        # edges past this block's end: zero their bound windows via rp_l
        # clip (their rows' [start, end) never reaches them)

        tp = rp_l[jnp.arange(T + 1, dtype=jnp.int32) * R]
        items = _work_items_chunk_major(tp, NCE, T, E)
        out_c = _reduce_call(bounds_start, bounds_end, prod, items,
                             T, R, E, K, split, interpret)
        return out_c[:CR]

    out = jax.lax.map(block_fn, jnp.arange(nblocks, dtype=jnp.int32))
    if block_starts is None:
        return out.reshape(nblocks * CR, K)[:num_rows]
    # disjoint spans: scatter each block's valid rows to its range
    return jnp.zeros((num_rows + 1, K), out.dtype).at[
        out_scatter].set(out.reshape(nblocks * CR, K),
                         mode="drop")[:num_rows]


@functools.partial(jax.jit,
                   static_argnames=("num_rows", "rows_per_chunk",
                                    "edge_capacity", "tile_rows",
                                    "chunk_edges", "split", "interpret",
                                    "nblocks", "raw_windows", "stream"))
def spmm_sddmm_chunked(rowptr_t: jax.Array, row_t: jax.Array,
                       col_t: jax.Array, value_t: jax.Array, g: jax.Array,
                       x: jax.Array, num_rows: int, rows_per_chunk: int,
                       edge_capacity: int, tile_rows: int = 128,
                       chunk_edges: int = 2048, split: bool = True,
                       interpret: bool = False,
                       block_starts: Optional[jax.Array] = None,
                       out_scatter: Optional[jax.Array] = None,
                       nblocks: Optional[int] = None,
                       raw_windows: bool = False,
                       stream: Optional[str] = None):
    """Fused SpMM backward over the CSC (A^T-as-CSR) structure: one pass
    computing BOTH

      d_x[c]    = sum_{e: col[e]=c} value[e] * g[row[e]]     (transpose SpMM)
      dv_t[e']  = g[col_t[e']] . x[row_t[e']]                (SDDMM, CSC order)

    sharing the expensive random gather ``g[col_t]`` between the two
    (the separate formulation gathers three full (nnz, K) row streams; this
    one gathers two, and the ``x[row_t]`` gather only touches the block's
    own contiguous row range).  Returns ``(d_x, dv_t)`` with ``dv_t`` in
    CSC edge order — callers scatter it back through the CSR->CSC
    permutation.  Argument/chunking contract matches
    :func:`spmm_csr_chunked` over the transpose structure.
    """
    R, E = tile_rows, chunk_edges
    CR, EC = rows_per_chunk, edge_capacity
    assert CR % R == 0 and EC % E == 0
    T = CR // R
    NCE = EC // E
    if nblocks is None:
        nblocks = pl.cdiv(num_rows, CR)
    M_pad_total = max(nblocks * CR, num_rows)
    nnz = col_t.shape[0]
    K = g.shape[1]

    rowptr_t = rowptr_t.astype(jnp.int32)
    rowptr_pad = jnp.concatenate(
        [rowptr_t, jnp.full((M_pad_total + 1 - rowptr_t.shape[0],),
                            nnz, jnp.int32)])
    col_pad = jnp.concatenate(
        [col_t.astype(jnp.int32), jnp.zeros((EC,), jnp.int32)])
    row_pad = jnp.concatenate(
        [row_t.astype(jnp.int32), jnp.zeros((EC,), jnp.int32)])
    pdt = _product_dtype(value_t, g, stream)
    g_n = g.astype(pdt)
    x_n = x.astype(pdt)
    val_pad = jnp.concatenate(
        [value_t.astype(pdt), jnp.zeros((EC,), pdt)])

    row_off = jnp.arange(CR + 1, dtype=jnp.int32)

    if block_starts is not None:
        bs = jnp.clip(block_starts.astype(jnp.int32), 0, M_pad_total)

    def block_fn(c):
        if block_starts is None:
            r0 = c * CR
            win_hi = jnp.int32(EC)
        else:
            r0 = bs[c]
            win_hi = jnp.minimum(
                jnp.take(rowptr_pad, bs[c + 1], mode="clip")
                - jnp.take(rowptr_pad, r0, mode="clip"), EC)
        rp_l = jnp.take(rowptr_pad, r0 + row_off, mode="clip")
        e0 = rp_l[0]
        block_nnz = rp_l[CR] - e0
        rp_l = jnp.clip(rp_l - e0, 0, win_hi)
        bounds_start, bounds_end = _row_bounds(rp_l, T, R, EC)

        cols_l = jax.lax.dynamic_slice(col_pad, (e0,), (EC,))
        rows_l = jax.lax.dynamic_slice(row_pad, (e0,), (EC,))
        vals_l = jax.lax.dynamic_slice(val_pad, (e0,), (EC,))
        g_rows = jnp.take(g_n, cols_l, axis=0, mode="clip")  # shared gather
        prod = g_rows * vals_l[:, None]

        tp = rp_l[jnp.arange(T + 1, dtype=jnp.int32) * R]
        items = _work_items_chunk_major(tp, NCE, T, E)
        dx_c = _reduce_call(bounds_start, bounds_end, prod, items,
                            T, R, E, K, split, interpret)[:CR]

        # SDDMM share: x rows of this block only (row_t is sorted, so the
        # window's rows live in [r0, r0+CR) — a contiguous x range)
        x_rows = jnp.take(x_n, rows_l, axis=0, mode="clip")
        dv_c = (g_rows.astype(jnp.float32)
                * x_rows.astype(jnp.float32)).sum(axis=1)
        del block_nnz  # window tails are masked by the caller's paste-back
        return dx_c, dv_c

    dx, dv = jax.lax.map(block_fn, jnp.arange(nblocks, dtype=jnp.int32))
    if block_starts is None:
        d_x = dx.reshape(nblocks * CR, K)[:num_rows]
    else:
        d_x = jnp.zeros((num_rows + 1, K), dx.dtype).at[
            out_scatter].set(dx.reshape(nblocks * CR, K),
                             mode="drop")[:num_rows]
    if raw_windows:
        # caller composes the window->edge mapping at plan time and reads
        # dv with ONE gather instead of two scalar scatter passes; garbage
        # in window tails is never addressed
        return d_x, dv.reshape(-1)

    # paste per-block dv windows back into CSC edge order: window b covers
    # absolute positions [rowptr_t[block_start], +EC) but only its own
    # block_nnz entries are valid (the window tail overlaps the next
    # block); invalid slots route to the drop index so valid writes are
    # unique
    if block_starts is None:
        e0s = rowptr_pad[jnp.arange(nblocks + 1) * CR]
    else:
        e0s = jnp.take(rowptr_pad, bs, mode="clip")
    block_nnz = (e0s[1:] - e0s[:-1])[:, None]
    pos = e0s[:-1, None] + jnp.arange(EC)[None, :]
    flat_pos = jnp.where(jnp.arange(EC)[None, :] < block_nnz, pos,
                         nnz).reshape(-1)
    dv_t = jnp.zeros((nnz,), jnp.float32).at[flat_pos].set(
        dv.reshape(-1), mode="drop")
    return d_x, dv_t


def _band_reduce_kernel(span_ref, row0_ref, nj_ref, bs_ref, be_ref,
                        chunk_ref, out_ref, *, R: int, E: int,
                        BR_pad: int, TMAX: int, split: bool):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # TRANSPOSED selection: edges on sublanes, rows on lanes — the
    # bounds live lane-packed ((rows/128, 128) int32; a (rows, 1) layout
    # wastes 128x of VMEM) and one packed row holds the 128 bounds of a
    # row tile, broadcast down the chunk's edge dimension.
    e_ids_t = jax.lax.broadcasted_iota(jnp.int32, (E, R), 0) + c * E
    p = chunk_ref[:]
    # contract dim 0 of both: sel_t^T @ p on the MXU
    dn = (((0,), (0,)), ((), ()))
    row0 = pl.multiple_of(row0_ref[c], R)
    basep = (span_ref[c] * BR_pad + row0) // R
    for j in range(TMAX):
        @pl.when(j < nj_ref[c])
        def _():
            rloc = pl.multiple_of(row0 + j * R, R)
            st = bs_ref[pl.ds(basep + j, 1), :]      # (1, R) lane-packed
            en = be_ref[pl.ds(basep + j, 1), :]
            sel_t = (e_ids_t >= st) & (e_ids_t < en)   # (E, R)
            if p.dtype == jnp.bfloat16:
                acc = jax.lax.dot_general(
                    sel_t.astype(jnp.bfloat16), p, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
            elif split:
                sel16 = sel_t.astype(jnp.bfloat16)
                hi = p.astype(jnp.bfloat16)
                lo = (p - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                acc = jax.lax.dot_general(
                    sel16, hi, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                acc = acc + jax.lax.dot_general(
                    sel16, lo, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
            else:
                acc = jax.lax.dot_general(
                    sel_t.astype(jnp.float32), p, dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            out_ref[pl.ds(rloc, R), :] += acc


def band_reduce_call(chunk_span, chunk_row0, chunk_nj, bounds_start,
                     bounds_end, stream2d, *, S: int, BR_pad: int,
                     E: int, K: int, R: int = 128, TMAX: int,
                     split: bool = True, interpret: bool = False):
    """Band-resident streaming row reduction.

    The whole output band ((BR_pad, K) f32) and the per-(span, row)
    bounds ((S*BR_pad, 1) x2) stay VMEM-resident for the entire call;
    the grid walks the band's stacked edge-window stream chunk by chunk.
    Each chunk lies inside ONE span (the stream is span-major,
    chunk-aligned) and touches a handful of consecutive row tiles
    (``chunk_row0``/``chunk_nj``, 8-aligned / tile counts).  This kills
    the dominant cost of the per-tile-blocked variant: the ~1.3 us/item
    fixed overhead of tiny per-step bounds/out block DMAs (measured
    r4 — experiments/r4_reduce_cost.py) and the S-fold output
    re-accumulation traffic, since one band pass folds ALL spans.

    ``bounds_start``/``bounds_end`` are lane-packed:
    (S*BR_pad//R, R) int32 — packed row ``(s*BR_pad + r0)//R`` holds the
    bounds of rows ``r0..r0+R`` of span ``s``.

    Requires ``vmem_limit_bytes`` headroom: out band + bounds + chunk
    double-buffers (v5e has 128 MB physical VMEM; the default compiler
    cap is 16 MB)."""
    nchunks = stream2d.shape[0] // E
    vmem = (2 * BR_pad * K * 4 + 2 * S * BR_pad * 4 + 6 * E * K
            * stream2d.dtype.itemsize + (8 << 20))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((S * BR_pad // R, R), lambda c, s, r, n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S * BR_pad // R, R), lambda c, s, r, n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, K), lambda c, s, r, n: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BR_pad, K), lambda c, s, r, n: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_band_reduce_kernel, R=R, E=E,
                               BR_pad=BR_pad, TMAX=TMAX, split=split)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BR_pad, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem), 110 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * nchunks * 2 * R * E * K * (2 if split else 6),
            bytes_accessed=nchunks * E * K * stream2d.dtype.itemsize
            + BR_pad * K * 4 + 2 * S * BR_pad * 4,
            transcendentals=0),
        interpret=interpret,
    )(chunk_span, chunk_row0, chunk_nj, bounds_start, bounds_end,
      stream2d)


def _tilespan_kernel(e0_ref, bst_ref, ben_ref, stream_ref, out_ref,
                     staging, sems, *, S: int, T_B: int, CAP_TS: int,
                     R: int, K: int, split: bool):
    t = pl.program_id(0)

    def issue(tt, slot):
        for s in range(S):
            pltpu.make_async_copy(
                stream_ref.at[pl.ds(
                    pl.multiple_of(e0_ref[tt * S + s], 16), CAP_TS), :],
                staging.at[slot, pl.ds(s * CAP_TS, CAP_TS), :],
                sems.at[slot, s]).start()

    @pl.when(t == 0)
    def _():
        issue(0, 0)

    @pl.when(t + 1 < T_B)
    def _():
        issue(t + 1, (t + 1) % 2)

    slot = t % 2
    for s in range(S):
        pltpu.make_async_copy(
            stream_ref.at[pl.ds(
                pl.multiple_of(e0_ref[t * S + s], 16), CAP_TS), :],
            staging.at[slot, pl.ds(s * CAP_TS, CAP_TS), :],
            sems.at[slot, s]).wait()

    # transposed selection over the staged spans: edges on sublanes,
    # rows on lanes; bounds are staging-relative (plan-precomposed)
    parts = []
    for s in range(S):
        e_ids = (jax.lax.broadcasted_iota(jnp.int32, (CAP_TS, R), 0)
                 + s * CAP_TS)
        st = bst_ref[0, s, :][None, :]
        en = ben_ref[0, s, :][None, :]
        parts.append((e_ids >= st) & (e_ids < en))
    sel_t = jnp.concatenate(parts, axis=0)          # (S*CAP_TS, R)
    p = staging[slot]
    dn = (((0,), (0,)), ((), ()))
    if p.dtype == jnp.bfloat16:
        acc = jax.lax.dot_general(sel_t.astype(jnp.bfloat16), p,
                                  dimension_numbers=dn,
                                  preferred_element_type=jnp.float32)
    elif split:
        sel16 = sel_t.astype(jnp.bfloat16)
        hi = p.astype(jnp.bfloat16)
        lo = (p - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(sel16, hi, dimension_numbers=dn,
                                  preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(sel16, lo, dimension_numbers=dn,
                                        preferred_element_type=jnp.float32)
    else:
        acc = jax.lax.dot_general(sel_t.astype(jnp.float32), p,
                                  dimension_numbers=dn,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
    out_ref[:] = acc


def tilespan_call(e0a, bst, ben, stream2d, *, S: int, T_B: int,
                  CAP_TS: int, K: int, R: int = 128, split: bool = True,
                  interpret: bool = False):
    """Tile-span staging SpMM reduction — one grid step per 128-row
    output tile; ALL S segment spans of that tile are staged into VMEM
    with double-buffered async DMAs, selected with one transposed mask
    and folded in ONE MXU dot.  Each output tile is written exactly once
    (no accumulator traffic, no (chunk, tile) work-item machinery — the
    round-3/4 kernels' measured ~1.3 us/item fixed cost simply has ~40x
    fewer steps to bite; DMA issue measured ~1.1 us/copy and overlaps
    the next tile's compute — experiments/r4_dma_issue.py).

    ``e0a``: (T_B*S,) 16-aligned staged-slice starts into the band
    stream; ``bst``/``ben``: (T_B, S, R) staging-relative row bounds;
    ``stream2d``: the stacked (>= S*cap + CAP_TS, K) product stream
    (stays in HBM).  Returns (T_B*R, K) f32."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T_B,),
        in_specs=[
            pl.BlockSpec((1, S, R), lambda t, e: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, R), lambda t, e: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((R, K), lambda t, e: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, S * CAP_TS, K), stream2d.dtype),
            pltpu.SemaphoreType.DMA((2, S)),
        ])
    kernel = functools.partial(_tilespan_kernel, S=S, T_B=T_B,
                               CAP_TS=CAP_TS, R=R, K=K, split=split)
    vmem = (4 * S * CAP_TS * K * stream2d.dtype.itemsize
            + 2 * S * CAP_TS * R * 2 + (8 << 20))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T_B * R, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem), 100 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * T_B * S * CAP_TS * R * K * (2 if split else 6),
            bytes_accessed=T_B * S * CAP_TS * K
            * stream2d.dtype.itemsize + T_B * R * K * 4,
            transcendentals=0),
        interpret=interpret,
    )(e0a, bst, ben, stream2d)


def sddmm_dot_chunked(row: jax.Array, col: jax.Array, g: jax.Array,
                      x: jax.Array, target_bytes: int = 512 * 1024 * 1024,
                      out_dtype=None) -> jax.Array:
    """Per-edge sampled dot ``out[e] = g[row[e]] . x[col[e]]`` computed in
    bounded edge windows (the value-gradient of SpMM at scales where the
    two gathered (nnz, K) streams cannot be materialized whole)."""
    nnz = row.shape[0]
    K = g.shape[-1]
    edge_chunk = max(1024, target_bytes // (2 * K * 4))
    EC = min(edge_chunk, max(1, nnz))
    nchunks = -(-nnz // EC)
    pad = nchunks * EC - nnz
    row_p = jnp.pad(row, (0, pad))
    col_p = jnp.pad(col, (0, pad))

    def chunk_fn(c):
        e0 = c * EC
        r = jax.lax.dynamic_slice(row_p, (e0,), (EC,))
        cl = jax.lax.dynamic_slice(col_p, (e0,), (EC,))
        gr = jnp.take(g, r, axis=0, mode="clip").astype(jnp.float32)
        xc = jnp.take(x, cl, axis=0, mode="clip").astype(jnp.float32)
        return (gr * xc).sum(axis=1)

    out = jax.lax.map(chunk_fn, jnp.arange(nchunks, dtype=jnp.int32))
    out = out.reshape(nchunks * EC)[:nnz]
    return out.astype(out_dtype or g.dtype)


def spmm_pallas(rowptr: jax.Array, col: jax.Array,
                value: Optional[jax.Array], x: jax.Array,
                row: Optional[jax.Array] = None,
                tile_rows: int = 128, chunk_edges: int = 2048,
                interpret: bool = False,
                stream: Optional[str] = None) -> jax.Array:
    """Full SpMM (sum-reduce): XLA gather/scale + Pallas row reduction.

    Forward only; gradients are wired by ``ops.spmm`` (backward = transpose
    SpMM + an SDDMM for the value grad).
    """
    num_rows = int(rowptr.shape[0]) - 1
    pdt = _product_dtype(value, x, stream)
    # cast BEFORE the gather: the random row gather is the dominant HBM
    # term, so it should read the narrow dtype
    products = jnp.take(x.astype(pdt), col, axis=0, mode="clip")
    if value is not None:
        products = products * value[:, None].astype(pdt)
    out = segment_rows_matmul(products, row, rowptr, num_rows,
                              tile_rows=tile_rows,
                              chunk_edges=chunk_edges,
                              interpret=interpret)
    # uniform dtype contract with ops.spmm (ADVICE r1): outputs follow the
    # promoted input dtype, accumulation stays f32 inside the kernel
    common = x.dtype if value is None else jnp.promote_types(value.dtype,
                                                             x.dtype)
    return out.astype(common)


def _mulreduce_kernel(a_ref, b_ref, out_ref):
    out_ref[:] = (a_ref[:].astype(jnp.float32)
                  * b_ref[:].astype(jnp.float32)).sum(
        axis=1, keepdims=True)


def mul_rowsum_call(a: jax.Array, b: jax.Array, *, chunk: int = 2048,
                    interpret: bool = False) -> jax.Array:
    """Per-row dot of two (L, K) streams -> (L,) f32, streamed through
    VMEM in ``chunk``-row blocks (round 5).

    XLA materializes BOTH f32 upcast streams through HBM when two
    gather outputs meet in an elementwise multiply (+97 ms per 15.3M
    edges measured in experiments/r5_sddmm_micro.py — barrier/fusion
    hints don't change it); this kernel reads each bf16 stream once and
    writes only the (L,) result."""
    import jax.experimental.pallas as pl

    L, K = a.shape
    Lp = -(-L // chunk) * chunk
    if Lp != L:
        pad = jnp.zeros((Lp - L, K), a.dtype)
        a = jnp.concatenate([a, pad])
        b = jnp.concatenate([b, pad.astype(b.dtype)])
    out = pl.pallas_call(
        _mulreduce_kernel,
        grid=(Lp // chunk,),
        in_specs=[pl.BlockSpec((chunk, K), lambda c: (c, 0)),
                  pl.BlockSpec((chunk, K), lambda c: (c, 0))],
        out_specs=pl.BlockSpec((chunk, 1), lambda c: (c, 0)),
        out_shape=jax.ShapeDtypeStruct((Lp, 1), jnp.float32),
        interpret=interpret)(a, b)
    return out[:L, 0]
