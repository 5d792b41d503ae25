"""Pallas TPU kernel: monotone-segment stream compaction for SpGEMM.

The ESC compress step takes the per-row-sorted multiplication stream and
must (a) sum each run of equal (row, col) coordinates and (b) write the
run sums/coordinates PACKED at their global output slots.  XLA's only
primitives for that ragged move are the scatter/segment emitter
(measured ~9 ns/element: one sorted ``segment_sum`` over a 12.8M-element
stream is 115 ms — ``experiments/r5_spgemm_prims.py``) or a gather from
precomputed slot positions (~4.6 ns/row, and computing the positions
costs the same scatter).  Both are issue-bound, not bandwidth-bound: the
stream itself is ~51 MB, ~0.2 ms of DMA.

This kernel streams the flat stream in chunks of ``E`` elements and
exploits the one property the XLA emitters cannot: because segment ids
are GLOBALLY MONOTONE (the stream is sorted), chunk ``c``'s output slots
are the contiguous range ``[seg[cE], seg[(c+1)E])`` of width <= E.  Each
grid step therefore:

1. builds the chunk's one-hot compaction matrix ``sel[o, e] =
   (seg[e] - seg[cE] == o)`` (exact in bf16),
2. reduces values and run-end coordinates with ONE MXU matmul
   ``packed @ sel^T`` — values ride as a Dekker hi/lo bf16 pair
   (~f32-accurate, the flagship SpMM's scheme), coordinates as three
   8-bit bf16 limbs (EXACT for ids < 2**24),
3. DMAs the packed (4, E) result to the output at element offset
   ``seg[cE]`` — a run that straddles a chunk boundary is finished by a
   scalar carry in SMEM (grid steps run sequentially), and the boundary
   slot is simply overwritten by the later chunk's complete value.

The reference has no SpGEMM kernel of its own (it binds paddle's; the
hash-map intent is /root/reference/csrc/cpu/utils.h:4); the functional
contract is /root/reference/README.md:301-327.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _segcompact_kernel(base_ref, segl_ref, prod_ref, coord_ref, out_ref,
                       scr, head, carry_ref, sem, sem_h, *, E: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[0] = 0.0
        carry_ref[1] = 0.0
        carry_ref[2] = 0.0

    base = base_ref[i]
    w = base_ref[i + 1] - base            # segments CLOSED in this chunk
    # DMA lane offsets must be 128-aligned: write at the aligned base
    # and shift the one-hot instead; the first 128 lanes are merged with
    # the current output contents (the previous chunk's finished slots
    # live below ``base`` in the same aligned window).
    b_al = pl.multiple_of((base // 128) * 128, 128)
    shift = base - b_al
    cph = pltpu.make_async_copy(out_ref.at[:, pl.ds(b_al, 128)], head,
                                sem_h)
    cph.start()                 # waited just before the merge below

    segl = segl_ref[0:1, :]               # (1, E) local ids in [0, E)

    # one-hot compaction matrix: output slot o collects stream elements
    # with local segment id o - shift.  Exact in bf16 (0/1 entries).
    o_iota = jax.lax.broadcasted_iota(jnp.int32, (E + 128, E), 0)
    sel = (o_iota == (segl + shift)).astype(jnp.bfloat16)

    # Dekker hi/lo value split via BIT masking: the float form
    # ``x - bf16(x)`` is folded to zero by the XLA simplifier (verified
    # under jit — the lo term vanishes and sums degrade to bf16), and
    # interpret-mode kernels trace into the caller's jit.  Truncating
    # the low mantissa bits with integer ops is opaque to the
    # simplifier and the hi part stays exactly bf16-representable.
    pf = prod_ref[0:1, :]                                # (1, E) f32
    hi_f = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(pf, jnp.int32)
        & jnp.int32(-65536), jnp.float32)
    phi = hi_f.astype(jnp.bfloat16)                      # exact
    plo = (pf - hi_f).astype(jnp.bfloat16)
    # rows: [val_hi, val_lo, r_h, r_m, r_l, c_h, c_m, c_l]
    p = jnp.concatenate([phi, plo, coord_ref[:]], axis=0)  # (8, E) bf16
    res = jax.lax.dot_general(
        p, sel, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (8, E + 128)

    # carries for the segment OPEN across the chunk boundary: its value
    # partials span chunks, and its run-end COORDS may live entirely in
    # an earlier chunk (trailing pad elements can push the boundary past
    # the last valid element) — all three follow sum semantics, so each
    # chunk adds its share and exactly one chunk contributes the coords.
    cv, cr, cc = carry_ref[0], carry_ref[1], carry_ref[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, E + 128), 1)
    open_lane = (lane == shift)           # slot ``base`` in this window
    val = (res[0:1, :] + res[1:2, :]
           + jnp.where(open_lane, cv, 0.0))          # (1, E + 128)
    rowv = (res[2:3, :] * 65536.0 + res[3:4, :] * 256.0 + res[4:5, :]
            + jnp.where(open_lane, cr, 0.0))
    colv = (res[5:6, :] * 65536.0 + res[6:7, :] * 256.0 + res[7:8, :]
            + jnp.where(open_lane, cc, 0.0))

    # per-element f32 reconstructions for the open segment (segl == w);
    # empty when the chunk closes E segments (segl < E == w never hits).
    open_m = segl == w
    keep = jnp.where(w == 0, 1.0, 0.0)
    pv = pf[0:1, :]
    pr = (p[2:3, :].astype(jnp.float32) * 65536.0
          + p[3:4, :].astype(jnp.float32) * 256.0
          + p[4:5, :].astype(jnp.float32))
    pc = (p[5:6, :].astype(jnp.float32) * 65536.0
          + p[6:7, :].astype(jnp.float32) * 256.0
          + p[7:8, :].astype(jnp.float32))
    carry_ref[0] = jnp.sum(jnp.where(open_m, pv, 0.0)) + keep * cv
    carry_ref[1] = jnp.sum(jnp.where(open_m, pr, 0.0)) + keep * cr
    carry_ref[2] = jnp.sum(jnp.where(open_m, pc, 0.0)) + keep * cc

    row = rowv.astype(jnp.int32)
    col = colv.astype(jnp.int32)
    bits = jax.lax.bitcast_convert_type(val, jnp.int32)

    # lanes below ``shift`` belong to earlier chunks' finished slots
    cph.wait()
    protect = lane < shift
    hpad = jnp.zeros((1, E), jnp.int32)
    scr[0:1, :] = jnp.where(
        protect, jnp.concatenate([head[0:1, :], hpad], axis=1), row)
    scr[1:2, :] = jnp.where(
        protect, jnp.concatenate([head[1:2, :], hpad], axis=1), col)
    scr[2:3, :] = jnp.where(
        protect, jnp.concatenate([head[2:3, :], hpad], axis=1), bits)
    scr[3:4, :] = jnp.zeros((1, E + 128), jnp.int32)

    cp = pltpu.make_async_copy(scr, out_ref.at[:, pl.ds(b_al, E + 128)],
                               sem)
    cp.start()
    cp.wait()


def segcompact_call(base_ext: jax.Array, segl: jax.Array,
                    prod: jax.Array, coords: jax.Array,
                    out_capacity: int, *, E: int,
                    interpret: bool = False) -> jax.Array:
    """Run the compaction kernel over ``nchunks = segl.shape[0]`` chunks.

    ``base_ext``: (nchunks + 1,) int32, ``base_ext[c] = seg[c*E]``
    clamped to ``[0, out_capacity]`` with the final entry = total unique
    count (same clamp).  ``segl``: (1, nchunks*E) int32 chunk-local ids
    ``seg - seg[c*E]`` (UNclamped bases — always in [0, E)).
    ``prod``: (1, nchunks*E) f32 element values (pads zeroed).
    Row-vector layouts: Mosaic requires the sublane block dim to equal
    the array dim, so per-chunk slices advance along the LANE axis.
    ``coords``: (6, nchunks*E) bf16 run-end coordinate limbs
    [r_h, r_m, r_l, c_h, c_m, c_l] (zero except at run ends).

    Returns (4, out_capacity + E + 128) int32: rows 0/1 the ids,
    row 2 the f32 run-sum bits.  Slots at index >= the true unique count
    are GARBAGE (spill region / boundary overwrites past the final
    base) — the caller masks by its own count.
    """
    nchunks = segl.shape[1] // E
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((1, E), lambda c, b: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda c, b: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, E), lambda c, b: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, E + 128), jnp.int32),
            pltpu.VMEM((4, 128), jnp.int32),
            pltpu.SMEM((3,), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ])
    kernel = functools.partial(_segcompact_kernel, E=E)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, out_capacity + E + 128),
                                       jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20),
        cost_estimate=pl.CostEstimate(
            flops=2 * nchunks * E * E * 8,
            bytes_accessed=nchunks * E * (4 + 4 + 12 + 16),
            transcendentals=0),
        interpret=interpret,
    )(base_ext, segl, prod, coords)


def compact_sorted_stream(key2d: jax.Array, prod2d: jax.Array,
                          row_of_grid_row: jax.Array, N: int,
                          out_capacity: int, *, E: int = 1024,
                          interpret: bool = False):
    """Compress a per-row-sorted (M, F) coordinate grid into packed COO.

    ``key2d``: column ids sorted ascending within each row, pads == N.
    ``prod2d``: products with pads already zeroed.  ``row_of_grid_row``:
    (M,) the output row id of each grid row (``arange(M)`` for the
    monolithic path, ``r0 + arange(MB)`` for a row block).

    Returns ``(rowC, colC, valC, unique_count)`` — UNMASKED: slots at
    index >= min(unique_count, out_capacity) hold garbage; the caller
    applies its own sentinel masking (it already does for the segment-op
    path).  All coordinate ids must be < 2**24 (three 8-bit bf16 limbs).
    """
    M, F = key2d.shape
    L = M * F
    Lp = -(-L // E) * E

    valid = (key2d < N).reshape(-1)
    key_f = key2d.reshape(-1)
    prod_f = prod2d.reshape(-1)
    row_f = jnp.repeat(row_of_grid_row.astype(jnp.int32), F,
                       total_repeat_length=L)

    nxt_valid = jnp.concatenate([valid[1:], jnp.zeros((1,), jnp.bool_)])
    nxt_key = jnp.concatenate([key_f[1:], key_f[:1]])
    nxt_row = jnp.concatenate([row_f[1:], row_f[:1]])
    first = valid & jnp.concatenate([
        jnp.ones((1,), jnp.bool_),
        (key_f[1:] != key_f[:-1]) | (row_f[1:] != row_f[:-1])
        | ~valid[:-1]])
    last = valid & (~nxt_valid | (nxt_key != key_f) | (nxt_row != row_f))
    seg = jnp.maximum(jnp.cumsum(first.astype(jnp.int32)) - 1, 0)
    unique_count = jnp.sum(first.astype(jnp.int32))

    pad = Lp - L
    if pad:
        seg = jnp.concatenate([seg, jnp.broadcast_to(seg[-1:], (pad,))])
        prod_f = jnp.concatenate([prod_f,
                                  jnp.zeros((pad,), prod_f.dtype)])
        last = jnp.concatenate([last, jnp.zeros((pad,), jnp.bool_)])
        row_f = jnp.concatenate([row_f, jnp.zeros((pad,), jnp.int32)])
        key_f = jnp.concatenate([key_f,
                                 jnp.zeros((pad,), key_f.dtype)])

    nchunks = Lp // E
    base = seg[::E]
    base_ext = jnp.clip(
        jnp.concatenate([base, unique_count[None]]),
        0, out_capacity).astype(jnp.int32)
    segl = (seg - jnp.repeat(base, E, total_repeat_length=Lp)
            ).astype(jnp.int32).reshape(1, Lp)

    pf32 = prod_f.astype(jnp.float32).reshape(1, Lp)
    rm = jnp.where(last, row_f, 0).astype(jnp.int32)
    cm = jnp.where(last, key_f.astype(jnp.int32), 0)

    def limbs(x):
        return ((x >> 16).astype(jnp.bfloat16),
                ((x >> 8) & 255).astype(jnp.bfloat16),
                (x & 255).astype(jnp.bfloat16))

    coords = jnp.stack([*limbs(rm), *limbs(cm)], axis=0)

    out = segcompact_call(base_ext, segl, pf32, coords, out_capacity,
                          E=E, interpret=interpret)
    rowC = out[0, :out_capacity]
    colC = out[1, :out_capacity]
    valC = jax.lax.bitcast_convert_type(out[2, :out_capacity],
                                        jnp.float32)
    return rowC, colC, valC, unique_count


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def compact_runs(N, out_capacity, E, interpret, key2d, prod2d,
                 row_of_grid_row):
    """Differentiable wrapper of :func:`compact_sorted_stream`: the
    kernel itself (bitcasts + DMAs) has no VJP, but the math is a
    segment sum, so the value cotangent is one gather —
    ``d_prod[e] = ct_valC[seg[e]]`` — over the monotone segment ids."""
    return compact_sorted_stream(key2d, prod2d, row_of_grid_row, N,
                                 out_capacity, E=E, interpret=interpret)


def _compact_runs_fwd(N, out_capacity, E, interpret, key2d, prod2d,
                      row_of_grid_row):
    out = compact_runs(N, out_capacity, E, interpret, key2d, prod2d,
                       row_of_grid_row)
    return out, (key2d, row_of_grid_row)


def _compact_runs_bwd(N, out_capacity, E, interpret, res, cts):
    import numpy as np
    key2d, row_of_grid_row = res
    _, _, ct_val, _ = cts
    M, F = key2d.shape
    valid = (key2d < N).reshape(-1)
    key_f = key2d.reshape(-1)
    row_f = jnp.repeat(row_of_grid_row.astype(jnp.int32), F,
                       total_repeat_length=M * F)
    first = valid & jnp.concatenate([
        jnp.ones((1,), jnp.bool_),
        (key_f[1:] != key_f[:-1]) | (row_f[1:] != row_f[:-1])
        | ~valid[:-1]])
    seg = jnp.maximum(jnp.cumsum(first.astype(jnp.int32)) - 1, 0)
    in_cap = valid & (seg < out_capacity)
    d_prod = jnp.where(
        in_cap,
        jnp.take(ct_val, jnp.clip(seg, 0, out_capacity - 1),
                 mode="clip"),
        0.0).reshape(M, F)
    z = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    return (z(key2d), d_prod, z(row_of_grid_row))


compact_runs.defvjp(_compact_runs_fwd, _compact_runs_bwd)
