"""Row-sharded FLAGSHIP SpMM under ``shard_map`` (VERDICT r3 item 2).

Round 3's distributed kernels called ``spmm_coo`` with shard_map-traced
indices, so the planned (chunked/segmented) Pallas drivers — which need
concrete indices at plan time — were unreachable and the multi-chip path
silently ran the slow fallbacks.  This module fixes that the TPU-native
way: the per-shard plans are built ON HOST from the concrete sharded
structure (``jax.vmap`` of the seg2 phase builders over the device
axis), the static geometry is made UNIFORM across shards (max over
devices), and the stacked :class:`Seg2Structure` leaves are sharded over
the mesh — inside ``shard_map`` every device runs the exact same
:func:`ops.spmm_seg2.spmm_seg2` kernel it runs single-chip.

Strategy: 1-D row sharding with one ``all_gather`` of the dense operand
over ICI (the halo/ring variants in ``parallel/spmm.py`` remain
available for bandwidth-bound regimes).  Differentiable in
``(packed_value, x)``: the all-gather transposes to a
``psum_scatter``.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.spmm_seg2 import (_interpret_mode,
                             Seg2Plan, Seg2Structure, _build_fwd,
                             _build_t, _flat_geom, _pick_sr, _relays,
                             _window_counts, spmm_seg2)
from .spmm import RowShardedMatrix


class ShardedSeg2(NamedTuple):
    """Uniform-static plan + device-stacked structure (leading axis D)."""
    plan: Seg2Plan
    structure: Seg2Structure


def make_seg2_plan_sharded(mat: RowShardedMatrix, *, feat_dim: int,
                           stream=None, chunk_edges: int = 512,
                           sr=None,
                           window_bytes: int = None) -> ShardedSeg2:
    """Build per-shard seg2 plans with shard-uniform static geometry.

    Local row space per shard = ``rows_per_shard + 1`` (the extra dead
    row absorbs padding, exactly as the single-chip padded contract).
    Capacities (EC/ECW/CRW and transpose twins) take the max over
    shards, so one static plan serves every device."""
    import functools

    from ..ops.spmm_seg2 import WINDOW_BYTES, make_seg2_plan  # noqa: F401
    from ..ops.kernels.spmm_pallas import _stream_env

    window_bytes = window_bytes or WINDOW_BYTES
    stream = stream or _stream_env()
    stream_bytes = 2 if stream == "bf16" else 4

    D = int(mat.row.shape[0])
    M_local = mat.rows_per_shard + 1
    N = mat.shape[1]
    E = chunk_edges

    def cdiv(a, b):
        return -(-a // b)

    def rnd(v, m):
        return max(m, cdiv(int(v), m) * m)

    SR = sr or _pick_sr(N, feat_dim, stream_bytes)
    # non-pow2 SR makes seg = col >> lg2(SR) drop edges silently
    # (ADVICE r4) — mirror make_seg2_plan's guard
    assert SR & (SR - 1) == 0, "segment size must be a power of two"
    S = max(1, cdiv(N, SR))
    SR_t = sr or _pick_sr(M_local, feat_dim, stream_bytes)
    assert SR_t & (SR_t - 1) == 0, "segment size must be a power of two"
    S_t = max(1, cdiv(M_local, SR_t))

    rows = jnp.asarray(mat.row, jnp.int32)
    # padding cols are N (one past the end): clamp into the last segment
    # — their values are zero and their rows are the dead row, so they
    # contribute nothing either way
    cols = jnp.clip(jnp.asarray(mat.col, jnp.int32), 0, N - 1)

    bf = jax.vmap(functools.partial(_build_fwd, S=S, SR=SR, M=M_local,
                                    N=N))
    order_f, col_f, rp_f, sbase_f, max_f, ok = bf(rows, cols)
    if not bool(ok.all()):
        raise ValueError("sharded rows must be locally sorted ascending")
    bt = jax.vmap(functools.partial(_build_t, S_t=S_t, SR_t=SR_t,
                                    M=M_local, N=N))
    perm_t, col_t, rp_t, sbase_t, xrow_t, max_t = bt(rows, cols)

    # flattened edge-balanced windows (round 5), shard-uniform NW = max
    # over shards; a shard's surplus windows alias its last segment past
    # its end and no-op
    win_edges = max(E, window_bytes // max(1, feat_dim * stream_bytes))

    def fit_ecw(max_seg):
        # fit the largest segment with equal windows (see
        # ops.spmm_seg2.make_seg2_plan — fixed ECW leaves ceil slack)
        max_seg = max(int(max_seg), 1)
        return rnd(cdiv(max_seg, cdiv(max_seg, win_edges)), E)

    ECW = fit_ecw(max_f.max())
    ECW_t = fit_ecw(max_t.max())
    wc_f = jax.vmap(functools.partial(_window_counts, ECW=ECW))(rp_f)
    wc_t = jax.vmap(functools.partial(_window_counts, ECW=ECW_t))(rp_t)
    W = max(1, int(wc_f.sum(axis=1).max()))
    W_t = max(1, int(wc_t.sum(axis=1).max()))
    seg_of_f, wptr_f, rlo_f, span_f = jax.vmap(
        functools.partial(_flat_geom, ECW=ECW, NW=W, M=M_local))(
        rp_f, wc_f)
    seg_of_t, wptr_t, rlo_t, span_t = jax.vmap(
        functools.partial(_flat_geom, ECW=ECW_t, NW=W_t, M=N))(
        rp_t, wc_t)
    CRW = rnd(int(span_f.max()), 128)
    CRW_t = rnd(int(span_t.max()), 128)

    # SDDMM (d_value) pass geometry — shard-uniform, as above
    from ..ops.spmm_seg2 import FAST_SRC_BYTES
    fast_rows = max(128, FAST_SRC_BYTES // max(1, feat_dim
                                               * stream_bytes))
    ECW_s = ECW
    while True:
        wc_s = jax.vmap(
            functools.partial(_window_counts, ECW=ECW_s))(rp_f)
        W_s = max(1, int(wc_s.sum(axis=1).max()))
        seg_of_s, wptr_s, rlo_s, span_s = jax.vmap(
            functools.partial(_flat_geom, ECW=ECW_s, NW=W_s,
                              M=M_local))(rp_f, wc_s)
        if int(span_s.max()) <= fast_rows or ECW_s <= 65536:
            break
        ECW_s = rnd(cdiv(ECW_s, 2), E)
    if int(span_s.max()) <= 2 * fast_rows:
        CRW_s = rnd(int(span_s.max()), 128)
    else:                                      # global-gather fallback
        W_s, ECW_s, CRW_s = W, ECW, 0
        seg_of_s, wptr_s, rlo_s = seg_of_f, wptr_f, rlo_f

    relay_ft = jax.vmap(_relays)(order_f, perm_t)
    row_f = jnp.take_along_axis(rows, order_f, axis=1)

    plan = Seg2Plan(M_local, N, S, SR, W, ECW, CRW, S_t, SR_t, W_t,
                    ECW_t, CRW_t, chunk=E,
                    interpret=_interpret_mode(),
                    stream=stream, W_s=W_s, ECW_s=ECW_s, CRW_s=CRW_s)
    structure = Seg2Structure(
        col_f=col_f, rp_f=rp_f, perm_f=order_f, sbase_f=sbase_f,
        rlo_f=rlo_f, col_t=col_t, rp_t=rp_t, sbase_t=sbase_t,
        rlo_t=rlo_t, relay_ft=relay_ft, row_f=row_f, rlo_s=rlo_s,
        seg_of_f=seg_of_f, wptr_f=wptr_f, seg_of_t=seg_of_t,
        wptr_t=wptr_t, seg_of_s=seg_of_s, wptr_s=wptr_s)
    return ShardedSeg2(plan=plan, structure=structure)


def pack_values_sharded(sharded: ShardedSeg2,
                        value: jax.Array) -> jax.Array:
    """(D, C) COO-ordered per-shard values -> the fwd packed layout."""
    return jnp.take_along_axis(value, sharded.structure.perm_f, axis=1)


def device_put_sharded_seg2(mesh: Mesh, sharded: ShardedSeg2,
                            axis_name: str = "x") -> ShardedSeg2:
    """Lay every structure leaf's device axis over the mesh."""
    def put(leaf):
        spec = P(axis_name, *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return ShardedSeg2(
        plan=sharded.plan,
        structure=jax.tree_util.tree_map(put, sharded.structure))


def spmm_seg2_allgather(mesh: Mesh, sharded: ShardedSeg2,
                        packed_value, x: jax.Array,
                        axis_name: str = "x") -> jax.Array:
    """Flagship distributed SpMM: all-gather x over ICI, then the exact
    single-chip seg2 Pallas path per shard.  ``x`` is row-sharded
    (N/D, K); returns row-sharded output blocks (D, rows_per_shard, K).

    Differentiable in ``(packed_value, x)``."""
    plan = sharded.plan
    rows_per = plan.num_rows - 1

    spec_struct = jax.tree_util.tree_map(
        lambda a: P(axis_name, *([None] * (a.ndim - 1))),
        sharded.structure)
    spec_blk = P(axis_name, None)
    spec3 = P(axis_name, None, None)

    if packed_value is not None:
        def kernel(struct, pv, x_local):
            local = jax.tree_util.tree_map(lambda a: a[0], struct)
            x_full = jax.lax.all_gather(x_local, axis_name, axis=0,
                                        tiled=True)
            out = spmm_seg2(plan, local, pv[0], x_full)
            return out[None, :rows_per]   # drop the padding dead row

        # check_vma=False: the Pallas call inside cannot declare
        # varying-mesh-axes metadata on its out_shape
        fn = shard_map(kernel, mesh=mesh,
                       in_specs=(spec_struct, spec_blk, spec_blk),
                       out_specs=spec3, check_vma=False)
        return fn(sharded.structure, packed_value, x)

    def kernel_nv(struct, x_local):
        local = jax.tree_util.tree_map(lambda a: a[0], struct)
        x_full = jax.lax.all_gather(x_local, axis_name, axis=0,
                                    tiled=True)
        out = spmm_seg2(plan, local, None, x_full)
        return out[None, :rows_per]

    fn = shard_map(kernel_nv, mesh=mesh,
                   in_specs=(spec_struct, spec_blk),
                   out_specs=spec3, check_vma=False)
    return fn(sharded.structure, x)


# ---------------------------------------------------------------------------
# seg2 x halo interchange (round 5, VERDICT r4 item 5): the fast Pallas
# flagship under the DEDUPLICATED all_to_all halo exchange — the
# interchange the repo's own at-target scaling model rates far above
# all-gather at pod scale (BENCH_r04: D=256 efficiency_at_target 0.36
# vs 0.071).  The halo plan's remapped (local row, halo-buffer col)
# grid is exactly a RowShardedMatrix over an N = D*H column space, so
# the per-shard seg2 planner applies unchanged.
# ---------------------------------------------------------------------------
def make_seg2_halo_plan(halo_mat, *, feat_dim: int, stream=None,
                        chunk_edges: int = 512, sr=None,
                        window_bytes: int = None) -> ShardedSeg2:
    """Per-shard seg2 plans over a :class:`~.spmm.HaloShardedMatrix`'s
    halo-buffer column space (N = D * halo_per_src)."""
    D = int(halo_mat.row.shape[0])
    facade = RowShardedMatrix(
        row=halo_mat.row, col=halo_mat.col, value=halo_mat.value,
        nnz=None, shape=(halo_mat.shape[0], D * halo_mat.halo_per_src),
        rows_per_shard=halo_mat.rows_per_shard)
    return make_seg2_plan_sharded(facade, feat_dim=feat_dim,
                                  stream=stream, chunk_edges=chunk_edges,
                                  sr=sr, window_bytes=window_bytes)


def spmm_seg2_halo(mesh: Mesh, halo_mat, sharded: ShardedSeg2,
                   packed_value, x: jax.Array,
                   axis_name: str = "x") -> jax.Array:
    """Distributed SpMM: all_to_all of exactly the deduplicated halo
    rows (O(unique cols * K) interchange), then the exact single-chip
    seg2 Pallas path per shard over the received halo buffer.

    ``x`` is row-sharded (N/D, K); returns row-sharded output blocks
    (D, rows_per_shard, K).  Differentiable in ``(packed_value, x)``
    (all_to_all and take have transposes)."""
    plan = sharded.plan
    rows_per = plan.num_rows - 1

    spec_struct = jax.tree_util.tree_map(
        lambda a: P(axis_name, *([None] * (a.ndim - 1))),
        sharded.structure)
    spec_blk = P(axis_name, None)
    spec3 = P(axis_name, None, None)

    def kernel(struct, send_idx, pv, x_local):
        local = jax.tree_util.tree_map(lambda a: a[0], struct)
        x_send = jnp.take(x_local, send_idx[0], axis=0, mode="clip")
        halo = jax.lax.all_to_all(x_send, axis_name, split_axis=0,
                                  concat_axis=0, tiled=False)
        halo = halo.reshape(-1, x_local.shape[-1])        # (D*H, K)
        out = spmm_seg2(plan, local, pv[0] if pv is not None else None,
                        halo)
        return out[None, :rows_per]

    if packed_value is not None:
        fn = shard_map(kernel, mesh=mesh,
                       in_specs=(spec_struct, spec3, spec_blk, spec_blk),
                       out_specs=spec3, check_vma=False)
        return fn(sharded.structure, halo_mat.send_idx, packed_value, x)

    def kernel_nv(struct, send_idx, x_local):
        return kernel(struct, send_idx, None, x_local)

    fn = shard_map(kernel_nv, mesh=mesh,
                   in_specs=(spec_struct, spec3, spec_blk),
                   out_specs=spec3, check_vma=False)
    return fn(sharded.structure, halo_mat.send_idx, x)
