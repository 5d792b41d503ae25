"""Round-5: bisect spspmm_rowsorted's 244 ms/iter at the r4 probe scale
(A@A, 50k nodes, deg 16, 800k nnz -> 12.8M out).

Stages: expansion prep (degB/cumsum/rowE), the (M, F) scatter-max+cummax
a_id grid, the two pair-packed gathers (A-side: (b_off, valA)[a_id];
B-side: (colB, valB)[b_pos]), the batched per-row sort, and the
compression segment ops.  Plus a windowed-gather probe for the B side:
b_pos runs are CONSECUTIVE within an A-edge's fanout, so an (edge,
slice FB) gather needs nnzA issues instead of M*F.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from paddle_sparse_tpu.core import PaddedCOO  # noqa: E402
from paddle_sparse_tpu.core.spgemm import (  # noqa: E402
    _paired_gather, spspmm_rowsorted)
from paddle_sparse_tpu.ops.spspmm import plan_spgemm_rows  # noqa: E402

NODES = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
DEG = int(sys.argv[2]) if len(sys.argv) > 2 else 16
ITERS = 10


def log(m):
    print(f"[{time.perf_counter() - T0:7.1f}s] {m}", flush=True)


T0 = time.perf_counter()


def timed(tag, fn, *args, n=ITERS):
    f = jax.jit(fn, static_argnames=("n",))
    t0 = time.perf_counter()
    float(f(*args, n=n))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(*args, n=n))
    per = (time.perf_counter() - t0) / n
    log(f"{tag:34s} {per * 1e3:9.2f} ms/iter  (compile {c:.1f}s)")
    return per


def main():
    nnz = NODES * DEG

    @jax.jit
    def setup(key):
        row = (jnp.arange(nnz, dtype=jnp.int32) // DEG).astype(jnp.int32)
        kc, kv = jax.random.split(key)
        col = jax.random.randint(kc, (nnz,), 0, NODES, dtype=jnp.int32)
        value = jax.random.uniform(kv, (nnz,), jnp.float32)
        return PaddedCOO.from_arrays(row, col, value,
                                     (NODES, NODES)).coalesce()

    A = setup(jax.random.PRNGKey(1))
    _ = float(A.nnz)
    F, out_cap = plan_spgemm_rows(A, A)
    log(f"nnz={int(A.nnz)} F={F} out_cap={out_cap} grid={NODES * F}")
    M = NODES

    # shared precomputation (mirrors spspmm_rowsorted's prologue)
    rowptrB = A.rowptr()
    validA = A.valid_mask()
    colA = jnp.where(validA, A.col, 0)
    rowA = jnp.where(validA, A.row, M)
    degB = jnp.where(validA, rowptrB[colA + 1] - rowptrB[colA], 0)
    ptrE = jnp.concatenate([jnp.zeros((1,), degB.dtype),
                            jnp.cumsum(degB)])
    row_flops = jax.ops.segment_sum(degB, rowA, num_segments=M + 1,
                                    indices_are_sorted=True)[:M]
    rowE = jnp.concatenate([jnp.zeros((1,), degB.dtype),
                            jnp.cumsum(row_flops)])
    b_off = (rowptrB[colA] - ptrE[:-1]).astype(jnp.int32)

    f_off = jnp.arange(F, dtype=ptrE.dtype)[None, :]
    le = ptrE[:-1] - rowE[jnp.minimum(rowA, M)]
    le = jnp.where((degB > 0) & (le < F), le, F)
    edge_ids = jnp.arange(A.capacity, dtype=jnp.int32)
    a0 = jnp.zeros((M, F), jnp.int32).at[
        jnp.minimum(rowA, M - 1), le].max(edge_ids, mode="drop")
    a_id = jnp.clip(jax.lax.cummax(a0, axis=1), 0, A.capacity - 1)
    gfi = rowE[:-1, None] + f_off
    gfi_c = jnp.minimum(gfi, jnp.maximum(ptrE[-1] - 1, 0))
    valid = f_off < row_flops[:, None]
    jax.block_until_ready((a_id, gfi_c, b_off))

    # --- full op reference ----------------------------------------------
    import dataclasses

    def full_loop(A_, n):
        def body(i, acc):
            z = (acc * 0.0).astype(A_.row.dtype)
            Ai = dataclasses.replace(A_, row=A_.row + z, col=A_.col + z,
                                     value=A_.value + acc * 0.0)
            res = spspmm_rowsorted(Ai, Ai, F, out_cap)
            return jnp.sum(res.matrix.value) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("FULL spspmm_rowsorted", full_loop, A)

    # --- stage: a_id grid build (scatter-max + cummax) -------------------
    def grid_loop(le_, n):
        def body(i, acc):
            lz = le_ + (acc * 0.0).astype(jnp.int32)
            a0_ = jnp.zeros((M, F), jnp.int32).at[
                jnp.minimum(rowA, M - 1), lz].max(edge_ids, mode="drop")
            ai = jax.lax.cummax(a0_, axis=1)
            return jnp.sum(ai).astype(jnp.float32) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("a_id grid (scatter+cummax)", grid_loop, le)

    # --- stage: A-side pair gather ---------------------------------------
    def aside_loop(bo, va, n):
        def body(i, acc):
            boff_g, va_g = _paired_gather(
                bo + (acc * 0.0).astype(jnp.int32), va + acc * 0.0,
                a_id.reshape(-1))
            return (jnp.sum(va_g) + jnp.sum(boff_g).astype(jnp.float32)
                    ) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("A-side pair gather (M*F)", aside_loop, b_off, A.value)

    # --- stage: B-side pair gather ---------------------------------------
    boff_g, _ = _paired_gather(b_off, A.value, a_id.reshape(-1))
    b_pos = jnp.clip(boff_g.reshape(M, F) + gfi_c, 0, A.capacity - 1)
    jax.block_until_ready(b_pos)

    def bside_loop(cb, vb, n):
        def body(i, acc):
            colb_g, vb_g = _paired_gather(
                cb + (acc * 0.0).astype(jnp.int32), vb + acc * 0.0,
                b_pos.reshape(-1))
            return (jnp.sum(vb_g) + jnp.sum(colb_g).astype(jnp.float32)
                    ) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("B-side pair gather (M*F)", bside_loop, A.col, A.value)

    # --- stage: batched per-row sort -------------------------------------
    key0 = jnp.where(valid, jnp.take(
        A.col, b_pos.reshape(-1), mode="clip").reshape(M, F),
        NODES).astype(jnp.int32)
    prod0 = jnp.where(valid, 1.0, 0.0)
    jax.block_until_ready((key0, prod0))

    def sort_loop(k0, p0, n):
        def body(i, acc):
            k, p = jax.lax.sort((k0 + (acc * 0.0).astype(jnp.int32),
                                 p0 + acc * 0.0), dimension=1,
                                num_keys=1)
            return (jnp.sum(p) + jnp.sum(k).astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("batched sort (M, F)", sort_loop, key0, prod0)

    # --- stage: compression segment ops ---------------------------------
    key_s = jnp.sort(key0, axis=1)
    jax.block_until_ready(key_s)

    def comp_loop(ks, p0, n):
        def body(i, acc):
            k = ks + (acc * 0.0).astype(jnp.int32)
            first2d = (k < NODES) & jnp.concatenate(
                [jnp.ones((M, 1), bool), k[:, 1:] != k[:, :-1]], axis=1)
            first = first2d.reshape(-1)
            seg = jnp.cumsum(first) - 1
            seg_cl = jnp.clip(seg, 0, out_cap)
            v = jax.ops.segment_sum(
                (p0 + acc * 0.0).reshape(-1), seg_cl,
                num_segments=out_cap + 1,
                indices_are_sorted=True)[:out_cap]
            return jnp.sum(v) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("compress (cumsum+segsum)", comp_loop, key_s, prod0)

    # --- probe: B-side WINDOWED gather (nnzA issues, FB-wide slices) ----
    FB = int(jnp.max(degB))
    FBr = max(8, -(-FB // 8) * 8)
    pairs = jnp.stack([A.col, jax.lax.bitcast_convert_type(
        A.value, jnp.int32)], axis=1)              # (capA, 2)
    starts = rowptrB[colA].astype(jnp.int32)       # (capA,)
    jax.block_until_ready((pairs, starts))
    log(f"windowed B gather: FB={FB} (padded {FBr}), issues={int(A.nnz)}"
        f" vs {M * F}")

    def bwin_loop(pr, st, n):
        def body(i, acc):
            idx = jnp.clip(st + (acc * 0.0).astype(jnp.int32), 0,
                           pr.shape[0] - 1)
            # one gather: per A-edge, an (FBr, 2) window of B pairs
            win = jax.vmap(
                lambda s: jax.lax.dynamic_slice(pr, (s, 0), (FBr, 2))
            )(idx)
            return (jnp.sum(win[..., 1]).astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("B-side windowed (nnzA, FB)", bwin_loop, pairs, starts)


if __name__ == "__main__":
    main()
