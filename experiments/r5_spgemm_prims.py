"""Round-5: verify the three SpGEMM primitive replacements before the
kernel rewrite.

MEASURED (TPU v5e, 800k-nnz A, 12.8M flops): 1-D cumsum 5.9 ms / 2-D
minor+offsets 3.0 ms; sorted segment_sum 114.9 ms (~9 ns/elem);
windowed lax.gather 1063 ms (pathological — closes that formulation);
A-side scatter-diff + 2-D cumsum 10.7 ms, equality True after chaining
diffs through the previous KEPT edge (adopted:
core/spgemm.py::_expand_holds_last).  Verification also surfaced a TPU
scatter-ADD emitter bug: with a drop-sentinel index column present
(.at[r, le].add(d, mode="drop"), le == F on an (M, F+1) grid) the
IN-RANGE updates are silently mis-summed at this scale — scatter-MAX
with the same index pattern is unaffected.  Workaround everywhere:
mask dropped VALUES to zero and keep indices in range.

1. global 1-D cumsum over the (M*F) stream (measured inside compress:
   ~100 ms) vs 2-D minor-axis cumsum + per-row offset (mathematically
   identical for row-major grids).
2. the A-side expansion as scatter-at-run-starts + minor-axis cumsum of
   DIFFS (addition is invertible; holds-last via prefix sums) vs the
   58 ms pair gather.
3. a true lax.gather windowed B fetch: (nnzA, FB, 2) windows at
   rowptrB[colA] — nnzA issues instead of M*F (the vmap(dynamic_slice)
   formulation measured 1069 ms; this tests the primitive directly).
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from paddle_sparse_tpu.core import PaddedCOO  # noqa: E402

NODES = 50_000
DEG = 16
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
    log(f"{tag:40s} {per * 1e3:9.2f} ms/iter  (compile {c:.1f}s)")
    return per


def main():
    nnz = NODES * DEG
    M, F = NODES, 256

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
    key2d = jax.random.randint(jax.random.PRNGKey(3), (M, F), 0, 2
                               ).astype(jnp.bool_)
    jax.block_until_ready(key2d)

    # 1 --- global cumsum vs 2-D minor-axis + row offsets ---------------
    def cum_global(k2, n):
        def body(i, acc):
            first = k2 ^ (acc != acc)          # chain
            seg = jnp.cumsum(first.reshape(-1).astype(jnp.int32))
            return (seg[-1].astype(jnp.float32)) * 1e-9 + acc * 0
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("cumsum 1-D (12.8M)", cum_global, key2d)

    def cum_2d(k2, n):
        def body(i, acc):
            first = k2 ^ (acc != acc)
            local = jnp.cumsum(first.astype(jnp.int32), axis=1)
            offs = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32),
                 jnp.cumsum(local[:, -1]).astype(jnp.int32)[:-1]])
            seg = local + offs[:, None]
            return (seg[-1, -1].astype(jnp.float32)) * 1e-9 + acc * 0
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("cumsum 2-D minor + row offset", cum_2d, key2d)

    # equality check
    first = key2d
    a = jnp.cumsum(first.reshape(-1).astype(jnp.int32)).reshape(M, F)
    local = jnp.cumsum(first.astype(jnp.int32), axis=1)
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(local[:, -1]).astype(jnp.int32)[:-1]])
    log(f"2-D == 1-D cumsum: {bool(jnp.all(a == local + offs[:, None]))}")

    # 2 --- segment ops alone (sorted) ----------------------------------
    seg_flat = (a - 1).reshape(-1)
    prod = jnp.ones((M * F,), jnp.float32)
    out_cap = M * F
    jax.block_until_ready((seg_flat, prod))

    def segsum(p, n):
        def body(i, acc):
            v = jax.ops.segment_sum(p + acc * 0.0,
                                    jnp.clip(seg_flat, 0, out_cap),
                                    num_segments=out_cap + 1,
                                    indices_are_sorted=True)
            return (jnp.sum(v) * 1e-12).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("segment_sum alone (12.8M)", segsum, prod)

    # 3 --- windowed lax.gather of B pair windows -----------------------
    FB = 16
    pairs = jnp.stack([A.col.astype(jnp.int32),
                       jax.lax.bitcast_convert_type(
                           A.value, jnp.int32)], axis=1)
    rowptrB = A.rowptr()
    colA = jnp.clip(A.col, 0, M - 1)
    starts = jnp.clip(rowptrB[colA], 0,
                      pairs.shape[0] - FB).astype(jnp.int32)[:, None]
    jax.block_until_ready((pairs, starts))
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0,))

    def bwin(pr, st, n):
        def body(i, acc):
            win = jax.lax.gather(
                pr, st + (acc * 0.0).astype(jnp.int32)[None, None] * 0
                + st * 0 + st,
                dn, slice_sizes=(FB, 2), mode="clip")
            return (jnp.sum(win[..., 1]).astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    # simpler chaining: add acc-derived zero to starts
    def bwin2(pr, st, n):
        def body(i, acc):
            stc = st + (acc * 0.0).astype(jnp.int32)
            win = jax.lax.gather(pr, stc, dn, slice_sizes=(FB, 2),
                                 mode="clip")
            return (jnp.sum(win[..., 1]).astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed(f"lax.gather windows ({nnz} x {FB} x 2)", bwin2, pairs, starts)

    # 4 --- A-side via scatter-diff + minor-axis cumsum -----------------
    # reconstruct b_off[a_id] on the (M, F) grid: scatter diffs at run
    # starts, cumsum along F
    validA = A.valid_mask()
    colA_m = jnp.where(validA, A.col, 0)
    degB = jnp.where(validA, rowptrB[colA_m + 1] - rowptrB[colA_m], 0)
    ptrE = jnp.concatenate([jnp.zeros((1,), degB.dtype),
                            jnp.cumsum(degB)])
    rowA = jnp.where(validA, A.row, M)
    row_flops = jax.ops.segment_sum(degB, rowA, num_segments=M + 1,
                                    indices_are_sorted=True)[:M]
    rowE = jnp.concatenate([jnp.zeros((1,), degB.dtype),
                            jnp.cumsum(row_flops)])
    b_off = (rowptrB[colA_m] - ptrE[:-1]).astype(jnp.int32)
    le = (ptrE[:-1] - rowE[jnp.minimum(rowA, M)]).astype(jnp.int32)
    le_ok = (degB > 0) & (le < F)
    # diff vs the previous KEPT edge in the same row: zero-fanout edges
    # occupy no grid slot, so chaining through them loses their diff
    # (the first run of this probe failed equality exactly here).  The
    # previous kept edge is a global cummax over tagged edge ids (cheap:
    # nnzA elements), with a row-crossing guard falling back to the
    # absolute b_off.
    nE = b_off.shape[0]
    eidx = jnp.arange(nE, dtype=jnp.int32)
    tag = jnp.where(le_ok, eidx, -1)
    prev_kept = jax.lax.cummax(
        jnp.concatenate([jnp.full((1,), -1, jnp.int32), tag[:-1]]))
    pk_cl = jnp.clip(prev_kept, 0, nE - 1)
    same_row = (prev_kept >= 0) & (rowA[pk_cl] == rowA)
    # masked-value scatter, indices kept IN range: the drop-column form
    # (.at[r, le_cl].add(d, mode="drop") with le_cl == F sentinels on an
    # (M, F+1) grid) triggers the TPU emitter bug documented above
    d_boff = jnp.where(le_ok,
                       jnp.where(same_row, b_off - b_off[pk_cl], b_off),
                       0)
    r_idx = jnp.minimum(rowA, M - 1)
    le_cl = jnp.where(le_ok, le, 0)
    jax.block_until_ready((d_boff, r_idx, le_cl))

    def aside_diff(db, n):
        def body(i, acc):
            dbc = db + (acc * 0.0).astype(jnp.int32)
            g0 = jnp.zeros((M, F), jnp.int32).at[r_idx, le_cl].add(dbc)
            boff_grid = jnp.cumsum(g0, axis=1)
            return (jnp.sum(boff_grid).astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    timed("A-side scatter-diff + 2-D cumsum", aside_diff, d_boff)

    # correctness vs gather
    from paddle_sparse_tpu.core.spgemm import _paired_gather
    f_off = jnp.arange(F, dtype=jnp.int32)[None, :]
    le_full = jnp.where(le_ok, le, F)
    edge_ids = jnp.arange(A.capacity, dtype=jnp.int32)
    a0 = jnp.zeros((M, F), jnp.int32).at[
        jnp.minimum(rowA, M - 1), le_full].max(edge_ids, mode="drop")
    a_id = jnp.clip(jax.lax.cummax(a0, axis=1), 0, A.capacity - 1)
    want = b_off[a_id]
    g0 = jnp.zeros((M, F), jnp.int32).at[r_idx, le_cl].add(d_boff)
    got = jnp.cumsum(g0, axis=1)
    valid2d = f_off < row_flops[:, None]
    same = jnp.where(valid2d, want == got, True)
    log(f"A-side diff reconstruction == gather: {bool(jnp.all(same))}")


if __name__ == "__main__":
    main()
