"""Benchmark harness: SpMM forward+backward HBM-roofline fraction.

Measures the flagship kernel (CSR/COO SpMM, ogbn-products scale: ~2.45M rows,
~124M nnz, feature dim 64, f32) on the attached accelerator and reports the
fraction of the HBM roofline achieved.  Roofline model (BASELINE.md): bytes
moved = row + col + value + gathered X rows + output, divided by the chip's
HBM bandwidth.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is achieved_fraction / 0.70 (the north-star target).

Env knobs: BENCH_NNZ, BENCH_NODES, BENCH_DIM, BENCH_ITERS.
"""
import json
import os
import time

import jax
import jax.numpy as jnp

# chip HBM bandwidth (GB/s) by device kind
HBM_GBPS = {
    "TPU v2": 700.0,
    "TPU v3": 900.0,
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5": 2765.0,  # v5p
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
    "cpu": 50.0,
}


def device_bandwidth():
    kind = jax.devices()[0].device_kind
    for k, v in HBM_GBPS.items():
        if kind.lower().startswith(k.lower()):
            return v, kind
    return 819.0, kind  # conservative default


def synthetic_graph(num_nodes: int, nnz: int, dim: int, key):
    """Uniform-degree synthetic graph at target scale, generated on-device
    (no host sort needed: rows are arange//deg, already sorted)."""
    deg = nnz // num_nodes
    nnz = deg * num_nodes
    row = (jnp.arange(nnz, dtype=jnp.int32) // deg).astype(jnp.int32)
    kc, kv, kx = jax.random.split(key, 3)
    col = jax.random.randint(kc, (nnz,), 0, num_nodes, dtype=jnp.int32)
    value = jax.random.uniform(kv, (nnz,), jnp.float32)
    x = jax.random.normal(kx, (num_nodes, dim), jnp.float32)
    return row, col, value, x, nnz


def main():
    from paddle_sparse_tpu.ops.spmm import spmm_coo

    num_nodes = int(os.environ.get("BENCH_NODES", 2_449_029))
    nnz = int(os.environ.get("BENCH_NNZ", 123_718_280))
    dim = int(os.environ.get("BENCH_DIM", 64))
    iters = int(os.environ.get("BENCH_ITERS", 10))

    platform = jax.devices()[0].platform
    if platform == "cpu":  # keep CI/dev runs fast
        num_nodes = min(num_nodes, 100_000)
        nnz = min(nnz, 2_000_000)

    key = jax.random.PRNGKey(0)
    row, col, value, x, nnz = synthetic_graph(num_nodes, nnz, dim, key)
    jax.block_until_ready((row, col, value, x))

    @jax.jit
    def fwd(value, x):
        return spmm_coo(row, col, value, x, num_nodes, "sum")

    @jax.jit
    def fwd_bwd(value, x):
        def loss(v, xx):
            return spmm_coo(row, col, v, xx, num_nodes, "sum").sum()
        l, grads = jax.value_and_grad(loss, argnums=(0, 1))(value, x)
        return l, grads

    # warmup / compile
    jax.block_until_ready(fwd(value, x))
    jax.block_until_ready(fwd_bwd(value, x))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(value, x)
    jax.block_until_ready(out)
    fwd_s = (time.perf_counter() - t0) / iters

    t0 = time.perf_counter()
    for _ in range(iters):
        res = fwd_bwd(value, x)
    jax.block_until_ready(res)
    fwdbwd_s = (time.perf_counter() - t0) / iters

    # roofline byte model (BASELINE.md): indices + values + gathered X + out
    idx_bytes = 4
    fwd_bytes = (nnz * idx_bytes * 2          # row + col
                 + nnz * 4                    # value
                 + nnz * dim * 4              # gathered X rows (no reuse)
                 + num_nodes * dim * 4)       # output
    bw_gbps, kind = device_bandwidth()
    roofline_s = fwd_bytes / (bw_gbps * 1e9)
    frac = roofline_s / fwd_s

    result = {
        "metric": "spmm_fwd_roofline_frac",
        "value": round(frac, 4),
        "unit": "fraction_of_hbm_roofline",
        "vs_baseline": round(frac / 0.70, 4),
        "detail": {
            "device": kind,
            "nnz": int(nnz),
            "nodes": int(num_nodes),
            "dim": dim,
            "fwd_ms": round(fwd_s * 1e3, 3),
            "fwd_bwd_ms": round(fwdbwd_s * 1e3, 3),
            "fwd_gbps": round(fwd_bytes / fwd_s / 1e9, 1),
            "nnz_per_s": round(nnz / fwd_s / 1e9, 3),
            "hbm_gbps": bw_gbps,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
