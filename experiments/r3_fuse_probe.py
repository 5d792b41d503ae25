"""Round-3 fusion probe: which SpMM formulation minimizes HBM traffic?

Uniform-degree graph at BENCH scale 0.0625 (153k rows, 7.65M nnz, K=256,
f32).  Each case is timed with the bench's fori-loop-chained methodology
(warm-up compiles the same executable as the timed call).  Prints one JSON
line per case so a timeout still leaves partial evidence.

Cases:
  gather        materialized take(x, col)          -> pure gather BW ceiling
  reshape1      (take(x,col).reshape(M,D,K)*v).sum(1) single shot
  unroll1       sum_i v[:,i,None]*take(x, col2d[:,i]) single shot
  reshape_blk   lax.map over row blocks of reshape1
  unroll_blk    lax.map over row blocks of unroll1
  pallas        current segment_rows_matmul path
"""
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SCALE = float(os.environ.get("PROBE_SCALE", 0.0625))
M = max(1024, int(2_449_029 * SCALE))
DEG = 50
K = int(os.environ.get("PROBE_K", 256))
NNZ = M * DEG
ITERS = int(os.environ.get("PROBE_ITERS", 10))
BLOCK = int(os.environ.get("PROBE_BLOCK", 16384))
ONLY = os.environ.get("PROBE_ONLY", "").split(",") if os.environ.get(
    "PROBE_ONLY") else None

key = jax.random.PRNGKey(0)
kc, kv, kx = jax.random.split(key, 3)
col = jax.random.randint(kc, (NNZ,), 0, M, dtype=jnp.int32)
value = jax.random.uniform(kv, (NNZ,), jnp.float32)
x = jax.random.normal(kx, (M, K), jnp.float32)
row = (jnp.arange(NNZ, dtype=jnp.int32) // DEG)
col2d = col.reshape(M, DEG)
v2d = value.reshape(M, DEG)
colT = col2d.T.copy()   # (DEG, M): slot-major — contiguous per-slot rows
vT = v2d.T.copy()
jax.block_until_ready((col, value, x, col2d, v2d, colT, vT))

# roofline bytes for full spmm; gather-only case overrides
SPMM_BYTES = NNZ * 4 * 2 + NNZ * K * 4 + M * K * 4
HBM = 819e9


def timed(name, fn, args, nbytes):
    t0 = time.perf_counter()

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(a, n):
        def body(i, acc):
            out = fn(*a, acc)
            return out.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    try:
        float(loop(args, n=ITERS))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(args, n=ITERS))
        dt = (time.perf_counter() - t0) / ITERS
        print(json.dumps({"case": name, "ms": round(dt * 1e3, 2),
                          "gbps": round(nbytes / dt / 1e9, 1),
                          "frac": round(nbytes / dt / HBM, 4),
                          "compile_s": round(compile_s, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": name,
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)


def case_gather(c, v, xx, acc):
    return jnp.take(xx + acc, c, axis=0)


def case_reshape1(c2, v2, xx, acc):
    vv = v2 + acc * 0.0
    return (jnp.take(xx, c2.reshape(-1), axis=0).reshape(M, DEG, K)
            * vv[:, :, None]).sum(axis=1)


def case_unroll1(c2, v2, xx, acc):
    vv = v2 + acc * 0.0
    out = jnp.zeros((M, K), jnp.float32)
    for i in range(DEG):
        out = out + jnp.take(xx, c2[:, i], axis=0) * vv[:, i, None]
    return out


def case_unrollT(cT, vt, xx, acc):
    vv = vt + acc * 0.0
    out = jnp.zeros((M, K), jnp.float32)
    for i in range(DEG):
        out = out + jnp.take(xx, cT[i], axis=0) * vv[i][:, None]
    return out


def _blocked(inner):
    nb = M // BLOCK

    def f(c2, v2, xx, acc):
        vv = v2 + acc * 0.0

        def blk(b):
            c = jax.lax.dynamic_slice(c2, (b * BLOCK, 0), (BLOCK, DEG))
            v = jax.lax.dynamic_slice(vv, (b * BLOCK, 0), (BLOCK, DEG))
            return inner(c, v, xx)
        out = jax.lax.map(blk, jnp.arange(nb, dtype=jnp.int32))
        return out.reshape(nb * BLOCK, K)
    return f


def _inner_reshape(c, v, xx):
    return (jnp.take(xx, c.reshape(-1), axis=0).reshape(BLOCK, DEG, K)
            * v[:, :, None]).sum(axis=1)


def _inner_unroll(c, v, xx):
    out = jnp.zeros((BLOCK, K), jnp.float32)
    for i in range(DEG):
        out = out + jnp.take(xx, c[:, i], axis=0) * v[:, i, None]
    return out


def case_pallas(r, c, v, xx, acc):
    from paddle_sparse_tpu.ops.convert import ind2ptr
    from paddle_sparse_tpu.ops.kernels.spmm_pallas import \
        segment_rows_matmul
    vv = v + acc * 0.0
    rowptr = ind2ptr(r, M)
    products = jnp.take(xx, c, axis=0) * vv[:, None]
    return segment_rows_matmul(products, None, rowptr, M)


CASES = {
    "gather": (case_gather, (col, value, x),
               NNZ * 4 + NNZ * K * 4 * 2),
    "reshape1": (case_reshape1, (col2d, v2d, x), SPMM_BYTES),
    "unroll1": (case_unroll1, (col2d, v2d, x), SPMM_BYTES),
    "unrollT": (case_unrollT, (colT, vT, x), SPMM_BYTES),
    "reshape_blk": (_blocked(_inner_reshape), (col2d, v2d, x), SPMM_BYTES),
    "unroll_blk": (_blocked(_inner_unroll), (col2d, v2d, x), SPMM_BYTES),
    "pallas": (case_pallas, (row, col, value, x), SPMM_BYTES),
}

print(json.dumps({"config": {"M": M, "NNZ": NNZ, "K": K, "deg": DEG,
                             "block": BLOCK, "iters": ITERS,
                             "device": jax.devices()[0].device_kind}}),
      flush=True)
for name, (fn, args, nbytes) in CASES.items():
    if ONLY and name not in ONLY:
        continue
    timed(name, fn, args, nbytes)
