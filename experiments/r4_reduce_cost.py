"""Cost of one _reduce_call at full-scale sub-window geometry, isolated
from the gather: is the in-situ overhead in the kernel/acc path?

Usage: python experiments/r4_reduce_cost.py [E] [ECW] [CRW]
"""
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from paddle_sparse_tpu.ops.kernels.spmm_pallas import (
    _reduce_call, _row_bounds, _work_items_chunk_major)

E = int(sys.argv[1]) if len(sys.argv) > 1 else 512
ECW = int(sys.argv[2]) if len(sys.argv) > 2 else 937472
CRW = int(sys.argv[3]) if len(sys.argv) > 3 else 511616
R = 128
K = 256
M = 2_449_029
NW = 16
ITERS = 3


def main():
    T = CRW // R
    buf_tiles = -(-M // R) + T + 1
    kc, kv = jax.random.split(jax.random.PRNGKey(0))
    prod = jax.random.normal(kv, (ECW, K), jnp.bfloat16)
    # realistic uniform rowptr over the window's rows
    deg = ECW / (CRW * 0.9)
    rp = jnp.clip((jnp.arange(CRW + 1) * deg).astype(jnp.int32), 0, ECW)
    _ = float(prod[0, 0].astype(jnp.float32))

    @functools.partial(jax.jit, static_argnames=("n", "use_acc"))
    def loop(prod, rp, n, use_acc=True):
        arange_tp = jnp.arange(T + 1, dtype=jnp.int32) * R

        def body(i, carry):
            out, acc_s = carry
            rp_l = jnp.clip(rp + (acc_s * 0).astype(jnp.int32), 0, ECW)
            bs, be = _row_bounds(rp_l, T, R, ECW)
            tp = rp_l[arange_tp]
            items = _work_items_chunk_major(tp, ECW // E, T, E)
            p = prod + (acc_s * 0).astype(prod.dtype)
            r0 = (i * CRW) % (M - CRW - 256)
            r0 = ((r0 // R) * R).astype(jnp.int32)
            if use_acc:
                out = _reduce_call(bs, be, p, items, T, R, E, K,
                                   split=True, interpret=False,
                                   acc=out, tile_base=(r0 // R)[None])
                chk = out[0, 0]
            else:
                part = _reduce_call(bs, be, p, items, T, R, E, K,
                                    split=True, interpret=False)
                chk = part[0, 0]
            return out, (acc_s + chk * 1e-12).astype(jnp.float32)

        out0 = jnp.zeros((buf_tiles * R, K), jnp.float32)
        out, acc_s = jax.lax.fori_loop(0, NW, body,
                                       (out0, jnp.float32(0)))
        return jnp.sum(out[:1]) + acc_s

    for use_acc in (True, False):
        t0 = time.perf_counter()
        float(loop(prod, rp, n=None, use_acc=use_acc))
        cs = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(prod, rp, n=None, use_acc=use_acc))
        dt = (time.perf_counter() - t0)
        per_win = dt / NW
        print(json.dumps({
            "case": f"reduce acc={use_acc} E={E}",
            "ms_per_window": round(per_win * 1e3, 3),
            "edges_per_s_M": round(ECW / per_win / 1e6, 1),
            "items": ECW // E + T + 1,
            "compile_s": round(cs, 1)}), flush=True)


if __name__ == "__main__":
    main()
