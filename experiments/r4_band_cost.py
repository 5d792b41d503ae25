"""Isolate band_reduce_call cost per grid step and test kernel variants.

Usage: python experiments/r4_band_cost.py
"""
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from paddle_sparse_tpu.ops.kernels import spmm_pallas as sp

S = 19
BAND = 28672
BR_pad = BAND + 128
E = 512
K = 256
R = 128
CAP = 77824          # edges per (band, seg) window
TMAX = 4
ITERS = 20


def main():
    ncs = CAP // E
    nchunks = S * ncs
    kc, kv = jax.random.split(jax.random.PRNGKey(0))
    stream = jax.random.normal(kv, (S * CAP, K), jnp.bfloat16)
    # uniform window: each (seg) window covers the whole band evenly
    deg = CAP / BAND
    loc = jnp.clip((jnp.arange(BAND + 1) * deg).astype(jnp.int32), 0,
                   CAP)
    offs = (jnp.arange(S, dtype=jnp.int32) * CAP)[:, None]
    padv = jnp.broadcast_to(loc[-1:], (S, 128))
    lb = jnp.broadcast_to(loc[None, :], (S, BAND + 1))
    bst = (jnp.concatenate([lb[:, :-1], padv], axis=1)
           + offs).reshape(-1, R)
    ben = (jnp.concatenate([lb[:, 1:], padv], axis=1)
           + offs).reshape(-1, R)
    q = jnp.arange(ncs, dtype=jnp.int32) * E
    r_lo = jnp.clip(jnp.searchsorted(loc, q, side="right") - 1, 0,
                    BAND - 1)
    r_hi = jnp.clip(jnp.searchsorted(loc, jnp.minimum(q + E, loc[-1]),
                                     side="left") - 1, 0, BAND - 1)
    r0 = (r_lo // 128) * 128
    nj = jnp.clip(-(-(jnp.maximum(r_hi, r_lo) - r0 + 1) // R), 0, TMAX)
    chunk_span = jnp.repeat(jnp.arange(S, dtype=jnp.int32), ncs)
    chunk_row0 = jnp.tile(r0, (S,)).astype(jnp.int32)
    chunk_nj = jnp.tile(nj, (S,)).astype(jnp.int32)
    jax.block_until_ready((stream, bst, ben))

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(stream, bst, ben, cs, cr, cn, n):
        def body(i, acc):
            st = stream + (acc * 0).astype(stream.dtype)
            out = sp.band_reduce_call(
                cs, cr, cn, bst, ben, st, S=S, BR_pad=BR_pad, E=E, K=K,
                R=R, TMAX=TMAX, split=True, interpret=False)
            return (jnp.sum(out) * 1e-12).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    t0 = time.perf_counter()
    float(loop(stream, bst, ben, chunk_span, chunk_row0, chunk_nj,
               n=ITERS))
    cs_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(stream, bst, ben, chunk_span, chunk_row0, chunk_nj,
               n=ITERS))
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({
        "case": f"band_reduce E={E} nchunks={nchunks}",
        "ms": round(dt * 1e3, 3),
        "us_per_step": round(dt / nchunks * 1e6, 3),
        "edges_per_s_M": round(S * CAP / dt / 1e6, 1),
        "compile_s": round(cs_t, 1)}), flush=True)


if __name__ == "__main__":
    main()


def variants():
    """Bisect per-step cost: no-dot, no-sel, empty-body, and the
    untransposed-sel orientation."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ncs = CAP // E
    nchunks = S * ncs
    kc, kv = jax.random.split(jax.random.PRNGKey(0))
    stream = jax.random.normal(kv, (S * CAP, K), jnp.bfloat16)
    deg = CAP / BAND
    loc = jnp.clip((jnp.arange(BAND + 1) * deg).astype(jnp.int32), 0, CAP)
    offs = (jnp.arange(S, dtype=jnp.int32) * CAP)[:, None]
    padv = jnp.broadcast_to(loc[-1:], (S, 128))
    lb = jnp.broadcast_to(loc[None, :], (S, BAND + 1))
    bst = (jnp.concatenate([lb[:, :-1], padv], axis=1) + offs).reshape(-1, R)
    ben = (jnp.concatenate([lb[:, 1:], padv], axis=1) + offs).reshape(-1, R)
    q = jnp.arange(ncs, dtype=jnp.int32) * E
    r_lo = jnp.clip(jnp.searchsorted(loc, q, side="right") - 1, 0, BAND - 1)
    r_hi = jnp.clip(jnp.searchsorted(loc, jnp.minimum(q + E, loc[-1]),
                                     side="left") - 1, 0, BAND - 1)
    r0 = (r_lo // 128) * 128
    nj = jnp.clip(-(-(jnp.maximum(r_hi, r_lo) - r0 + 1) // R), 0, TMAX)
    cs_ = jnp.repeat(jnp.arange(S, dtype=jnp.int32), ncs)
    cr_ = jnp.tile(r0, (S,)).astype(jnp.int32)
    cn_ = jnp.tile(nj, (S,)).astype(jnp.int32)
    jax.block_until_ready((stream, bst, ben))

    def make_call(kernel):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3, grid=(nchunks,),
            in_specs=[
                pl.BlockSpec((S * BR_pad // R, R), lambda c, s, r, n: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S * BR_pad // R, R), lambda c, s, r, n: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E, K), lambda c, s, r, n: (c, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BR_pad, K), lambda c, s, r, n: (0, 0),
                                   memory_space=pltpu.VMEM))
        def call(cs, cr, cn, bst, ben, st):
            return pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((BR_pad, K), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 << 20),
            )(cs, cr, cn, bst, ben, st)
        return call

    def timed(name, call):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(stream, bst, ben, n):
            def body(i, acc):
                st = stream + (acc * 0).astype(stream.dtype)
                out = call(cs_, cr_, cn_, bst, ben, st)
                return (jnp.sum(out) * 1e-12).astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        try:
            float(loop(stream, bst, ben, n=ITERS))
            t0 = time.perf_counter()
            float(loop(stream, bst, ben, n=ITERS))
            dt = (time.perf_counter() - t0) / ITERS
            print(json.dumps({"case": name, "ms": round(dt * 1e3, 2),
                              "us_per_step": round(dt / nchunks * 1e6, 2)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"case": name, "error": str(e)[:150]}),
                  flush=True)

    dn_t = (((0,), (0,)), ((), ()))

    def k_full(s_r, r_r, n_r, bs, be, ch, out):
        c = pl.program_id(0)
        @pl.when(c == 0)
        def _():
            out[:] = jnp.zeros_like(out)
        e_ids = jax.lax.broadcasted_iota(jnp.int32, (E, R), 0) + c * E
        p = ch[:]
        row0 = pl.multiple_of(r_r[c], R)
        basep = (s_r[c] * BR_pad + row0) // R
        for j in range(TMAX):
            @pl.when(j < n_r[c])
            def _():
                st = bs[pl.ds(basep + j, 1), :]
                en = be[pl.ds(basep + j, 1), :]
                sel = (e_ids >= st) & (e_ids < en)
                acc = jax.lax.dot_general(sel.astype(jnp.bfloat16), p,
                                          dimension_numbers=dn_t,
                                          preferred_element_type=jnp.float32)
                out[pl.ds(pl.multiple_of(row0 + j * R, R), R), :] += acc

    def k_nodot(s_r, r_r, n_r, bs, be, ch, out):
        c = pl.program_id(0)
        @pl.when(c == 0)
        def _():
            out[:] = jnp.zeros_like(out)
        e_ids = jax.lax.broadcasted_iota(jnp.int32, (E, R), 0) + c * E
        row0 = pl.multiple_of(r_r[c], R)
        basep = (s_r[c] * BR_pad + row0) // R
        for j in range(TMAX):
            @pl.when(j < n_r[c])
            def _():
                st = bs[pl.ds(basep + j, 1), :]
                en = be[pl.ds(basep + j, 1), :]
                sel = (e_ids >= st) & (e_ids < en)
                out[pl.ds(pl.multiple_of(row0 + j * R, R), R), :] += (
                    jnp.broadcast_to(
                        jnp.sum(sel.astype(jnp.float32), axis=0,
                                keepdims=True).reshape(1, R)[:, :1],
                        (R, K)))

    def k_nosel(s_r, r_r, n_r, bs, be, ch, out):
        c = pl.program_id(0)
        @pl.when(c == 0)
        def _():
            out[:] = jnp.zeros_like(out)
        p = ch[:]
        row0 = pl.multiple_of(r_r[c], R)
        for j in range(TMAX):
            @pl.when(j < n_r[c])
            def _():
                acc = jax.lax.dot_general(
                    jnp.ones((E, R), jnp.bfloat16), p,
                    dimension_numbers=dn_t,
                    preferred_element_type=jnp.float32)
                out[pl.ds(pl.multiple_of(row0 + j * R, R), R), :] += acc

    def k_empty(s_r, r_r, n_r, bs, be, ch, out):
        c = pl.program_id(0)
        @pl.when(c == 0)
        def _():
            out[:] = jnp.zeros_like(out)
        row0 = pl.multiple_of(r_r[c], R)
        for j in range(TMAX):
            @pl.when(j < n_r[c])
            def _():
                out[pl.ds(pl.multiple_of(row0 + j * R, R), R), :] += (
                    ch[:R, :].astype(jnp.float32))

    def k_untrans(s_r, r_r, n_r, bs, be, ch, out):
        # sel in (R, E) orientation; bounds transposed per j (1,R)->(R,1)
        c = pl.program_id(0)
        @pl.when(c == 0)
        def _():
            out[:] = jnp.zeros_like(out)
        e_ids = jax.lax.broadcasted_iota(jnp.int32, (R, E), 1) + c * E
        p = ch[:]
        dn = (((1,), (0,)), ((), ()))
        row0 = pl.multiple_of(r_r[c], R)
        basep = (s_r[c] * BR_pad + row0) // R
        for j in range(TMAX):
            @pl.when(j < n_r[c])
            def _():
                st = bs[pl.ds(basep + j, 1), :].reshape(R, 1)
                en = be[pl.ds(basep + j, 1), :].reshape(R, 1)
                sel = (e_ids >= st) & (e_ids < en)
                acc = jax.lax.dot_general(sel.astype(jnp.bfloat16), p,
                                          dimension_numbers=dn,
                                          preferred_element_type=jnp.float32)
                out[pl.ds(pl.multiple_of(row0 + j * R, R), R), :] += acc

    for name, k in (("full(transposed sel)", k_full),
                    ("no-dot", k_nodot),
                    ("no-sel(const)", k_nosel),
                    ("empty-body", k_empty),
                    ("untransposed sel+reshape", k_untrans)):
        timed(name, make_call(k))


if __name__ == "__main__" and os.environ.get("VARIANTS"):
    variants()
