"""Round-3 SELL-v2 structure hunt: which program structure makes XLA emit
the FUSED multi-gather sum with a real (materialized) output?

Findings so far (TPU v5e, this round):
  * fused gather-sum consumed down to a scalar (jnp.sum) reads at
    200-416 GB/s — the hardware random-row-read rate;
  * the same body with the (B, K) array as the jit OUTPUT compiles fast
    (~9 s) to an UNFUSED program (~75 GB/s: every take materialized);
  * one fori-wrapped variant compiled for 124 s and ran 2.7x faster,
    suggesting the fused-output emit exists behind a slow compile path;
  * any lax.map / multi-block loop breaks the fusion outright.

Each case runs in THIS process (drive with run_one.sh-style subprocess per
case and a generous timeout — killing a compile mid-flight wedges the
shared remote compile service).  Timing: standalone jit whose output IS
the (B, K) block (cannot be DCE'd), chained across calls through a
broadcast scalar, forced once at the end by a host read.

Usage: python experiments/r3_sell2.py CASE [B] [NB]
Cases: plain | fori1 | chunk8 | take2d | scan1
"""
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

CASE = sys.argv[1] if len(sys.argv) > 1 else "plain"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
NB = int(sys.argv[3]) if len(sys.argv) > 3 else 18
MSRC = int(os.environ.get("SELL2_SRC", 2_449_029))
DEG = 50
K = 256

kc, kv, kx = jax.random.split(jax.random.PRNGKey(0), 3)
col3 = jax.random.randint(kc, (NB, B, DEG), 0, MSRC, dtype=jnp.int32)
v3 = jax.random.uniform(kv, (NB, B, DEG), jnp.float32)
x = jax.random.normal(kx, (MSRC, K), jnp.float32)
_ = float(x[0, 0])
T0 = time.perf_counter()


def log(m):
    print(f"[{time.perf_counter() - T0:7.1f}s] {m}", flush=True)


def unrolled(c, v, xx):
    o = jnp.zeros((B, K), jnp.float32)
    for g in range(DEG):
        o = o + jnp.take(xx, c[:, g], axis=0) * v[:, g, None]
    return o


if CASE == "plain":
    def block(c, v, xx, chain):
        return unrolled(c, v + chain * 0.0, xx)
elif CASE == "fori1":
    # n=1 loop whose CARRY is the output block: loops went through the
    # slow-but-good compile path in earlier probes
    def block(c, v, xx, chain):
        vv = v + chain * 0.0
        return jax.lax.fori_loop(
            0, 1, lambda i, o: unrolled(c, vv, xx),
            jnp.zeros((B, K), jnp.float32))
elif CASE == "chunk8":
    # fori over 8-gather chunks with an explicit (B, K) accumulator:
    # bounded unfused damage (acc rw per step) even if fusion fails
    G_CHUNK = 10

    def block(c, v, xx, chain):
        vv = v + chain * 0.0

        def step(s, acc):
            cc = jax.lax.dynamic_slice(c, (0, s * G_CHUNK), (B, G_CHUNK))
            vs = jax.lax.dynamic_slice(vv, (0, s * G_CHUNK), (B, G_CHUNK))
            for g in range(G_CHUNK):
                acc = acc + jnp.take(xx, cc[:, g], axis=0) * vs[:, g, None]
            return acc
        return jax.lax.fori_loop(0, DEG // G_CHUNK, step,
                                 jnp.zeros((B, K), jnp.float32))
elif CASE == "take2d":
    def block(c, v, xx, chain):
        vv = v + chain * 0.0
        return (jnp.take(xx, c, axis=0) * vv[:, :, None]).sum(axis=1)
elif CASE == "cast16":
    # bf16-cast root: a real consumer between the add-chain and the
    # output buffer (and halves the output write)
    def block(c, v, xx, chain):
        return unrolled(c, v + chain * 0.0, xx).astype(jnp.bfloat16)
elif CASE == "carryloop":
    # exact replica of the one structure measured FUSED at 34 ms/block
    # (t_src: fori whose carry is the (B, K) block), but returning the
    # full carry so the result is honest/materialized
    N_INNER = int(os.environ.get("SELL2_INNER", 2))

    def block(c, v, xx, chain):
        def body(i, out_prev):
            vv = v + (chain + out_prev[0, 0] * 0.0) * 0.0
            return unrolled(c, vv, xx)
        return jax.lax.fori_loop(0, N_INNER, body,
                                 jnp.zeros((B, K), jnp.float32))
elif CASE == "scan1":
    def block(c, v, xx, chain):
        vv = v + chain * 0.0
        o, _ = jax.lax.scan(
            lambda carry, _: (unrolled(c, vv, xx), None),
            jnp.zeros((B, K), jnp.float32), None, length=1)
        return o
else:
    raise SystemExit(f"unknown case {CASE}")

block_j = jax.jit(block)

t0 = time.perf_counter()
o = block_j(col3[0], v3[0], x, jnp.float32(0))
c0 = float(o[0, 0])
compile_s = time.perf_counter() - t0
log(f"{CASE}: compiled + first block ({compile_s:.1f}s)")


def chain_run(iters):
    chain = jnp.float32(0)
    for _ in range(iters):
        for b in range(NB):
            o = block_j(col3[b], v3[b], x, chain)
            chain = o[0, 0]
    return chain


c0 = float(chain_run(1))
log("warm chain done")
ITERS = 3
t0 = time.perf_counter()
c0 = float(chain_run(ITERS))
dt = (time.perf_counter() - t0) / ITERS
nnz = NB * B * DEG
nbytes = nnz * 8 + nnz * K * 4 + NB * B * K * 4
print(json.dumps({"case": CASE, "B": B, "NB": NB,
                  "compile_s": round(compile_s, 1),
                  "ms": round(dt * 1e3, 2),
                  "ms_per_blk": round(dt * 1e3 / NB, 2),
                  "gbps": round(nbytes / dt / 1e9, 1),
                  "frac": round(nbytes / dt / 819e9, 4)}), flush=True)
