"""On-chip microbenchmarks that drive the round-2 SpMM redesign.

Measures, at mid scale (8M edges, 245k nodes):
  copy      — stream copy bandwidth ceiling
  gather    — raw row gather take(x, col) at K=256 (and K=64)
  fuse8     — gather * value -> reshape(-1, 8, K) -> sum(axis=1):
              if XLA fuses the gather into the reduce, traffic is
              ~(gather-read + out/8) instead of 3x — the design bet
  segsum    — jax.ops.segment_sum (sorted) full SpMM
  reduce    — Pallas segment_rows_matmul on a PRE-materialized product
              stream (isolates the kernel's consumption rate)
  e2e_pal   — current pallas backend end to end

Each probe times n iterations INSIDE one jit (fori_loop, scalar chaining),
warmed with the same static n.  Prints one JSON line per probe with GB/s
against the probe's own useful-traffic model.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

NNZ = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
NODES = int(sys.argv[2]) if len(sys.argv) > 2 else 245_000
K = int(sys.argv[3]) if len(sys.argv) > 3 else 256
ITERS = 5


def timed(name, fn, args, bytes_model, iters=ITERS):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(args, n):
        def body(i, acc):
            out = fn(args, acc)
            return out.astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    t0 = time.perf_counter()
    float(loop(args, n=iters))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(args, n=iters))
    per = (time.perf_counter() - t0) / iters
    print(json.dumps({"probe": name, "ms": round(per * 1e3, 2),
                      "GBps": round(bytes_model / per / 1e9, 1),
                      "model_GB": round(bytes_model / 1e9, 2),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return per


def main():
    deg = NNZ // NODES
    nnz = deg * NODES
    key = jax.random.PRNGKey(0)
    kc, kv, kx = jax.random.split(key, 3)
    row = (jnp.arange(nnz, dtype=jnp.int32) // deg).astype(jnp.int32)
    col = jax.random.randint(kc, (nnz,), 0, NODES, dtype=jnp.int32)
    value = jax.random.uniform(kv, (nnz,), jnp.float32)
    x = jax.random.normal(kx, (NODES, K), jnp.float32)
    jax.block_until_ready((row, col, value, x))
    print(json.dumps({"nnz": nnz, "nodes": NODES, "K": K,
                      "dev": jax.devices()[0].device_kind}), flush=True)

    which = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

    def want(n):
        return which is None or n in which

    if want("copy"):
        big = jax.random.normal(key, (nnz // 8, K), jnp.float32)
        timed("copy", lambda a, acc: (a[0] + acc)[0, 0], (big,),
              2 * big.size * 4)
        del big

    if want("gather"):
        timed("gather", lambda a, acc: jnp.take(
            a[1], a[0] + (acc == 12345).astype(jnp.int32), axis=0,
            mode="clip")[0, 0],
            (col, x), nnz * (K * 4 + 4) + nnz * K * 4)  # read + write out

    if want("fuse8"):
        def fuse8(a, acc):
            c, v, xx = a
            p = jnp.take(xx, c, axis=0, mode="clip") * (
                v + acc * 0.0)[:, None]
            return jnp.sum(p.reshape(-1, 8, K), axis=1)[0, 0]
        # traffic model IF fused: read x rows + col + value + write nnz/8
        timed("fuse8", fuse8, (col, value, x),
              nnz * (K * 4 + 8) + nnz // 8 * K * 4)

    if want("fuse16"):
        def fuse16(a, acc):
            c, v, xx = a
            p = jnp.take(xx, c, axis=0, mode="clip") * (
                v + acc * 0.0)[:, None]
            return jnp.sum(p.reshape(-1, 16, K), axis=1)[0, 0]
        timed("fuse16", fuse16, (col, value, x),
              nnz * (K * 4 + 8) + nnz // 16 * K * 4)

    if want("fuse64"):
        def fuse64(a, acc):
            c, v, xx = a
            p = jnp.take(xx, c, axis=0, mode="clip") * (
                v + acc * 0.0)[:, None]
            return jnp.sum(p.reshape(-1, 64, K), axis=1)[0, 0]
        timed("fuse64", fuse64, (col, value, x),
              nnz * (K * 4 + 8) + nnz // 64 * K * 4)

    if want("sum8") or want("sum4") or want("sum16") or want("sum32"):
        # padded-transposed layout: cols_t (G, nnz/G) — slot (g, j) holds
        # edge j*G+g.  An elementwise sum of G gathers: if XLA fuses the
        # gathers as producers, traffic = read x rows + write nnz/G.
        for G in (4, 8, 16, 32):
            if not want(f"sum{G}"):
                continue
            ng = nnz // G
            cols_t = col[:ng * G].reshape(ng, G).T.copy()
            vals_t = value[:ng * G].reshape(ng, G).T.copy()
            jax.block_until_ready((cols_t, vals_t))

            def sumG(a, acc, G=G, ng=ng):
                ct, vt, xx = a
                out = jnp.zeros((ng, K), jnp.float32)
                for i in range(G):
                    out = out + jnp.take(xx, ct[i], axis=0,
                                         mode="clip") * (
                        vt[i] + acc * 0.0)[:, None]
                return out[0, 0]
            timed(f"sum{G}", sumG, (cols_t, vals_t, x),
                  ng * G * (K * 4 + 8) + ng * K * 4)

    if want("copy_big"):
        big = jax.random.normal(key, (4 * nnz // 8, K), jnp.float32)
        timed("copy_big", lambda a, acc: (a[0] + acc)[0, 0], (big,),
              2 * big.size * 4)
        del big

    if want("sum64") or want("sum48"):
        for G in (48, 64):
            if not want(f"sum{G}"):
                continue
            ng = nnz // G
            cols_t = col[:ng * G].reshape(ng, G).T.copy()
            vals_t = value[:ng * G].reshape(ng, G).T.copy()
            jax.block_until_ready((cols_t, vals_t))

            def sumG(a, acc, G=G, ng=ng):
                ct, vt, xx = a
                out = jnp.zeros((ng, K), jnp.float32)
                for i in range(G):
                    out = out + jnp.take(xx, ct[i], axis=0,
                                         mode="clip") * (
                        vt[i] + acc * 0.0)[:, None]
                return out[0, 0]
            timed(f"sum{G}", sumG, (cols_t, vals_t, x),
                  ng * G * (K * 4 + 8) + ng * K * 4)

    if want("sum32bf"):
        G, ng = 32, nnz // 32
        cols_t = col[:ng * G].reshape(ng, G).T.copy()
        vals_t = value[:ng * G].reshape(ng, G).T.astype(jnp.bfloat16).copy()
        xbf = x.astype(jnp.bfloat16)
        jax.block_until_ready((cols_t, vals_t, xbf))

        def sumGbf(a, acc, G=G, ng=ng):
            ct, vt, xx = a
            out = jnp.zeros((ng, K), jnp.float32)
            for i in range(G):
                p = jnp.take(xx, ct[i], axis=0, mode="clip") * (
                    vt[i] + acc.astype(jnp.bfloat16) * 0.0)[:, None]
                out = out + p.astype(jnp.float32)
            return out[0, 0]
        timed("sum32bf", sumGbf, (cols_t, vals_t, xbf),
              ng * G * (K * 2 + 6) + ng * K * 4)

    if want("segsum"):
        def segsum(a, acc):
            r, c, v, xx = a
            p = jnp.take(xx, c, axis=0, mode="clip") * (
                v + acc * 0.0)[:, None]
            return jax.ops.segment_sum(p, r, num_segments=NODES,
                                       indices_are_sorted=True)[0, 0]
        timed("segsum", segsum, (row, col, value, x),
              nnz * (K * 4 + 12) + NODES * K * 4)

    if want("reduce"):
        from paddle_sparse_tpu.ops.convert import ind2ptr
        from paddle_sparse_tpu.ops.kernels.spmm_pallas import (
            segment_rows_matmul)
        rowptr = ind2ptr(row, NODES)
        prod = jax.random.normal(key, (nnz, K), jnp.float32)
        jax.block_until_ready((rowptr, prod))

        def red(a, acc):
            rp, p = a
            return segment_rows_matmul(p + acc * 0.0, None, rp, NODES)[0, 0]
        timed("reduce", red, (rowptr, prod),
              nnz * K * 4 + NODES * K * 4)
        del prod

    if want("e2e_pal"):
        from paddle_sparse_tpu.ops.spmm import make_spmm_plan, spmm_chunked
        plan, structure = make_spmm_plan(row, col, NODES, NODES, K)
        jax.block_until_ready(structure)

        def pal(a, acc):
            s, v, xx = a
            return spmm_chunked(plan, s, v + acc * 0.0, xx)[0, 0]
        timed("e2e_pal", pal, (structure, value, x),
              nnz * (K * 4 + 12) + NODES * K * 4)


if __name__ == "__main__":
    main()
