"""Reliable TPU timing: loop the op inside one jit (single dispatch), with an
iteration-dependent perturbation so XLA can't hoist/CSE the body."""
import time

import jax
import jax.numpy as jnp


def bench_op(make_body, iters=20, warmup=True):
    """make_body(i) -> scalar; returns seconds per iteration."""

    @jax.jit
    def run(n):
        def step(i, acc):
            return acc + make_body(i)
        return jax.lax.fori_loop(0, n, step, jnp.float32(0))

    if warmup:
        _ = float(run(1))
    t0 = time.perf_counter()
    _ = float(run(iters))
    t1 = time.perf_counter()
    _ = float(run(2 * iters))
    t2 = time.perf_counter()
    # difference removes fixed dispatch/readback overhead
    return ((t2 - t1) - (t1 - t0)) / iters
