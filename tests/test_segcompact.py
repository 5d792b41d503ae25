"""Pallas monotone-segment compaction kernel (ops/kernels/segcompact).

Covers the compress contract of the SpGEMM fast path: per-row-sorted
(M, F) grids with random run structure, empty rows, chunk-boundary runs
(including boundaries falling inside a run's trailing pads — the case
that needs the coordinate carry), and the value-cotangent custom VJP.
Runs in interpret mode (conftest pins the CPU platform)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddle_sparse_tpu.ops.kernels.segcompact import (compact_runs,
                                                      compact_sorted_stream)


def _random_grid(rng, M, F, N):
    key = np.full((M, F), N, np.int32)
    prod = np.zeros((M, F), np.float32)
    for m in range(M):
        u = int(rng.integers(0, F + 1))
        ks = np.sort(rng.integers(0, N, u)).astype(np.int32)
        key[m, :u] = ks
        prod[m, :u] = rng.standard_normal(u).astype(np.float32)
    return key, prod


def _reference(key, prod, N):
    ref = {}
    M, F = key.shape
    for m in range(M):
        for f in range(F):
            if key[m, f] < N:
                k = (m, int(key[m, f]))
                ref[k] = ref.get(k, 0.0) + float(prod[m, f])
    return sorted(ref.items())


@pytest.mark.parametrize("M,F,N,E", [
    (7, 16, 12, 8),       # boundary runs + trailing-pad boundaries
    (32, 8, 40, 16),
    (5, 32, 6, 64),       # heavy duplication (tiny N)
    (1, 8, 4, 8),
    (3, 8, 5, 128),       # single chunk
    (64, 16, 100, 32),
])
def test_compact_matches_dict_reference(M, F, N, E):
    rng = np.random.default_rng(M * 1000 + F)
    key, prod = _random_grid(rng, M, F, N)
    cap = int((key < N).sum()) + 3
    rowC, colC, valC, uc = jax.jit(
        lambda k, p: compact_sorted_stream(
            k, p, jnp.arange(M, dtype=jnp.int32), N, cap, E=E,
            interpret=True))(jnp.asarray(key), jnp.asarray(prod))
    items = _reference(key, prod, N)
    n = len(items)
    assert int(uc) == n
    np.testing.assert_array_equal(
        np.asarray(rowC)[:n], np.array([i[0][0] for i in items]))
    np.testing.assert_array_equal(
        np.asarray(colC)[:n], np.array([i[0][1] for i in items]))
    v = np.array([i[1] for i in items])
    scale = max(1.0, float(np.abs(v).max())) if n else 1.0
    # Dekker hi/lo bf16 value path: ~f32 accuracy
    assert (np.abs(np.asarray(valC)[:n] - v).max() if n else 0.0) \
        < 5e-5 * scale


def test_compact_empty_and_full_rows():
    M, F, N, E = 4, 8, 6, 8
    key = np.full((M, F), N, np.int32)
    prod = np.zeros((M, F), np.float32)
    key[1, :] = np.sort(np.array([0, 0, 1, 1, 1, 2, 5, 5]))  # full row
    prod[1, :] = np.arange(1.0, 9.0, dtype=np.float32)
    rowC, colC, valC, uc = compact_sorted_stream(
        jnp.asarray(key), jnp.asarray(prod),
        jnp.arange(M, dtype=jnp.int32), N, 8, E=E, interpret=True)
    items = _reference(key, prod, N)
    assert int(uc) == len(items)
    np.testing.assert_array_equal(np.asarray(rowC)[:len(items)],
                                  [i[0][0] for i in items])
    np.testing.assert_allclose(np.asarray(valC)[:len(items)],
                               [i[1] for i in items], rtol=1e-4)


def test_compact_runs_value_grad():
    """The custom VJP's cotangent equals the segment-sum gradient."""
    rng = np.random.default_rng(3)
    M, F, N, E = 9, 16, 10, 16
    key, prod = _random_grid(rng, M, F, N)
    cap = int((key < N).sum()) + 2
    rows = jnp.arange(M, dtype=jnp.int32)

    def loss_kernel(p):
        _, _, valC, _ = compact_runs(N, cap, E, True,
                                     jnp.asarray(key), p, rows)
        return (valC ** 2).sum()

    def loss_ref(p):
        key_f = jnp.asarray(key).reshape(-1)
        row_f = jnp.repeat(rows, F)
        valid = key_f < N
        first = valid & jnp.concatenate([
            jnp.ones((1,), jnp.bool_),
            (key_f[1:] != key_f[:-1]) | (row_f[1:] != row_f[:-1])
            | ~valid[:-1]])
        seg = jnp.maximum(jnp.cumsum(first.astype(jnp.int32)) - 1, 0)
        seg = jnp.where(valid, seg, cap)
        valC = jax.ops.segment_sum(p.reshape(-1), seg,
                                   num_segments=cap + 1)[:cap]
        return (valC ** 2).sum()

    p = jnp.asarray(prod)
    g_kernel = jax.grad(loss_kernel)(p)
    g_ref = jax.grad(loss_ref)(p)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)
