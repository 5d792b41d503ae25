"""Tile-span staged SpMM (ops/spmm_seg3.py): oracle conformance, grads,
and the skew-infeasibility guard (CPU interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddle_sparse_tpu.ops.spmm_seg3 import (Seg3Infeasible,
                                             make_seg3_plan, pack_values,
                                             spmm_seg3, unpack_values)

rng = np.random.default_rng(5)


def _graph(M, N, nnz):
    row = np.sort(rng.integers(0, M, nnz)).astype(np.int32)
    col = rng.integers(0, N, nnz).astype(np.int32)
    return row, col


@pytest.mark.parametrize("M,N,nnz,K,sr,band", [
    (300, 200, 2500, 128, 64, 128),    # several segments + bands
    (130, 500, 1800, 128, 512, 256),   # S=1-ish
])
def test_seg3_forward_oracle(M, N, nnz, K, sr, band):
    row, col = _graph(M, N, nnz)
    val = rng.standard_normal(nnz).astype(np.float32)
    x = rng.standard_normal((N, K)).astype(np.float32)
    plan, s = make_seg3_plan(row, col, M, N, feat_dim=K, sr=sr,
                             band_rows=band, stream="f32")
    packed = pack_values(s, jnp.asarray(val))
    np.testing.assert_array_equal(
        np.asarray(unpack_values(s, packed)), val)
    out = spmm_seg3(plan, s, packed, jnp.asarray(x))
    want = np.zeros((M, K), np.float64)
    np.add.at(want, row, val[:, None].astype(np.float64) * x[col])
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4,
                               atol=1e-4)


def test_seg3_grads_match_oracle():
    M, N, nnz, K = 220, 180, 2100, 128
    row, col = _graph(M, N, nnz)
    val = rng.standard_normal(nnz).astype(np.float32)
    x = rng.standard_normal((N, K)).astype(np.float32)
    g = rng.standard_normal((M, K)).astype(np.float32)
    plan, s = make_seg3_plan(row, col, M, N, feat_dim=K, sr=64,
                             band_rows=128, stream="f32")
    packed = pack_values(s, jnp.asarray(val))

    def loss(pv, xx):
        return (spmm_seg3(plan, s, pv, xx) * jnp.asarray(g)).sum()

    d_pv, d_x = jax.grad(loss, argnums=(0, 1))(packed, jnp.asarray(x))
    d_val = np.asarray(unpack_values(s, d_pv))
    want_dv = (g[row].astype(np.float64) * x[col]).sum(axis=1)
    want_dx = np.zeros((N, K), np.float64)
    np.add.at(want_dx, col, val[:, None].astype(np.float64) * g[row])
    np.testing.assert_allclose(d_val, want_dv, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d_x), want_dx, rtol=1e-4,
                               atol=1e-4)


def test_seg3_skew_infeasible():
    """A hot tile must trip the staging-budget guard, routing callers to
    the degree-agnostic seg2 flagship."""
    M = 1024
    row = np.concatenate([np.zeros(200_000, np.int32),
                          np.arange(M, dtype=np.int32)])
    col = np.concatenate([
        rng.integers(0, M, 200_000).astype(np.int32),
        rng.integers(0, M, M).astype(np.int32)])
    order = np.argsort(row, kind="stable")
    with pytest.raises(Seg3Infeasible):
        make_seg3_plan(row[order], col[order], M, M, feat_dim=256,
                       sr=128, band_rows=128, staging_budget=4 << 20)
