"""Jittable padded SpGEMM coverage: parity with the eager path, overflow
detection, gradients under jit."""
import jax
import jax.numpy as jnp
import numpy as np

from paddle_sparse_tpu import SparseTensor
from paddle_sparse_tpu.core import PaddedCOO, spspmm_padded

rng = np.random.default_rng(21)


def _rand(m, n, density=0.35, seed=0):
    r = np.random.default_rng(seed)
    dense = np.where(r.random((m, n)) < density, r.standard_normal((m, n)),
                     0.0).astype(np.float32)
    return SparseTensor.from_dense(jnp.asarray(dense)), dense


def test_padded_spgemm_matches_dense():
    A, dA = _rand(6, 7, seed=1)
    B, dB = _rand(7, 5, seed=2)
    pA = PaddedCOO.from_eager(A, capacity=A.nnz() + 3)
    pB = PaddedCOO.from_eager(B, capacity=B.nnz() + 5)

    res = spspmm_padded(pA, pB, flop_capacity=256, out_capacity=64)
    assert not bool(res.overflowed)
    C = res.matrix.to_eager()
    np.testing.assert_allclose(np.asarray(C.to_dense()), dA @ dB,
                               rtol=1e-4, atol=1e-5)


def test_padded_spgemm_overflow_flag():
    A, dA = _rand(8, 8, density=0.5, seed=3)
    pA = PaddedCOO.from_eager(A)
    res = spspmm_padded(pA, pA, flop_capacity=4, out_capacity=4)
    assert bool(res.overflowed)
    assert int(res.matrix.nnz) <= 4


def test_padded_spgemm_grad():
    A, dA = _rand(5, 5, seed=4)
    pA = PaddedCOO.from_eager(A, capacity=A.nnz() + 2)

    def loss(value):
        p = PaddedCOO(row=pA.row, col=pA.col, value=value, nnz=pA.nnz,
                      shape=pA.shape)
        res = spspmm_padded(p, p, flop_capacity=128, out_capacity=64)
        v = res.matrix.value
        return (v ** 2).sum()

    g = jax.jit(jax.grad(loss))(pA.value)

    def dense_loss(value):
        D = jnp.zeros((5, 5)).at[pA.row[:A.nnz()], pA.col[:A.nnz()]].set(
            value[:A.nnz()])
        C = D @ D
        return (C ** 2).sum()

    g_dense = jax.grad(dense_loss)(pA.value)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_dense),
                               rtol=1e-4, atol=1e-5)
