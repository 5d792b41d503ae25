"""Matrix-multiply facade: sparse @ dense (SpMM) and sparse @ sparse (SpGEMM).

The reference lacks all of these (unsupported list,
``/root/reference/README.md:45-61``); the upstream functional contracts this
module honors are documented in ``README.md:267-354``:

* ``spmm(index, value, m, n, matrix) -> dense``
* ``spspmm(indexA, valueA, indexB, valueB, m, k, n) -> (indexC, valueC)``
* ``matmul(SparseTensor, dense|SparseTensor, reduce)`` + ``A @ B`` operator.

Compute dispatches to the jit-compatible kernels in ``ops/``.
"""
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .ops.spmm import spmm_coo
from .ops.spspmm import spspmm_eager
from .tensor import SparseTensor


def matmul(src: SparseTensor, other: Union[SparseTensor, jax.Array],
           reduce: str = "sum"):
    """``src @ other`` with row-wise ``reduce`` (sum/mean/min/max for dense
    ``other``; sum only for sparse ``other``)."""
    if isinstance(other, SparseTensor):
        if reduce not in ("sum", "add"):
            raise ValueError("sparse @ sparse supports reduce='sum' only")
        return _matmul_sparse(src, other)
    return _matmul_dense(src, jnp.asarray(other), reduce)


def _matmul_dense(src: SparseTensor, other: jax.Array, reduce: str) -> jax.Array:
    assert src.sparse_size(1) == other.shape[0], (
        f"size mismatch: {src.sparse_sizes()} @ {other.shape}")
    row, col, value = src.coo()
    return spmm_coo(row, col, value, other, src.sparse_size(0), reduce)


def _matmul_sparse(src: SparseTensor, other: SparseTensor) -> SparseTensor:
    assert src.sparse_size(1) == other.sparse_size(0), (
        f"size mismatch: {src.sparse_sizes()} @ {other.sparse_sizes()}")
    rowA, colA, valA = src.coo()
    rowptrB, colB, valB = other.csr()
    rowC, colC, valC = spspmm_eager(rowA, colA, valA, rowptrB, colB, valB,
                                    src.sparse_size(0), other.sparse_size(1))
    return SparseTensor(row=rowC, col=colC, value=valC,
                        sparse_sizes=(src.sparse_size(0),
                                      other.sparse_size(1)),
                        is_sorted=True, trust_data=True)


# ---------------------------------------------------------------------------
# upstream tuple-style functional API (README.md:267-354)
# ---------------------------------------------------------------------------
def spmm(index, value: Optional[jax.Array], m: int, n: int,
         matrix: jax.Array, reduce: str = "sum") -> jax.Array:
    """Sparse-dense multiply of an ``(index, value)`` m x n matrix."""
    row, col = jnp.asarray(index[0]), jnp.asarray(index[1])
    perm = jnp.lexsort((col, row))
    row, col = row[perm], col[perm]
    if value is not None:
        value = jnp.asarray(value)[perm]
    return spmm_coo(row, col, value, jnp.asarray(matrix), m, reduce)


def spspmm(indexA, valueA: Optional[jax.Array], indexB,
           valueB: Optional[jax.Array], m: int, k: int, n: int,
           coalesced: bool = False) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Sparse-sparse multiply of (m x k) @ (k x n) in tuple form.

    ``coalesced`` is accepted for upstream API parity; output is always
    coalesced here (the ESC compress step deduplicates for free).
    """
    A = SparseTensor(row=indexA[0], col=indexA[1], value=valueA,
                     sparse_sizes=(m, k))
    B = SparseTensor(row=indexB[0], col=indexB[1], value=valueB,
                     sparse_sizes=(k, n))
    C = _matmul_sparse(A, B)
    rowC, colC, valueC = C.coo()
    return jnp.stack([rowC, colC], axis=0), valueC


SparseTensor.matmul = matmul
SparseTensor.spmm = _matmul_dense
SparseTensor.spspmm = _matmul_sparse
SparseTensor.__matmul__ = matmul
