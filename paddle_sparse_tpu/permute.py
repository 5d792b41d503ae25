"""Symmetric permutation of a square matrix
(reference parity: ``paddle_sparse/permute.py``)."""
from .tensor import SparseTensor


def permute(src: SparseTensor, perm) -> SparseTensor:
    assert src.is_quadratic()
    return src.index_select(0, perm).index_select(1, perm)


SparseTensor.permute = permute
