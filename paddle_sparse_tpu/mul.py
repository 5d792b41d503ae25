"""Sparse * dense-broadcast and sparse * sparse (intersection) multiply
(reference parity: ``paddle_sparse/mul.py``).

The sparse-sparse intersection concatenates both coalesced COO lists,
lexsorts, and pairs adjacent duplicates — same algorithm as the reference but
with the flat ``row*N+col`` sort key replaced by an overflow-safe lexsort.
"""
import jax
import jax.numpy as jnp

from .add import _broadcast_to_nnz
from .tensor import SparseTensor
from .utils import lexsort_rowcol


def mul(src: SparseTensor, other):
    if not isinstance(other, SparseTensor):
        expanded = _broadcast_to_nnz(src, other)
        value = src.storage.value()
        if value is not None:
            value = expanded.astype(value.dtype) * value
        else:
            value = expanded
        return src.set_value(value, layout="coo")

    if not src.is_coalesced():
        raise ValueError("the `src` tensor is not coalesced")
    if not other.is_coalesced():
        raise ValueError("the `other` tensor is not coalesced")

    rowA, colA, valueA = src.coo()
    rowB, colB, valueB = other.coo()
    if valueA is None or valueB is None:
        raise ValueError("both sparse tensors must contain values")

    row = jnp.concatenate([rowA, rowB])
    col = jnp.concatenate([colA, colB])
    value = jnp.concatenate([valueA, valueB])

    perm = lexsort_rowcol(row, col)
    row, col, value = row[perm], col[perm], value[perm]

    # coalesced inputs => an intersection entry appears exactly twice and the
    # two occurrences are adjacent after the stable sort.
    dup = (row[1:] == row[:-1]) & (col[1:] == col[:-1])
    hit = jnp.nonzero(dup)[0]

    sizes = (max(src.size(0), other.size(0)), max(src.size(1), other.size(1)))
    return SparseTensor(row=row[1:][dup], col=col[1:][dup],
                        value=value[hit] * value[hit + 1],
                        sparse_sizes=sizes)


def mul_(src: SparseTensor, other) -> SparseTensor:
    expanded = _broadcast_to_nnz(src, other)
    value = src.storage.value()
    value = expanded if value is None else value * expanded.astype(value.dtype)
    return src.set_value_(value, layout="coo")


def mul_nnz(src: SparseTensor, other, layout=None) -> SparseTensor:
    value = src.storage.value()
    other = jnp.asarray(other)
    value = other if value is None else value * other.astype(value.dtype)
    return src.set_value(value, layout=layout)


def mul_nnz_(src: SparseTensor, other, layout=None) -> SparseTensor:
    value = src.storage.value()
    other = jnp.asarray(other)
    value = other if value is None else value * other.astype(value.dtype)
    return src.set_value_(value, layout=layout)


SparseTensor.mul = mul
SparseTensor.mul_ = mul_
SparseTensor.mul_nnz = mul_nnz
SparseTensor.mul_nnz_ = mul_nnz_
SparseTensor.__mul__ = mul
SparseTensor.__rmul__ = mul
SparseTensor.__imul__ = mul_
