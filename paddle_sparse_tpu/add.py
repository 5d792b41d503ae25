"""Sparse + dense-broadcast and sparse + sparse addition
(reference parity: ``paddle_sparse/add.py``).

Row-vector / col-vector broadcasts gather the dense operand to nnz positions;
sparse + sparse concatenates both COO lists and coalesce-sums, which is also
exactly how the padded jit core implements it.
"""
from typing import Optional

import jax
import jax.numpy as jnp

from .ops.segment import gather_csr
from .tensor import SparseTensor


def _broadcast_to_nnz(src: SparseTensor, other: jax.Array) -> jax.Array:
    """Expand a (M, 1, ...) or (1, N, ...) dense operand to one entry per nnz."""
    other = jnp.asarray(other)
    rowptr, col, _ = src.csr()
    if other.shape[0] == src.size(0) and other.shape[1] == 1:  # row-wise
        return gather_csr(jnp.squeeze(other, 1), rowptr, src.nnz())
    if other.shape[0] == 1 and other.shape[1] == src.size(1):  # col-wise
        return jnp.squeeze(other, 0)[col]
    raise ValueError(
        f"Size mismatch: expected ({src.size(0)}, 1, ...) or "
        f"(1, {src.size(1)}, ...), got {tuple(other.shape)}.")


def add(src: SparseTensor, other):
    if isinstance(other, SparseTensor):
        rowA, colA, valueA = src.coo()
        rowB, colB, valueB = other.coo()
        row = jnp.concatenate([rowA, rowB])
        col = jnp.concatenate([colA, colB])
        value: Optional[jax.Array] = None
        if valueA is not None and valueB is not None:
            value = jnp.concatenate([valueA, valueB])
        sizes = (max(src.size(0), other.size(0)),
                 max(src.size(1), other.size(1)))
        out = SparseTensor(row=row, col=col, value=value, sparse_sizes=sizes)
        return out.coalesce(reduce="sum")

    if isinstance(other, (jax.Array, jnp.ndarray)) or hasattr(other, "shape"):
        expanded = _broadcast_to_nnz(src, other)
        value = src.storage.value()
        if value is not None:
            value = expanded.astype(value.dtype) + value
        else:
            value = expanded + jnp.ones((), dtype=expanded.dtype)
        return src.set_value(value, layout="coo")

    raise NotImplementedError(f"cannot add {type(other)} to SparseTensor")


def add_(src: SparseTensor, other) -> SparseTensor:
    expanded = _broadcast_to_nnz(src, other)
    value = src.storage.value()
    if value is not None:
        value = value + expanded.astype(value.dtype)
    else:
        value = expanded + jnp.ones((), dtype=expanded.dtype)
    return src.set_value_(value, layout="coo")


def add_nnz(src: SparseTensor, other, layout=None) -> SparseTensor:
    value = src.storage.value()
    other = jnp.asarray(other)
    value = other + (jnp.ones((), other.dtype) if value is None
                     else value.astype(other.dtype))
    return src.set_value(value, layout=layout)


def add_nnz_(src: SparseTensor, other, layout=None) -> SparseTensor:
    value = src.storage.value()
    other = jnp.asarray(other)
    value = other + (jnp.ones((), other.dtype) if value is None
                     else value.astype(other.dtype))
    return src.set_value_(value, layout=layout)


SparseTensor.add = add
SparseTensor.add_ = add_
SparseTensor.add_nnz = add_nnz
SparseTensor.add_nnz_ = add_nnz_
SparseTensor.__add__ = add
SparseTensor.__radd__ = add
SparseTensor.__iadd__ = add_
