"""Concatenation along rows, cols, the diagonal, or value dims
(reference parity: ``paddle_sparse/cat.py``).

Cache-preservation contract (pinned by ``test/test_cat.py:31-64`` in the
reference): dim-0 keeps row/rowptr/rowcount, dim-1 keeps colptr/colcount
(output needs re-sorting), diagonal keeps all five cached fields.
"""
from typing import List, Optional

import jax.numpy as jnp

from .storage import SparseStorage
from .tensor import SparseTensor


def _maybe_concat(parts, n_tensors: int, axis: int = 0):
    return jnp.concatenate(parts, axis=axis) if len(parts) == n_tensors else None


def cat(tensors: List[SparseTensor], dim) -> SparseTensor:
    assert len(tensors) > 0

    if isinstance(dim, (tuple, list)):
        assert len(dim) == 2 and sorted(dim) == [0, 1]
        return cat_diag(tensors)

    dim = tensors[0].dim() + dim if dim < 0 else dim
    if dim == 0:
        return cat_first(tensors)
    if dim == 1:
        return cat_second(tensors)
    if 1 < dim < tensors[0].dim():
        values = []
        for tensor in tensors:
            value = tensor.storage.value()
            assert value is not None
            values.append(value)
        return tensors[0].set_value(jnp.concatenate(values, axis=dim - 1),
                                    layout="coo")
    raise IndexError(
        f"dimension out of range: expected within "
        f"[{-tensors[0].dim()}, {tensors[0].dim() - 1}], got {dim}")


def cat_first(tensors: List[SparseTensor]) -> SparseTensor:
    n = len(tensors)
    rows, rowptrs, cols, values, rowcounts = [], [], [], [], []
    M, N, nnz = 0, 0, 0
    for tensor in tensors:
        s = tensor.storage
        if s._row is not None:
            rows.append(s._row + M)
        if s._rowptr is not None:
            rowptrs.append(s._rowptr[1:] + nnz if rowptrs else s._rowptr)
        cols.append(s._col)
        if s._value is not None:
            values.append(s._value)
        if s._rowcount is not None:
            rowcounts.append(s._rowcount)
        M += tensor.sparse_size(0)
        N = max(N, tensor.sparse_size(1))
        nnz += tensor.nnz()

    storage = SparseStorage(
        row=_maybe_concat(rows, n), rowptr=_maybe_concat(rowptrs, n),
        col=jnp.concatenate(cols), value=_maybe_concat(values, n),
        sparse_sizes=(M, N), rowcount=_maybe_concat(rowcounts, n),
        is_sorted=True)
    return tensors[0].from_storage(storage)


def cat_second(tensors: List[SparseTensor]) -> SparseTensor:
    n = len(tensors)
    rows, cols, values, colptrs, colcounts = [], [], [], [], []
    M, N, nnz = 0, 0, 0
    for tensor in tensors:
        row, _, value = tensor.coo()
        s = tensor.storage
        rows.append(row)
        cols.append(s._col + N)
        if value is not None:
            values.append(value)
        if s._colptr is not None:
            colptrs.append(s._colptr[1:] + nnz if colptrs else s._colptr)
        if s._colcount is not None:
            colcounts.append(s._colcount)
        M = max(M, tensor.sparse_size(0))
        N += tensor.sparse_size(1)
        nnz += tensor.nnz()

    # rows interleave across inputs -> the constructor re-sorts; counts and
    # pointers stay valid, permutation caches are rebuilt lazily.
    storage = SparseStorage(
        row=jnp.concatenate(rows), col=jnp.concatenate(cols),
        value=_maybe_concat(values, n), sparse_sizes=(M, N),
        colptr=_maybe_concat(colptrs, n),
        colcount=_maybe_concat(colcounts, n), is_sorted=False)
    return tensors[0].from_storage(storage)


def cat_diag(tensors: List[SparseTensor]) -> SparseTensor:
    n = len(tensors)
    rows, rowptrs, cols, values = [], [], [], []
    rowcounts, colptrs, colcounts, csr2cscs, csc2csrs = [], [], [], [], []
    M, N, nnz = 0, 0, 0
    for tensor in tensors:
        s = tensor.storage
        if s._row is not None:
            rows.append(s._row + M)
        if s._rowptr is not None:
            rowptrs.append(s._rowptr[1:] + nnz if rowptrs else s._rowptr)
        cols.append(s._col + N)
        if s._value is not None:
            values.append(s._value)
        if s._rowcount is not None:
            rowcounts.append(s._rowcount)
        if s._colptr is not None:
            colptrs.append(s._colptr[1:] + nnz if colptrs else s._colptr)
        if s._colcount is not None:
            colcounts.append(s._colcount)
        if s._csr2csc is not None:
            csr2cscs.append(s._csr2csc + nnz)
        if s._csc2csr is not None:
            csc2csrs.append(s._csc2csr + nnz)
        M += tensor.sparse_size(0)
        N += tensor.sparse_size(1)
        nnz += tensor.nnz()

    storage = SparseStorage(
        row=_maybe_concat(rows, n), rowptr=_maybe_concat(rowptrs, n),
        col=jnp.concatenate(cols), value=_maybe_concat(values, n),
        sparse_sizes=(M, N), rowcount=_maybe_concat(rowcounts, n),
        colptr=_maybe_concat(colptrs, n),
        colcount=_maybe_concat(colcounts, n),
        csr2csc=_maybe_concat(csr2cscs, n),
        csc2csr=_maybe_concat(csc2csrs, n), is_sorted=True)
    return tensors[0].from_storage(storage)
