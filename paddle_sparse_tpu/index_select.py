"""Row/column gathers (reference parity: ``paddle_sparse/index_select.py``).

dim-0 gathers rebuild CSR directly from the gathered rowcounts plus a
``gather_csr`` offset trick (no per-row loop); dim-1 goes through the CSC view
and re-sorts into canonical row order with an overflow-safe lexsort.
"""
import jax.numpy as jnp

from .ops.segment import gather_csr
from .storage import SparseStorage, get_layout
from .tensor import SparseTensor
from .utils import as_index_array, lexsort_rowcol


def index_select(src: SparseTensor, dim: int, idx) -> SparseTensor:
    dim = src.dim() + dim if dim < 0 else dim
    idx = as_index_array(idx)
    assert idx.ndim == 1
    n_idx = int(idx.shape[0])

    if dim == 0:
        old_rowptr, col, value = src.csr()
        rowcount = src.storage.rowcount()[idx]

        rowptr = jnp.concatenate([
            jnp.zeros((1,), dtype=col.dtype),
            jnp.cumsum(rowcount).astype(col.dtype),
        ])
        nnz_out = int(rowptr[-1])
        row = jnp.repeat(jnp.arange(n_idx, dtype=col.dtype), rowcount,
                         total_repeat_length=nnz_out)
        # position inside each output segment + start of the source segment
        perm = jnp.arange(nnz_out, dtype=col.dtype)
        perm = perm + gather_csr(old_rowptr[idx] - rowptr[:-1], rowptr, nnz_out)

        col = col[perm]
        if value is not None:
            value = value[perm]

        storage = SparseStorage(
            row=row, rowptr=rowptr, col=col, value=value,
            sparse_sizes=(n_idx, src.sparse_size(1)), rowcount=rowcount,
            is_sorted=True, trust_data=True)
        return src.from_storage(storage)

    if dim == 1:
        old_colptr, row, value = src.csc()
        colcount = src.storage.colcount()[idx]

        colptr = jnp.concatenate([
            jnp.zeros((1,), dtype=row.dtype),
            jnp.cumsum(colcount).astype(row.dtype),
        ])
        nnz_out = int(colptr[-1])
        col = jnp.repeat(jnp.arange(n_idx, dtype=row.dtype), colcount,
                         total_repeat_length=nnz_out)
        perm = jnp.arange(nnz_out, dtype=row.dtype)
        perm = perm + gather_csr(old_colptr[idx] - colptr[:-1], colptr, nnz_out)

        row = row[perm]
        csc2csr = lexsort_rowcol(row, col).astype(row.dtype)
        row, col = row[csc2csr], col[csc2csr]
        if value is not None:
            value = value[perm][csc2csr]

        storage = SparseStorage(
            row=row, col=col, value=value,
            sparse_sizes=(src.sparse_size(0), n_idx),
            colptr=colptr, colcount=colcount, csc2csr=csc2csr,
            is_sorted=True, trust_data=True)
        return src.from_storage(storage)

    value = src.storage.value()
    if value is None:
        raise ValueError("cannot index_select a value dim without values")
    return src.set_value(jnp.take(value, idx, axis=dim - 1), layout="coo")


def index_select_nnz(src: SparseTensor, idx, layout=None) -> SparseTensor:
    idx = as_index_array(idx)
    assert idx.ndim == 1
    if get_layout(layout) == "csc":
        idx = src.storage.csc2csr()[idx]

    row, col, value = src.coo()
    row, col = row[idx], col[idx]
    if value is not None:
        value = value[idx]
    return SparseTensor(row=row, col=col, value=value,
                        sparse_sizes=src.sparse_sizes(), is_sorted=True)


SparseTensor.index_select = index_select
SparseTensor.index_select_nnz = index_select_nnz
