"""Boolean-mask selection (reference parity: ``paddle_sparse/masked_select.py``)."""
import jax.numpy as jnp

from .storage import SparseStorage, get_layout
from .tensor import SparseTensor
from .utils import lexsort_rowcol


def masked_select(src: SparseTensor, dim: int, mask) -> SparseTensor:
    dim = src.dim() + dim if dim < 0 else dim
    mask = jnp.asarray(mask)
    assert mask.ndim == 1

    if dim == 0:
        row, col, value = src.coo()
        rowcount = src.storage.rowcount()[mask]
        n_rows = int(rowcount.shape[0])

        edge_mask = mask[row]
        row = jnp.repeat(jnp.arange(n_rows, dtype=col.dtype), rowcount,
                         total_repeat_length=int(rowcount.sum()))
        col = col[edge_mask]
        if value is not None:
            value = value[edge_mask]

        storage = SparseStorage(
            row=row, col=col, value=value,
            sparse_sizes=(n_rows, src.sparse_size(1)), rowcount=rowcount,
            is_sorted=True, trust_data=True)
        return src.from_storage(storage)

    if dim == 1:
        row, col, value = src.coo()
        csr2csc = src.storage.csr2csc()
        row, col = row[csr2csc], col[csr2csc]
        colcount = src.storage.colcount()[mask]
        n_cols = int(colcount.shape[0])

        edge_mask = mask[col]
        col = jnp.repeat(jnp.arange(n_cols, dtype=row.dtype), colcount,
                         total_repeat_length=int(colcount.sum()))
        row = row[edge_mask]
        csc2csr = lexsort_rowcol(row, col).astype(row.dtype)
        row, col = row[csc2csr], col[csc2csr]
        if value is not None:
            value = value[csr2csc][edge_mask][csc2csr]

        storage = SparseStorage(
            row=row, col=col, value=value,
            sparse_sizes=(src.sparse_size(0), n_cols),
            colcount=colcount, csc2csr=csc2csr,
            is_sorted=True, trust_data=True)
        return src.from_storage(storage)

    value = src.storage.value()
    if value is None:
        raise ValueError("cannot masked_select a value dim without values")
    idx = jnp.nonzero(mask)[0]
    return src.set_value(jnp.take(value, idx, axis=dim - 1), layout="coo")


def masked_select_nnz(src: SparseTensor, mask, layout=None) -> SparseTensor:
    mask = jnp.asarray(mask)
    assert mask.ndim == 1
    if get_layout(layout) == "csc":
        mask = mask[src.storage.csc2csr()]

    row, col, value = src.coo()
    row, col = row[mask], col[mask]
    if value is not None:
        value = value[mask]
    return SparseTensor(row=row, col=col, value=value,
                        sparse_sizes=src.sparse_sizes(), is_sorted=True)


SparseTensor.masked_select = masked_select
SparseTensor.masked_select_nnz = masked_select_nnz
