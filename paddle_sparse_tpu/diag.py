"""Diagonal-manipulation family: remove/set/fill/get diag.

Not implemented by the reference (unsupported list,
``/root/reference/README.md:45-61``); semantics follow upstream
pytorch_sparse's ``diag.py``: ``k`` selects the diagonal (``col - row == k``),
``set_diag`` inserts explicit entries for every diagonal position inside the
matrix band, ``fill_diag`` is ``set_diag`` with a constant.
"""
from typing import Optional

import jax
import jax.numpy as jnp

from .tensor import SparseTensor


def remove_diag(src: SparseTensor, k: int = 0) -> SparseTensor:
    row, col, value = src.coo()
    keep = (col - row) != k
    row, col = row[keep], col[keep]
    if value is not None:
        value = value[keep]

    storage = src.storage
    rowcount = colcount = None
    if storage._rowcount is not None or storage._colcount is not None:
        # counts shrink by exactly the removed diagonal positions
        removed_row = jnp.zeros((src.sparse_size(0),),
                                dtype=storage._col.dtype)
        removed_col = jnp.zeros((src.sparse_size(1),),
                                dtype=storage._col.dtype)
        drop_r = storage.row()[~keep]
        drop_c = storage.col()[~keep]
        removed_row = removed_row.at[drop_r].add(1)
        removed_col = removed_col.at[drop_c].add(1)
        if storage._rowcount is not None:
            rowcount = storage._rowcount - removed_row
        if storage._colcount is not None:
            colcount = storage._colcount - removed_col

    from .storage import SparseStorage
    out = SparseStorage(row=row, col=col, value=value,
                        sparse_sizes=src.sparse_sizes(),
                        rowcount=rowcount, colcount=colcount,
                        is_sorted=True, trust_data=True)
    return src.from_storage(out)


def set_diag(src: SparseTensor, values: Optional[jax.Array] = None,
             k: int = 0) -> SparseTensor:
    src = remove_diag(src, k)
    row, col, value = src.coo()
    M, N = src.sparse_sizes()

    # diagonal positions that fall inside the matrix
    start = max(0, -k)
    num_diag = max(0, min(M, N - k) - start)
    d = jnp.arange(start, start + num_diag, dtype=row.dtype)

    new_row = jnp.concatenate([row, d])
    new_col = jnp.concatenate([col, d + k])

    new_value = None
    if value is not None:
        if values is None:
            fill = jnp.ones((num_diag,) + value.shape[1:], dtype=value.dtype)
        else:
            fill = jnp.asarray(values)[:num_diag].astype(value.dtype)
        new_value = jnp.concatenate([value, fill])
    elif values is not None:
        values = jnp.asarray(values)[:num_diag]
        new_value = jnp.concatenate([
            jnp.ones((row.shape[0],) + values.shape[1:], dtype=values.dtype),
            values])

    return SparseTensor(row=new_row, col=new_col, value=new_value,
                        sparse_sizes=(M, N), is_sorted=False)


def fill_diag(src: SparseTensor, fill_value: float, k: int = 0) -> SparseTensor:
    M, N = src.sparse_sizes()
    num_diag = max(0, min(M, N - k) - max(0, -k))
    value = src.storage.value()
    dtype = value.dtype if value is not None else jnp.float32
    return set_diag(src, jnp.full((num_diag,), fill_value, dtype=dtype), k)


def get_diag(src: SparseTensor) -> jax.Array:
    """Dense main diagonal (zeros where no entry is stored)."""
    row, col, value = src.coo()
    if value is None:
        value = jnp.ones((row.shape[0],), dtype=jnp.float32)
    M = src.sparse_size(0)
    on_diag = row == col
    out_shape = (M,) + value.shape[1:]
    out = jnp.zeros(out_shape, dtype=value.dtype)
    return out.at[jnp.where(on_diag, row, M)].add(
        jnp.where(on_diag.reshape((-1,) + (1,) * (value.ndim - 1)), value, 0),
        mode="drop")


SparseTensor.remove_diag = remove_diag
SparseTensor.set_diag = set_diag
SparseTensor.fill_diag = fill_diag
SparseTensor.get_diag = get_diag
