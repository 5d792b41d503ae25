"""Boolean-mask selection.

API contract from the reference (``/root/reference/paddle_sparse/
masked_select.py``); the formulation is this library's own: a per-edge
predicate plus a prefix-sum relabel of the masked axis.  Because dropping
edges preserves the canonical (row, col) order, BOTH axes filter directly
in CSR order — the reference's dim-1 path detoured through the CSC view
and re-sorted; here no permutation or sort is needed at all.
"""
import jax.numpy as jnp

from .storage import SparseStorage, get_layout
from .tensor import SparseTensor


def masked_select(src: SparseTensor, dim: int, mask) -> SparseTensor:
    dim = src.dim() + dim if dim < 0 else dim
    mask = jnp.asarray(mask)
    assert mask.ndim == 1

    if dim in (0, 1):
        row, col, value = src.coo()
        axis = row if dim == 0 else col
        keep = mask[axis]                       # per-edge predicate
        relabel = (jnp.cumsum(mask) - 1).astype(axis.dtype)
        new_axis = relabel[axis[keep]]
        other = (col if dim == 0 else row)[keep]
        n_keep = int(mask.sum())
        if value is not None:
            value = value[keep]
        if dim == 0:
            storage = SparseStorage(
                row=new_axis, col=other, value=value,
                sparse_sizes=(n_keep, src.sparse_size(1)),
                rowcount=src.storage.rowcount()[mask],
                is_sorted=True, trust_data=True)
        else:
            storage = SparseStorage(
                row=other, col=new_axis, value=value,
                sparse_sizes=(src.sparse_size(0), n_keep),
                colcount=src.storage.colcount()[mask],
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
