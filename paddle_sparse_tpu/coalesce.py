"""Functional tuple-API coalesce (reference parity:
``paddle_sparse/coalesce.py``): sort + deduplicate an ``(index, value)`` pair,
merging duplicates with any segment reduction."""
import jax.numpy as jnp

from .storage import SparseStorage


def coalesce(index, value, m: int, n: int, op: str = "add"):
    """Row-major-sort ``index`` and merge duplicate entries with ``op``."""
    storage = SparseStorage(row=index[0], col=index[1], value=value,
                            sparse_sizes=(m, n), is_sorted=False)
    storage = storage.coalesce(reduce=op)
    return jnp.stack([storage.row(), storage.col()], axis=0), storage.value()
