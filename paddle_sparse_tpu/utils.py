"""Small shared helpers for the eager facade.

Replaces the reference's ``utils.py`` (``/root/reference/paddle_sparse/utils.py``)
whose only job was to route ``index_sort`` to ``pyg_lib`` when available; here
sorting is XLA's radix/stable sort, and the flat ``row*N + col`` key trick is
replaced by a (row, col) lexicographic sort so no int64 key overflow is
possible (SURVEY.md §7 design note 5).
"""
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def index_sort(inputs: jax.Array, max_value=None) -> Tuple[jax.Array, jax.Array]:
    """Stable ascending sort; returns (sorted, permutation).

    ``max_value`` is accepted for API parity with the reference
    (``utils.py:14-23``) but unused — XLA's sort does not need a key bound.
    """
    inputs = jnp.asarray(inputs)
    perm = jnp.argsort(inputs, stable=True)
    return inputs[perm], perm


def lexsort_rowcol(row: jax.Array, col: jax.Array) -> jax.Array:
    """Permutation sorting by (row, col) lexicographically, stably."""
    return jnp.lexsort((col, row))


def is_row_col_sorted(row: jax.Array, col: jax.Array) -> bool:
    """Eagerly check strict CSR canonical order allowing duplicates."""
    if row.shape[0] < 2:
        return True
    r0, r1 = row[:-1], row[1:]
    c0, c1 = col[:-1], col[1:]
    ok = (r1 > r0) | ((r1 == r0) & (c1 >= c0))
    return bool(ok.all())


def is_scalar(other: Any) -> bool:
    return isinstance(other, (int, float)) or np.isscalar(other)


def as_index_array(x, dtype=None) -> jax.Array:
    """Coerce list/ndarray/jax array to an integer jnp array."""
    arr = jnp.asarray(x)
    if not jnp.issubdtype(arr.dtype, jnp.integer) and not jnp.issubdtype(arr.dtype, jnp.bool_):
        raise ValueError(f"expected integer index array, got dtype {arr.dtype}")
    if dtype is not None:
        arr = arr.astype(dtype)
    return arr


def same_buffer(a: jax.Array, b: jax.Array) -> bool:
    """True when two arrays alias the same device buffer (facade copy()
    shares buffers; clone() does not — mirrors ``data_ptr`` checks in
    ``/root/reference/test/test_storage.py``)."""
    if a is b:
        return True
    try:
        return a.unsafe_buffer_pointer() == b.unsafe_buffer_pointer()
    except Exception:
        return False
