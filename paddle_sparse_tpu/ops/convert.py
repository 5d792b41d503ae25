"""Index-format conversions: COO row indices <-> CSR row pointers.

TPU-native replacement for the reference's native custom ops
(``/root/reference/csrc/convert.cpp:37-76``, ``csrc/cpu/convert_cpu.cpp:6-48``,
``csrc/cuda/convert_cuda.cu:6-68``).  The reference needs a C++/CUDA extension
because the conversions are sequential scans; on TPU both directions are a
single vectorized ``searchsorted`` and therefore plain XLA:

* ``ind2ptr(row, M)``: for sorted ``row``, ``ptr[i] = #{k : row[k] < i}``,
  i.e. ``searchsorted(row, arange(M+1), side='left')``.
* ``ptr2ind(ptr, E)``: ``ind[e] = max{i : ptr[i] <= e}``,
  i.e. ``searchsorted(ptr, arange(E), side='right') - 1``.

Both are shape-polymorphic only in the *static* sense: ``M`` / ``E`` must be
Python ints, so the same functions work eagerly (exact nnz) and under ``jit``
(padded capacity).  Matches the reference contract including empty inputs
(``test/test_storage.py:16-32``).
"""
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(1,))
def ind2ptr(row: jax.Array, M: int) -> jax.Array:
    """Sorted COO row indices -> CSR row pointer of length ``M + 1``."""
    row = jnp.asarray(row)
    positions = jnp.arange(M + 1, dtype=row.dtype)
    return jnp.searchsorted(row, positions, side="left").astype(row.dtype)


@partial(jax.jit, static_argnums=(1,))
def ptr2ind(ptr: jax.Array, E: int) -> jax.Array:
    """CSR row pointer -> COO row indices of length ``E`` (= ptr[-1])."""
    ptr = jnp.asarray(ptr)
    positions = jnp.arange(E, dtype=ptr.dtype)
    ind = jnp.searchsorted(ptr, positions, side="right") - 1
    return ind.astype(ptr.dtype)


@partial(jax.jit, static_argnums=(1,))
def ptr2ind_capped(ptr: jax.Array, capacity: int) -> jax.Array:
    """Like :func:`ptr2ind` but for padded buffers: positions beyond
    ``ptr[-1]`` map to ``len(ptr) - 1`` (one-past-last row), the canonical
    padding row used by the static-shape core so padding sorts last."""
    ptr = jnp.asarray(ptr)
    positions = jnp.arange(capacity, dtype=ptr.dtype)
    ind = jnp.searchsorted(ptr, positions, side="right") - 1
    M = ptr.shape[0] - 1
    return jnp.where(positions < ptr[-1], ind, M).astype(ptr.dtype)
