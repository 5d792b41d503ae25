"""Functional tuple-API interop (reference parity:
``paddle_sparse/convert.py``): scipy and jax.experimental.sparse bridges."""
import jax.numpy as jnp
import numpy as np
import scipy.sparse


def to_jax_sparse(index, value, m: int, n: int):
    """(index, value) tuple -> ``jax.experimental.sparse.BCOO``."""
    from jax.experimental import sparse as jsparse
    indices = jnp.stack([index[0], index[1]], axis=1)
    return jsparse.BCOO((jnp.asarray(value), indices), shape=(m, n))


def from_jax_sparse(A):
    """``BCOO`` -> (index, value) tuple."""
    return jnp.stack([A.indices[:, 0], A.indices[:, 1]], axis=0), A.data


def to_scipy(index, value, m: int, n: int):
    row, col = np.asarray(index[0]), np.asarray(index[1])
    return scipy.sparse.coo_matrix((np.asarray(value), (row, col)), (m, n))


def from_scipy(A):
    A = A.tocoo()
    row = jnp.asarray(A.row.astype(np.int64))
    col = jnp.asarray(A.col.astype(np.int64))
    value = jnp.asarray(A.data)
    return jnp.stack([row, col], axis=0), value


# Aliases keeping the reference's import names working after a rename of the
# backing framework (paddle -> jax).
to_paddle_sparse = to_jax_sparse
from_paddle_sparse = from_jax_sparse
