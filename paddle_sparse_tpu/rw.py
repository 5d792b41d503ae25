"""Random-walk facade (upstream-only API: ``torch_sparse.random_walk``,
absent from the reference per ``/root/reference/README.md:45-61``)."""
from typing import Optional

import jax

from .ops.sample import random_walk as _random_walk_kernel
from .random import next_key
from .tensor import SparseTensor


def random_walk(src: SparseTensor, start, walk_length: int,
                key: Optional[jax.Array] = None) -> jax.Array:
    """Uniform random walks from ``start``: (num_start, walk_length + 1)."""
    rowptr, col, _ = src.csr()
    if key is None:
        key = next_key()
    import jax.numpy as jnp
    return _random_walk_kernel(rowptr, col,
                               jnp.asarray(start, dtype=col.dtype),
                               walk_length, key)


SparseTensor.random_walk = random_walk
