"""Functional tuple-API sparse + sparse addition (upstream
``torch_sparse.spadd`` contract)."""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .coalesce import coalesce


def spadd(indexA, valueA: Optional[jax.Array], indexB,
          valueB: Optional[jax.Array], m: int, n: int,
          ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Entry-wise A + B of two (m, n) sparse matrices in tuple form."""
    index = jnp.concatenate([jnp.asarray(indexA), jnp.asarray(indexB)],
                            axis=1)
    value = None
    if valueA is not None and valueB is not None:
        value = jnp.concatenate([valueA, valueB])
    return coalesce(index, value, m, n, op="add")
