"""Reductions over all entries, dim 0 (columns), dim 1 (rows) and value dims
(reference parity: ``paddle_sparse/reduce.py``).

dim-0 reduces scatter over ``col`` (unsorted ids), dim-1 reduces
segment-reduce over the CSR rowptr — both lower to XLA segment reductions.
"""
from typing import Optional

import jax
import jax.numpy as jnp

from .ops.segment import scatter_reduce, segment_csr
from .tensor import SparseTensor


def reduction(src: SparseTensor, dim: Optional[int] = None,
              reduce: str = "sum") -> jax.Array:
    value = src.storage.value()

    if dim is None:
        if value is not None:
            if reduce in ("sum", "add"):
                return value.sum()
            if reduce == "mean":
                return value.mean()
            if reduce == "min":
                return value.min()
            if reduce == "max":
                return value.max()
            raise ValueError(f"unknown reduction {reduce!r}")
        if reduce in ("sum", "add"):
            return jnp.asarray(src.nnz(), dtype=src.dtype())
        if reduce in ("mean", "min", "max"):
            return jnp.asarray(1, dtype=src.dtype())
        raise ValueError(f"unknown reduction {reduce!r}")

    if dim < 0:
        dim = src.dim() + dim

    if dim == 0:
        if value is not None:
            return scatter_reduce(value, src.storage.col(), src.size(1),
                                  reduce)
        if reduce in ("sum", "add"):
            return src.storage.colcount().astype(src.dtype())
        if reduce in ("mean", "min", "max"):
            return jnp.ones((src.size(1),), dtype=src.dtype())
        raise ValueError(f"unknown reduction {reduce!r}")

    if dim == 1:
        if value is not None:
            return segment_csr(value, src.storage.rowptr(), reduce=reduce)
        if reduce in ("sum", "add"):
            return src.storage.rowcount().astype(src.dtype())
        if reduce in ("mean", "min", "max"):
            return jnp.ones((src.size(0),), dtype=src.dtype())
        raise ValueError(f"unknown reduction {reduce!r}")

    if dim > 1 and value is not None:
        if reduce in ("sum", "add"):
            return value.sum(axis=dim - 1)
        if reduce == "mean":
            return value.mean(axis=dim - 1)
        if reduce == "min":
            return value.min(axis=dim - 1)
        if reduce == "max":
            return value.max(axis=dim - 1)
    raise ValueError(f"cannot reduce dim {dim} with reduce={reduce!r}")


def sum(src: SparseTensor, dim: Optional[int] = None) -> jax.Array:  # noqa: A001
    return reduction(src, dim, reduce="sum")


def mean(src: SparseTensor, dim: Optional[int] = None) -> jax.Array:
    return reduction(src, dim, reduce="mean")


def min(src: SparseTensor, dim: Optional[int] = None) -> jax.Array:  # noqa: A001
    return reduction(src, dim, reduce="min")


def max(src: SparseTensor, dim: Optional[int] = None) -> jax.Array:  # noqa: A001
    return reduction(src, dim, reduce="max")


SparseTensor.sum = sum
SparseTensor.mean = mean
SparseTensor.min = min
SparseTensor.max = max
