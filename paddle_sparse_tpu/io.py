"""Persistence: save/load sparse matrices (checkpoint/resume support).

The reference has no persistence story beyond scipy conversion (SURVEY.md
§5).  Here both representations serialize natively:

* ``save_npz`` / ``load_npz``: host-side ``.npz`` with index arrays, values
  and static metadata — portable, no framework needed to reload.
* ``PaddedCOO`` is a registered pytree, so it also drops into any orbax /
  flax checkpointing of a larger train state for free; ``to_state_dict`` /
  ``from_state_dict`` expose the leaves explicitly for that path.
"""
from typing import Dict

import jax.numpy as jnp
import numpy as np

from .core.matrix import PaddedCOO
from .tensor import SparseTensor


def save_npz(path: str, tensor: SparseTensor) -> None:
    row, col, value = tensor.coo()
    payload = {
        "row": np.asarray(row),
        "col": np.asarray(col),
        "sparse_sizes": np.asarray(tensor.sparse_sizes()),
        "has_value": np.asarray(value is not None),
    }
    if value is not None:
        payload["value"] = np.asarray(value)
    np.savez_compressed(path, **payload)


def load_npz(path: str) -> SparseTensor:
    data = np.load(path)
    value = data["value"] if bool(data["has_value"]) else None
    M, N = (int(v) for v in data["sparse_sizes"])
    return SparseTensor(row=jnp.asarray(data["row"]),
                        col=jnp.asarray(data["col"]),
                        value=None if value is None else jnp.asarray(value),
                        sparse_sizes=(M, N), is_sorted=True, trust_data=True)


def to_state_dict(mat: PaddedCOO) -> Dict[str, np.ndarray]:
    out = {"row": np.asarray(mat.row), "col": np.asarray(mat.col),
           "nnz": np.asarray(mat.nnz), "shape": np.asarray(mat.shape)}
    if mat.value is not None:
        out["value"] = np.asarray(mat.value)
    return out


def from_state_dict(state: Dict[str, np.ndarray]) -> PaddedCOO:
    value = state.get("value")
    M, N = (int(v) for v in state["shape"])
    return PaddedCOO(row=jnp.asarray(state["row"]),
                     col=jnp.asarray(state["col"]),
                     value=None if value is None else jnp.asarray(value),
                     nnz=jnp.asarray(state["nnz"]), shape=(M, N))


SparseTensor.save_npz = save_npz
SparseTensor.load_npz = staticmethod(load_npz)
