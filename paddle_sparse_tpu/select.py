"""Single-index selection = narrow of length 1
(reference parity: ``paddle_sparse/select.py``)."""
from .narrow import narrow
from .tensor import SparseTensor


def select(src: SparseTensor, dim: int, idx: int) -> SparseTensor:
    return narrow(src, dim, start=idx, length=1)


SparseTensor.select = select
