"""Feature flags and shared type aliases.

TPU-native analogue of the reference's optional-dependency probe
(``/root/reference/paddle_sparse/typing.py:3-11``): instead of probing for
``pyg_lib`` we probe for the JAX backends / optional accelerant libraries that
matter here.
"""
from typing import Tuple, Union

import jax
import numpy as np

# True when a real TPU backend is attached to this process.
try:  # pragma: no cover - depends on runtime platform
    WITH_TPU = any(d.platform == "tpu" for d in jax.devices())
except Exception:  # pragma: no cover
    WITH_TPU = False

# True when 64-bit dtypes are enabled (tests enable this; TPU prod path
# runs int32/f32/bf16 and leaves this off).
def with_x64() -> bool:
    return bool(jax.config.jax_enable_x64)


Shape2D = Tuple[int, int]
ArrayLike = Union[jax.Array, np.ndarray, list, tuple]
