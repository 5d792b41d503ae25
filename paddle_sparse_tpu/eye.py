"""Functional identity matrix (reference parity: ``paddle_sparse/eye.py``)."""
import jax.numpy as jnp


def eye(m: int, dtype=None, device=None):
    """Identity as an ``(index, value)`` tuple."""
    row = jnp.arange(m)
    index = jnp.stack([row, row], axis=0)
    value = jnp.ones((m,), dtype=dtype)
    if device is not None:
        import jax
        if isinstance(device, str):
            device = jax.devices(device)[0]
        index = jax.device_put(index, device)
        value = jax.device_put(value, device)
    return index, value
