"""Library-level PRNG state for the eager facade.

JAX randomness is functional (explicit keys).  The reference API draws from
global framework state (``paddle.rand`` in ``sample.py:23``), so the eager
facade keeps a module-level key that callers can seed; every keyless call
splits off a fresh subkey.  Jittable kernels in ``ops/`` always take explicit
keys.
"""
import jax

_state = {"key": jax.random.PRNGKey(0)}


def seed(n: int) -> None:
    """Seed the facade's global PRNG stream."""
    _state["key"] = jax.random.PRNGKey(n)


def next_key() -> jax.Array:
    _state["key"], sub = jax.random.split(_state["key"])
    return sub
