"""Device-mesh helpers.

All distribution in this framework is expressed as JAX collectives over a
named ``Mesh`` (SURVEY.md §5: "no hand-rolled NCCL/MPI-equivalent") — XLA
lowers them onto ICI within a slice and DCN across slices.
"""
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "x") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices.

    Falls back to the virtual CPU device pool when the default backend has
    too few devices (single-chip dev box driving a multi-chip dry run)."""
    devices = jax.devices()
    if n_devices is not None and len(devices) < n_devices:
        try:
            cpu = jax.devices("cpu")
        except RuntimeError:
            cpu = []
        if len(cpu) >= n_devices:
            devices = cpu
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_rows(mesh: Mesh, array: jax.Array, axis_name: str = "x") -> jax.Array:
    """Place ``array`` row-sharded over the mesh axis."""
    spec = P(axis_name, *([None] * (array.ndim - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, array: jax.Array) -> jax.Array:
    return jax.device_put(array, NamedSharding(mesh, P()))
