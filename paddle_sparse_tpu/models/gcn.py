"""Graph neural network model families on the PaddedCOO core.

Pure-functional JAX models (params pytrees + apply functions): the dense
transforms ride the MXU (bf16-friendly matmuls), the neighborhood
aggregations are this library's SpMM.  All apply functions are jittable and
differentiable end-to-end.
"""
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.matrix import PaddedCOO


# ---------------------------------------------------------------------------
# graph normalization
# ---------------------------------------------------------------------------
def gcn_normalize(adj: PaddedCOO, add_self_loops: bool = False) -> PaddedCOO:
    """Symmetric GCN normalization ``D^-1/2 (A) D^-1/2`` on the padded core.

    (Self-loops should be added on the eager side before padding —
    ``set_diag`` — so capacity stays static; ``add_self_loops`` flags that
    the caller already did.)
    """
    deg = adj.degree().astype(jnp.float32)
    inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1.0)), 0.0)
    value = adj.value
    if value is None:
        value = jnp.where(adj.valid_mask(), 1.0, 0.0)
    row_scale = inv_sqrt[jnp.clip(adj.row, 0, adj.M - 1)]
    col_scale = inv_sqrt[jnp.clip(adj.col, 0, adj.M - 1)]
    new_value = value * row_scale * col_scale
    return adj.with_value(new_value)


def _dense(key, d_in, d_out):
    w_key, _ = jax.random.split(key)
    scale = (2.0 / d_in) ** 0.5
    return {"w": jax.random.normal(w_key, (d_in, d_out), jnp.float32) * scale,
            "b": jnp.zeros((d_out,), jnp.float32)}


# ---------------------------------------------------------------------------
# GCN
# ---------------------------------------------------------------------------
def init_gcn(key, in_dim: int, hidden: int, out_dim: int,
             num_layers: int = 2) -> Dict[str, Any]:
    keys = jax.random.split(key, num_layers)
    dims = [in_dim] + [hidden] * (num_layers - 1) + [out_dim]
    return {"layers": [_dense(k, dims[i], dims[i + 1])
                       for i, k in enumerate(keys)]}


def GCN(params, adj: PaddedCOO, x: jax.Array) -> jax.Array:
    """Kipf-Welling GCN: ``H' = relu(A_norm @ H @ W)`` stacked."""
    h = x
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        h = adj.spmm(h)
        h = h @ layer["w"] + layer["b"]
        if i < n - 1:
            h = jax.nn.relu(h)
    return h


# ---------------------------------------------------------------------------
# GraphSAGE (mean aggregator)
# ---------------------------------------------------------------------------
def init_sage(key, in_dim: int, hidden: int, out_dim: int,
              num_layers: int = 2) -> Dict[str, Any]:
    keys = jax.random.split(key, 2 * num_layers)
    dims = [in_dim] + [hidden] * (num_layers - 1) + [out_dim]
    return {"self": [_dense(keys[2 * i], dims[i], dims[i + 1])
                     for i in range(num_layers)],
            "neigh": [_dense(keys[2 * i + 1], dims[i], dims[i + 1])
                      for i in range(num_layers)]}


def GraphSAGE(params, adj: PaddedCOO, x: jax.Array) -> jax.Array:
    h = x
    n = len(params["self"])
    for i in range(n):
        agg = adj.spmm(h, reduce="mean")
        h = (h @ params["self"][i]["w"] + params["self"][i]["b"]
             + agg @ params["neigh"][i]["w"] + params["neigh"][i]["b"])
        if i < n - 1:
            h = jax.nn.relu(h)
    return h


# ---------------------------------------------------------------------------
# GIN
# ---------------------------------------------------------------------------
def init_gin(key, in_dim: int, hidden: int, out_dim: int,
             num_layers: int = 2) -> Dict[str, Any]:
    keys = jax.random.split(key, 2 * num_layers)
    dims = [in_dim] + [hidden] * (num_layers - 1) + [out_dim]
    return {"mlp1": [_dense(keys[2 * i], dims[i], dims[i + 1])
                     for i in range(num_layers)],
            "mlp2": [_dense(keys[2 * i + 1], dims[i + 1], dims[i + 1])
                     for i in range(num_layers)],
            "eps": jnp.zeros((num_layers,), jnp.float32)}


def GIN(params, adj: PaddedCOO, x: jax.Array) -> jax.Array:
    h = x
    n = len(params["mlp1"])
    for i in range(n):
        agg = adj.spmm(h)
        h = (1.0 + params["eps"][i]) * h + agg
        h = jax.nn.relu(h @ params["mlp1"][i]["w"] + params["mlp1"][i]["b"])
        h = h @ params["mlp2"][i]["w"] + params["mlp2"][i]["b"]
        if i < n - 1:
            h = jax.nn.relu(h)
    return h


# ---------------------------------------------------------------------------
# APPNP (predict-then-propagate)
# ---------------------------------------------------------------------------
def init_appnp(key, in_dim: int, hidden: int, out_dim: int) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    return {"lin1": _dense(k1, in_dim, hidden),
            "lin2": _dense(k2, hidden, out_dim)}


def APPNP(params, adj: PaddedCOO, x: jax.Array, k: int = 10,
          alpha: float = 0.1) -> jax.Array:
    h = jax.nn.relu(x @ params["lin1"]["w"] + params["lin1"]["b"])
    h = h @ params["lin2"]["w"] + params["lin2"]["b"]

    def body(z, _):
        z = (1 - alpha) * adj.spmm(z) + alpha * h
        return z, None

    z, _ = jax.lax.scan(body, h, None, length=k)
    return z
