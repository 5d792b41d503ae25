"""Reference GNN model families built on the sparse core.

The reference library ships no models (SURVEY.md §1: "no model code"); these
exist to (a) prove the end-to-end training path (SURVEY.md §7 step 3's
"one model running" milestone) and (b) give library users the standard
sparse-matmul-centric architectures: GCN, GraphSAGE, GIN, GAT, APPNP.
"""
from .gcn import (GCN, GraphSAGE, GIN, GAT, APPNP, edge_softmax,
                  gcn_normalize, init_gcn, init_sage, init_gin, init_gat,
                  init_appnp)

__all__ = ["GCN", "GraphSAGE", "GIN", "GAT", "APPNP", "edge_softmax",
           "gcn_normalize", "init_gcn", "init_sage", "init_gin", "init_gat",
           "init_appnp"]
