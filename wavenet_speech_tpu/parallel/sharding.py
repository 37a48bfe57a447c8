"""Sharding rules for parameter pytrees.

Strategy (scaling-book recipe: pick a mesh, annotate shardings, let XLA
insert collectives):

* DP: batch dim of every array in the input batch -> "data"; params
  replicated. XLA turns the gradient sum into a psum over ICI.
* TP ("model" axis): channel-shard the wide conv kernels. For a conv kernel
  (K, C_in, C_out) we shard C_out; for the fused gate kernels this splits
  both halves evenly only if C_out_total is divisible by 2*model — we
  therefore shard the LAST dim and keep C_in replicated (pure output-channel
  parallelism: each chip computes a channel slice; the next layer's
  contraction over C_in triggers an XLA-inserted all-gather/reduce —
  standard 1D Megatron-style sharding for conv stacks).
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_leaf(path_str: str, leaf, model_axis: bool) -> P:
    if not model_axis:
        return P()
    shape = leaf.shape
    if len(shape) == 0:
        return P()
    # channel-shard the trailing (output-channel) dim when it is large and
    # divisible; biases follow their kernel's output dim
    if len(shape) >= 2:
        return P(*([None] * (len(shape) - 1)), "model")
    return P("model")


def param_shardings(mesh: Mesh, params: Any, model_parallel: bool = False):
    """NamedSharding pytree for params: replicated (DP-only) or
    output-channel sharded over the model axis.

    Leaves whose trailing dim is not divisible by the model-axis size are
    replicated (XLA requires divisibility for even sharding)."""
    model_size = mesh.shape["model"]

    def leaf_sharding(path, leaf):
        if not model_parallel or model_size == 1:
            return NamedSharding(mesh, P())
        spec = _spec_for_leaf(jax.tree_util.keystr(path), leaf, True)
        # check divisibility of every sharded dim
        for dim, axis in enumerate(spec):
            if axis == "model" and leaf.shape[dim] % model_size:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def shard_params(mesh: Mesh, params: Any, model_parallel: bool = False):
    """Place a params pytree onto the mesh according to param_shardings."""
    shardings = param_shardings(mesh, params, model_parallel)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_batch(mesh: Mesh, batch: Any):
    """Place a batch pytree with the leading dim sharded over "data"."""
    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, NamedSharding(mesh, P("data")))

    return jax.tree_util.tree_map(put, batch)
