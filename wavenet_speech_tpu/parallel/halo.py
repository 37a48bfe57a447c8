"""Sequence parallelism for dilated conv stacks via halo exchange.

No reference counterpart (the reference handles long-range context purely by
dilation stacking on one device, SURVEY.md §5) — this is new TPU design:
shard the time axis over the "seq" mesh axis and, at every conv, exchange
only the (k-1)*d boundary frames between neighboring shards with
``lax.ppermute``. The causal-conv analogue of context parallelism: a static
nearest-neighbor exchange per layer, far cheaper than ring attention
(there is no attention in the main path).

Mechanism: ops/conv.py consults `current_seq_axis()`; inside a
``shard_map`` wrapped with `seq_axis(...)` every causal/non-causal conv
pulls its left (and for non-causal, right) halo from the neighbor shard.
ppermute zero-fills shards with no source, which exactly reproduces the
zero padding at the global sequence edges.
"""
from __future__ import annotations

import contextlib
import threading
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

_state = threading.local()


def current_seq_axis() -> Optional[str]:
    return getattr(_state, "axis", None)


@contextlib.contextmanager
def seq_axis(axis_name: str):
    """Mark the (trace-time) region as running under a sequence-sharded
    shard_map axis; convs inside will halo-exchange."""
    prev = current_seq_axis()
    _state.axis = axis_name
    try:
        yield
    finally:
        _state.axis = prev


def _shift_from_prev(tail: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Send each shard's tail to its right neighbor; shard 0 receives zeros."""
    n = lax.psum(1, axis)
    return lax.ppermute(tail, axis, [(i, i + 1) for i in range(n - 1)])


def _shift_from_next(head: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Send each shard's head to its left neighbor; last shard receives zeros."""
    n = lax.psum(1, axis)
    return lax.ppermute(head, axis, [(i + 1, i) for i in range(n - 1)])


def halo_pad(x: jnp.ndarray, left: int, right: int, axis: str) -> jnp.ndarray:
    """Concatenate left/right halos from neighbor shards onto the local time
    axis. Requires the halo to fit in one shard (multi-hop exchange is not
    implemented; with L_shard >= receptive-field halos this always holds)."""
    L = x.shape[1]
    if max(left, right) > L:
        raise ValueError(
            f"halo ({left},{right}) exceeds sequence shard length {L}; "
            f"use fewer seq shards or longer signals")
    parts = []
    if left > 0:
        parts.append(_shift_from_prev(x[:, L - left:, :], axis))
    parts.append(x)
    if right > 0:
        parts.append(_shift_from_next(x[:, :right, :], axis))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x


def seq_sharded_apply(apply_fn, mesh: Mesh, params, x,
                      data_sharded: bool = True):
    """Run `apply_fn(params, x)` with x sharded over (data, seq) and halo
    exchange at every conv. Model params are replicated across seq/model.

    apply_fn must be shape-preserving on the time axis (all our conv stacks
    are; the classifier's AvgPool requires L_shard % pool == 0)."""
    in_spec_x = P("data" if data_sharded else None, "seq", None)

    @partial(shard_map, mesh=mesh, in_specs=(P(), in_spec_x),
             out_specs=in_spec_x, check_vma=False)
    def run(p, xs):
        with seq_axis("seq"):
            return apply_fn(p, xs)

    return run(params, x)
