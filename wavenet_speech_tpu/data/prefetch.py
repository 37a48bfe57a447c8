"""Host->device prefetching: overlap generator CPU work and PCIe/ICI
transfer with TPU compute (replaces the reference's `.cuda()` toggles on
loaders, utils/loaders.py:109-112 — there is no reference counterpart for
overlap; this is new TPU-side design).

`prefetch_to_device` keeps `size` batches in flight: batches are converted
to jnp arrays with `jax.device_put` (optionally with a NamedSharding so DP
batches land pre-sharded across the mesh) while the previous step computes.
"""
from __future__ import annotations

import collections
import itertools
from typing import Iterator, Optional

import jax

from wavenet_speech_tpu.data.common import Batch


def batch_to_device(batch: Batch, sharding: Optional[object] = None):
    """Convert a host Batch to device arrays (dict pytree). With a
    NamedSharding, arrays are laid out across the mesh on the way in."""
    tree = {
        "signal": batch.signal,
        "labels": batch.labels,
        "label_lengths": batch.label_lengths,
        "signal_lengths": batch.signal_lengths,
    }
    if sharding is None:
        return jax.device_put(tree)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding.for_array(x) if hasattr(sharding, "for_array") else sharding),
        tree,
    )


def prefetch_to_device(it: Iterator[Batch], size: int = 2,
                       sharding: Optional[object] = None):
    """Wrap a Batch iterator so device transfer runs ahead of consumption.

    jax.device_put is async (returns immediately with the transfer enqueued),
    so holding a small deque of already-put batches gives double buffering
    without threads."""
    buf = collections.deque()
    it = iter(it)
    try:
        for _ in range(size):
            buf.append(batch_to_device(next(it), sharding))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(batch_to_device(next(it), sharding))
        except StopIteration:
            pass
        yield out
