"""Distributed beam decoding: shard the batch over the mesh "data" axis,
run the on-device prefix beam search per shard, all-gather results for
reporting (new TPU-side design; SURVEY.md §2.7 — the reference decodes in a
single Python process).

Beam search is embarrassingly parallel over the batch, so the only
collective is the final gather of (prefixes, lengths, scores).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from wavenet_speech_tpu.decoding.ctc_beam_device import ctc_beam_search_jax


def distributed_beam_decode(mesh: Mesh, logits, lengths=None,
                            beam_width: int = 7, blank: int = 0,
                            max_label_len: Optional[int] = None):
    """(B, T, C) logits -> (prefixes, plens, scores) with B sharded over the
    "data" axis; outputs gathered to all devices.

    B must be divisible by the data-axis size."""
    B, T, C = logits.shape
    data = mesh.shape["data"]
    if B % data:
        raise ValueError(f"batch {B} not divisible by data axis {data}")
    lengths = (jnp.full((B,), T, jnp.int32) if lengths is None
               else jnp.asarray(lengths, jnp.int32))

    @partial(shard_map, mesh=mesh,
             in_specs=(P("data"), P("data")),
             out_specs=(P(), P(), P()),
             check_vma=False)
    def run(lg, ln):
        pfx, pl, sc = ctc_beam_search_jax(lg, ln, beam_width=beam_width,
                                          blank=blank,
                                          max_label_len=max_label_len)
        # gather shards so every host sees the full result set
        return (jax.lax.all_gather(pfx, "data", tiled=True),
                jax.lax.all_gather(pl, "data", tiled=True),
                jax.lax.all_gather(sc, "data", tiled=True))

    return run(jnp.asarray(logits, jnp.float32), lengths)
