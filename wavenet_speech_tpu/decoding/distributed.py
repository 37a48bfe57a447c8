"""Distributed beam decoding (new TPU-side design; SURVEY.md §2.7 — the
reference decodes in a single Python process, delegating real CTC prefix
search to the native C++ `ctcdecode` package, pretrain_rnn.py:23).

Two parallel decompositions, composable over one mesh:

* batch sharding ("data" axis): beam search is embarrassingly parallel over
  sequences; the only collective is the final all_gather of results
  (`distributed_beam_decode`).

* sequence sharding ("seq" axis): for logits that are already time-sharded
  across chips (produced by a halo-exchange sequence-parallel forward over
  signals too long for one chip's HBM), the *hypothesis state itself* —
  (prefixes, plens, pb, pnb, times) — is exchanged between chips with
  `lax.ppermute`: chip s decodes its local frame range starting from the
  beam state chip s-1 handed it, then permutes the state to chip s+1; the
  final chip broadcasts the finished beams with a psum-based select
  (`seq_sharded_beam_decode`). Decoding stays sequential in time (CTC prefix
  search is a strict left-to-right recurrence) — the win is that the logits
  never need to be gathered to one chip, and the batch/data axis still runs
  in parallel throughout.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from wavenet_speech_tpu.decoding.ctc_beam_device import (
    beam_finalize,
    beam_init,
    beam_scan,
    ctc_beam_search_jax,
)


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


def seq_sharded_beam_decode(mesh: Mesh, logits, lengths=None,
                            beam_width: int = 7, blank: int = 0,
                            max_label_len: Optional[int] = None,
                            data_sharded: bool = False,
                            log_input: bool = False):
    """Decode (B, T, C) logits whose TIME axis is sharded over the mesh's
    "seq" axis, carrying the beam hypothesis state across shards via
    ppermute (the north-star "beam-search hypothesis state exchanged via
    collectives", BASELINE.json).

    T must be divisible by the seq-axis size (pad logits with frames past
    `lengths`; carried-through frames are free). With data_sharded=True the
    batch axis is simultaneously sharded over "data".

    Returns (prefixes (B, W, S), plens (B, W), scores (B, W), times
    (B, W, S)), sorted best-first, replicated over "seq".
    """
    logits = jnp.asarray(logits, jnp.float32)
    B, T, C = logits.shape
    n_seq = mesh.shape["seq"]
    if T % n_seq:
        raise ValueError(f"time axis {T} not divisible by seq axis {n_seq}")
    if data_sharded and B % mesh.shape["data"]:
        raise ValueError(f"batch {B} not divisible by data axis")
    lengths = (jnp.full((B,), T, jnp.int32) if lengths is None
               else jnp.asarray(lengths, jnp.int32))
    lp = logits if log_input else jax.nn.log_softmax(logits, axis=-1)
    S = int(max_label_len) if max_label_len is not None else T
    W = beam_width
    batch_ax = "data" if data_sharded else None
    lg_spec = P(batch_ax, "seq", None)
    out_spec = P(batch_ax)

    @partial(shard_map, mesh=mesh, in_specs=(lg_spec, P(batch_ax)),
             out_specs=(out_spec, out_spec, out_spec, out_spec),
             check_vma=False)
    def run(lg, ln):
        i = lax.axis_index("seq")
        Bl, Tl = lg.shape[0], lg.shape[1]
        ts = jnp.arange(Tl) + i * Tl  # global frame indices of this shard
        state = jax.vmap(lambda _: beam_init(W, S))(jnp.arange(Bl))

        scan = jax.vmap(
            partial(beam_scan, blank=blank), in_axes=(0, 0, None, 0))
        fwd = [(j, j + 1) for j in range(n_seq - 1)]
        for s in range(n_seq):
            # only the active shard advances the state; everyone else
            # passes it through untouched (lax.cond picks one branch per
            # device at runtime — shard_map bodies are per-device programs)
            state = lax.cond(i == s,
                             lambda st: scan(st, lg, ts, ln),
                             lambda st: st, state)
            if s < n_seq - 1:  # hand the hypothesis state to the next shard
                state = jax.tree_util.tree_map(
                    lambda x: lax.ppermute(x, "seq", fwd), state)
        # the last shard holds the finished beams; broadcast via psum-select
        state = jax.tree_util.tree_map(
            lambda x: lax.psum(
                jnp.where(
                    jnp.reshape(i == n_seq - 1, (1,) * x.ndim),
                    x, jnp.zeros_like(x)),
                "seq"),
            state)
        return jax.vmap(beam_finalize)(state)

    return run(lp, lengths)
