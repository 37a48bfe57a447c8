"""Label-synchronous beam search — functional parity with the reference's
OpenNMT-style Beam / BeamSearchDecoder (modules/beam.py:17-130,
modules/sequence_decoders.py:45-112), used by its seq2seq decoders.

Note this is NOT CTC prefix beam search (the reference notes the same —
it delegated true CTC decoding to native ctcdecode; here that role is
filled by decoding/ctc_beam_device.py). Reference semantics reproduced
exactly, including its additive score update over *softmax probabilities*
(beam.py:113-118: beam_dist = label_dist + scores) and the first-step
symmetry-break that considers only beam 0 (beam.py:115-117).

The per-timestep advance runs as one vectorized lax.scan over time (the
reference loops in Python over T x B — its decode hot loop, SURVEY §3.5);
backpointer walks happen on host.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DEFAULT_BEAM_MAP = {"<pad>": 0, "<s>": 5, "</s>": 6}


@partial(jax.jit, static_argnames=("beam_width", "end_label"))
def _advance_scan(probs_t, beam_width: int, end_label: int):
    """probs_t: (T, C) softmaxed label distributions for ONE sequence.
    Returns per-step (scores (T, W), prev_ks (T, W), next_ys (T, W),
    done_after (T,))."""
    T, C = probs_t.shape
    W = beam_width

    def step(carry, xt):
        scores, done, t = carry
        label_dist = xt  # (C,)
        # done beams freeze: emit pad-ish no-op rows (we simply carry scores
        # and record self-backpointers so the hyp walk stops changing)
        beam_dist = label_dist[None, :] + scores[:, None]  # (W, C)
        # first step: only beam 0 participates (reference beam.py:115-117)
        first = t == 0
        mask = jnp.where(
            first,
            jnp.concatenate([jnp.zeros((1, C)),
                             jnp.full((W - 1, C), -1e9)], axis=0),
            jnp.zeros((W, C)),
        )
        flat = (beam_dist + mask).reshape(-1)
        best_scores, best_ids = lax.top_k(flat, W)
        prev_k = best_ids // C
        next_y = best_ids - prev_k * C

        new_scores = jnp.where(done, scores, best_scores)
        prev_k = jnp.where(done, jnp.arange(W), prev_k)
        next_y = jnp.where(done, jnp.zeros((W,), next_y.dtype), next_y)
        new_done = jnp.logical_or(done, next_y[0] == end_label)
        return (new_scores, new_done, t + 1), (new_scores, prev_k, next_y,
                                               new_done)

    init = (jnp.zeros((W,)), jnp.asarray(False), jnp.asarray(0))
    _, ys = lax.scan(step, init, probs_t)
    return ys


class Beam:
    """Host-side view of one decoded sequence's beam (API parity with
    reference modules/beam.py: sort_best / get_best / get_hyp)."""

    def __init__(self, scores, prev_ks, next_ys, done_after):
        self.scores = np.asarray(scores[-1])
        self.prev_Ks = np.asarray(prev_ks)
        self.next_Ys = np.asarray(next_ys)
        done_after = np.asarray(done_after)
        self.done = bool(done_after[-1])
        # beams freeze once the top beam emits </s> (reference
        # sequence_decoders.py:101-103: done beams skip advance); steps after
        # that are no-op rows — truncate the hypothesis walk there
        firsts = np.flatnonzero(done_after)
        self.n_steps = int(firsts[0]) + 1 if len(firsts) else len(done_after)

    def sort_best(self) -> Tuple[np.ndarray, np.ndarray]:
        order = np.argsort(-self.scores)
        return self.scores[order], order

    def get_best(self):
        scores, ids = self.sort_best()
        return scores[0], ids[0]

    def get_hyp(self, k: int) -> List[int]:
        """Backward walk over backpointers (reference beam.py:82-95)."""
        hyp = []
        for j in range(self.n_steps - 1, -1, -1):
            hyp.append(int(self.next_Ys[j][k]))
            k = int(self.prev_Ks[j][k])
        return hyp[::-1]


class BeamSearchDecoder:
    """Batch label-sync beam decoder (reference sequence_decoders.py:45-112).

    decode(logits) accepts (B, C, L) like the reference (or (B, L, C) with
    channels_last=True) and returns (probas, hypotheses)."""

    def __init__(self, batch_size: int, num_labels: int,
                 mapping_dict: Optional[Dict[str, int]] = None,
                 beam_width: int = 5, cap_seqs: bool = False):
        self.batch_size = batch_size
        self.num_labels = num_labels
        self.symbol_dict = mapping_dict or DEFAULT_BEAM_MAP
        self.beam_width = beam_width
        self.cap_seqs = cap_seqs

    def decode(self, logits, channels_last: bool = False):
        logits = jnp.asarray(logits, jnp.float32)
        if not channels_last:
            logits = jnp.transpose(logits, (0, 2, 1))  # -> (B, L, C)
        B, T, C = logits.shape
        probs = jax.nn.softmax(logits, axis=-1)

        if self.cap_seqs:
            start = jnp.zeros((B, 1, C)).at[:, 0, self.symbol_dict["<s>"]].set(1.0)
            stop = jnp.zeros((B, 1, C)).at[:, 0, self.symbol_dict["</s>"]].set(1.0)
            probs = jnp.concatenate([start, probs, stop], axis=1)

        ys = jax.vmap(lambda p: _advance_scan(p, self.beam_width,
                                              self.symbol_dict["</s>"]))(probs)
        scores_t, prev_ks, next_ys, done_after = (np.asarray(a) for a in ys)

        probas, hypotheses = [], []
        for b in range(B):
            beam = Beam(scores_t[b], prev_ks[b], next_ys[b], done_after[b])
            s, ids = beam.sort_best()
            probas.append(float(s[0]))
            hypotheses.append(beam.get_hyp(int(ids[0])))
        return probas, hypotheses
