"""Batch inference / serving: signal in, basecalled sequence out.

The reference's eval notebooks hand-assemble this pipeline (model forward
-> softmax -> native ctcdecode -> strings); here it is a first-class API:
a jitted forward + on-device prefix beam search (or greedy), with host-side
string rendering. One compiled program per (batch, length) bucket.

    caller = Basecaller.from_checkpoint(model, ckpt_dir, beam_width=7)
    seqs, scores = caller(signal_batch)            # (B, L, C) -> strings
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_speech_tpu.decoding import (
    ctc_beam_search_jax,
    greedy_ctc_decode,
    labels2strings,
)
from wavenet_speech_tpu.decoding.greedy import argmax_decode, ctc_collapse


@dataclasses.dataclass
class Basecaller:
    """Jit-compiled end-to-end basecalling pipeline."""

    model: object                     # Module with apply(params, x)
    params: object
    beam_width: int = 7               # 0 -> greedy
    blank: int = 0
    max_label_len: Optional[int] = None
    pad_to_multiple: int = 128        # bucket lengths to limit recompiles
    logit_length_fn: Optional[object] = None  # input lens -> logit lens
                                      # (e.g. model.output_length); identity
                                      # if None

    def __post_init__(self):
        if self.beam_width > 0:
            @partial(jax.jit, static_argnames=("max_len",))
            def _run(params, x, lengths, max_len):
                logits = self.model.apply(params, x)
                return ctc_beam_search_jax(
                    logits, lengths=lengths, beam_width=self.beam_width,
                    blank=self.blank, max_label_len=max_len)
            self._run = _run
        else:
            @jax.jit
            def _run_greedy(params, x):
                logits = self.model.apply(params, x)
                return argmax_decode(logits)
            self._run_greedy = _run_greedy

    @classmethod
    def from_checkpoint(cls, model, ckpt_path: str, params_like=None, **kw):
        from wavenet_speech_tpu.training.checkpoint import restore_params

        params_like = params_like if params_like is not None else \
            model.init(jax.random.PRNGKey(0))
        params = restore_params(ckpt_path, params_like)
        return cls(model=model, params=params, **kw)

    def _bucket(self, x: np.ndarray) -> np.ndarray:
        m = self.pad_to_multiple
        L = x.shape[1]
        Lp = int(np.ceil(L / m)) * m
        if Lp == L:
            return x
        return np.pad(x, ((0, 0), (0, Lp - L), (0, 0)))

    def __call__(self, signal, lengths=None) -> Tuple[List[str], List[float]]:
        """signal: (B, L, C) numpy/jnp -> (sequences, scores).

        lengths: optional (B,) true signal lengths; defaults to the
        pre-padding L. Frames past each length (including the bucket
        padding this class adds) are excluded from decoding."""
        raw = np.asarray(signal, np.float32)
        x = self._bucket(raw)
        if lengths is None:
            lengths = np.full((raw.shape[0],), raw.shape[1], np.int32)
        lengths = np.asarray(lengths, np.int32)
        logit_lens = (np.asarray(self.logit_length_fn(lengths), np.int32)
                      if self.logit_length_fn is not None else lengths)
        if self.beam_width > 0:
            S = self.max_label_len or x.shape[1]
            prefixes, plens, scores = self._run(self.params, jnp.asarray(x),
                                                jnp.asarray(logit_lens),
                                                max_len=S)
            prefixes, plens = np.asarray(prefixes), np.asarray(plens)
            seqs = labels2strings([prefixes[b, 0, : plens[b, 0]]
                                   for b in range(prefixes.shape[0])])
            return seqs, [float(s) for s in np.asarray(scores)[:, 0]]
        labels = np.asarray(self._run_greedy(self.params, jnp.asarray(x)))
        return labels2strings(ctc_collapse(labels, lengths=logit_lens,
                                           blank=self.blank)), \
            [0.0] * labels.shape[0]
