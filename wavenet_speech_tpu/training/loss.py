"""Training losses (reference Loss.py:5-58, modules/losses.py).

Joint loss = next-signal cross-entropy on the WaveNet head + CTC on the
classifier head.  The reference computes the XE term with a Python loop over
timesteps (Loss.py:41-42 — its CPU hot spot); here it is one vectorized
cross-entropy over all timesteps, fused by XLA into the backward pass.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from wavenet_speech_tpu.ops.ctc import ctc_loss_per_seq


def next_signal_xe_loss(signal, signal_pred, signal_lengths=None):
    """Cross-entropy of predicted next-signal distribution vs the actual
    next quantized level (reference Loss.py:38-43).

    signal:      (B, L, C) one-hot input levels.
    signal_pred: (B, L, C) unnormalized or softmaxed prediction at each t of
                 the level at t+1.
    Reference semantics: target = argmax(signal[:, 1:, :]); for each of the
    first L-1 frames add CrossEntropy (mean over batch); divide by L.
    """
    target = jnp.argmax(signal[:, 1:, :], axis=-1)          # (B, L-1)
    logits = signal_pred[:, :-1, :]                          # (B, L-1, C)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # one-hot contraction, not take_along_axis: XLA lowers the gather (and
    # its scatter-add transpose in backward) to serial per-element ops on
    # TPU — the same pathology that dominated the CTC loss
    onehot = jax.nn.one_hot(target, logp.shape[-1], dtype=logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)
    if signal_lengths is not None:
        # only count frames < len-1 (padding contributes nothing)
        mask = (jnp.arange(nll.shape[1])[None, :] < (signal_lengths - 1)[:, None])
        nll = nll * mask
    # sum over time of batch-means, then / L  (matches Loss.py:41-43)
    return jnp.sum(jnp.mean(nll, axis=0)) / signal.shape[1]


@dataclasses.dataclass(frozen=True)
class JointLoss:
    """'joint' (XE+CTC) or 'ctc' loss wrapper (reference Loss.py:5-15;
    also covers the intended-but-stubbed modules/losses.py:9-38 JointLoss
    with its joint_weight slider).

    averaged=True returns (avg_xe, avg_ctc) where avg_ctc = sum-CTC / T
    (the reference's per-logit average, Loss.py:53)."""

    loss_choice: str = "joint"
    averaged: bool = True
    joint_weight: float = 1.0  # weight on the XE term when combining
    ctc_weight: float = 1.0    # 0.0 gives the XE-only pretraining phase
                               # (legacy_code/wavenet_ctc_artificial.py:146-164)

    def __post_init__(self):
        assert self.loss_choice in ("joint", "ctc")

    def calculate(self, signal, signal_pred, transcription_logits, labels,
                  label_lengths, logit_lengths=None, signal_lengths=None):
        """Returns (xe_loss_or_None, ctc_loss) like the reference."""
        T = transcription_logits.shape[1]
        if logit_lengths is None:
            # reference uses full logit length for every sequence (Loss.py:50)
            logit_lengths = jnp.full((transcription_logits.shape[0],), T,
                                     dtype=jnp.int32)
        ctc = jnp.sum(ctc_loss_per_seq(transcription_logits, logit_lengths,
                                       labels, label_lengths))
        if self.averaged:
            ctc = ctc / T
        if self.loss_choice == "ctc":
            return None, ctc
        xe = next_signal_xe_loss(signal, signal_pred, signal_lengths)
        return xe, ctc

    def total(self, *args, **kwargs):
        """Scalar objective: joint_weight * XE + ctc_weight * CTC."""
        xe, ctc = self.calculate(*args, **kwargs)
        if xe is None:
            return ctc
        return self.joint_weight * xe + self.ctc_weight * ctc
