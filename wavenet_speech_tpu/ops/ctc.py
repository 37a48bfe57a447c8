"""CTC loss as a JAX-differentiable op — the TPU-native replacement for the
reference's native warp-ctc dependency (reference Loss.py:3,48-53;
modules/losses.py:7).

Semantics match warp-ctc's calling convention:

  * inputs are **unnormalized activations**; softmax is applied internally
    (warp-ctc behavior — torch's nn.CTCLoss instead expects log-probs),
  * blank label is 0 by convention (reference Loss.py:33-35),
  * the returned scalar from :func:`ctc_loss` is the **sum over the batch**
    of per-sequence negative log likelihoods (warp-ctc default reduction);
    per-sequence values are available from :func:`ctc_loss_per_seq`.

Known-answer anchors reproduced by the test-suite (tests/test_ctc_loss.py):
2.4628 for the 2-step example (reference tests/test_classifier.py:52-59) and
1.4519 for the 1-step warp-ctc example (CTC Overfit.ipynb cell 27).

Implementation: vectorized log-space alpha recursion over the extended label
sequence (2S+1), scanned over time with ``lax.scan`` — static shapes, no
data-dependent control flow, fully batched on the VPU. Gradients come from
autodiff through the scan (exact, no approximation); the scan body is cheap
elementwise work so XLA fuses each step into a handful of vector ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Large-negative stand-in for -inf: keeps logaddexp gradients finite.
_NEG_INF = -1e30


def _extend_labels(labels: jnp.ndarray, blank: int):
    """(B, S) labels -> (B, 2S+1) blank-interleaved extended labels and the
    'allowed to skip' connectivity mask of the CTC lattice."""
    B, S = labels.shape
    ext = jnp.full((B, 2 * S + 1), blank, dtype=labels.dtype)
    ext = ext.at[:, 1::2].set(labels)
    # skip transition j-2 -> j allowed iff ext[j] != blank and ext[j] != ext[j-2]
    prev2 = jnp.concatenate([jnp.full((B, 2), blank, ext.dtype), ext[:, :-2]], axis=1)
    pos = jnp.arange(2 * S + 1)[None, :]
    allow_skip = (pos >= 2) & (ext != blank) & (ext != prev2)
    return ext, allow_skip


def _gather_ext(log_probs, ext):
    """(B, T, C) log-probs at extended-label positions -> (B, T, 2S+1) via a
    one-hot einsum (gather-free; see note in ctc_forward_logprob)."""
    onehot = jax.nn.one_hot(ext, log_probs.shape[-1], dtype=log_probs.dtype)
    return jnp.einsum("btc,bjc->btj", log_probs, onehot)


def ctc_forward_logprob(log_probs, logit_lengths, labels, label_lengths, blank: int = 0):
    """Log-likelihood log P(labels | log_probs) per sequence.

    Args:
      log_probs:     (B, T, C) log-probabilities over labels per frame.
      logit_lengths: (B,) valid frame counts.
      labels:        (B, S) dense labels (no blanks); padding beyond
                     label_lengths is ignored.
      label_lengths: (B,) valid label counts.
    Returns: (B,) log-likelihoods.
    """
    log_probs = log_probs.astype(jnp.float32)
    B, T, C = log_probs.shape
    S = labels.shape[1]
    ext, allow_skip = _extend_labels(labels, blank)  # (B, 2S+1)

    # Per-frame log-probs at the extended-label positions, (B, T, 2S+1),
    # as a one-hot contraction: XLA lowers take_along_axis to a serial
    # per-element gather on TPU (measured 16 ms at B=16/T=567/S=89 — it,
    # not the scan, dominated the CTC cost), while this is one tiny MXU
    # matmul over the C axis.
    lp_ext = _gather_ext(log_probs, ext)
    lp_ext_t = jnp.transpose(lp_ext, (1, 0, 2))  # (T, B, 2S+1)

    alpha0 = ctc_alpha_init(lp_ext_t[0], label_lengths)
    alpha = ctc_alpha_scan(alpha0, lp_ext_t[1:], jnp.arange(1, T),
                           logit_lengths, allow_skip)
    return ctc_alpha_terminal(alpha, label_lengths)


def ctc_alpha_init(lp_ext_0, label_lengths):
    """Initial alpha from the first frame's extended-label log-probs."""
    B, J = lp_ext_0.shape
    neg = jnp.float32(_NEG_INF)
    alpha0 = jnp.full((B, J), neg)
    alpha0 = alpha0.at[:, 0].set(lp_ext_0[:, 0])
    if J > 1:
        alpha0 = alpha0.at[:, 1].set(
            jnp.where(label_lengths > 0, lp_ext_0[:, 1], neg))
    return alpha0


def ctc_alpha_scan(alpha, lp_ext_t, ts, logit_lengths, skip_mask):
    """Advance alpha over frames lp_ext_t ((T', B, 2S+1)) whose GLOBAL frame
    indices are ts ((T',)); frames with ts >= logit_lengths carry alpha
    through unchanged. Exposed so the sequence-sharded CTC (parallel CTC
    over time shards) can run the same recursion per shard."""
    B = alpha.shape[0]
    neg = jnp.float32(_NEG_INF)

    def step(alpha, xt):
        lp_t, t = xt
        a1 = jnp.concatenate([jnp.full((B, 1), neg), alpha[:, :-1]], axis=1)
        a2 = jnp.concatenate([jnp.full((B, 2), neg), alpha[:, :-2]], axis=1)
        acc = jnp.logaddexp(alpha, a1)
        acc = jnp.where(skip_mask, jnp.logaddexp(acc, a2), acc)
        new_alpha = acc + lp_t
        # frames past a sequence's length carry alpha through unchanged
        live = (t < logit_lengths)[:, None]
        return jnp.where(live, new_alpha, alpha), None

    alpha, _ = lax.scan(step, alpha, (lp_ext_t, ts))
    return alpha


def ctc_alpha_terminal(alpha, label_lengths):
    """Log-likelihood from the final alpha: logaddexp of the two terminal
    lattice states (final blank 2L, final label 2L-1)."""
    idx_last = 2 * label_lengths  # (B,)
    a_last = jnp.take_along_axis(alpha, idx_last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(
        alpha, jnp.maximum(idx_last - 1, 0)[:, None], axis=1
    )[:, 0]
    return jnp.where(label_lengths > 0, jnp.logaddexp(a_last, a_prev), a_last)


def _default_impl() -> str:
    """CTC recursion implementation: 'pallas' (fused kernels — the XLA scan
    costs ~35 us/frame of per-kernel latency, see ops/pallas/ctc.py) when a
    TPU backend is active, else the 'xla' lax.scan. Override with the
    WAVENET_CTC_IMPL env var."""
    import os

    env = os.environ.get("WAVENET_CTC_IMPL")
    if env in ("pallas", "xla"):
        return env
    try:
        from wavenet_speech_tpu.ops.pallas.ctc import pallas_ctc_available

        return "pallas" if pallas_ctc_available() else "xla"
    except Exception:  # pragma: no cover
        return "xla"


def ctc_loss_per_seq(logits, logit_lengths, labels, label_lengths,
                     blank: int = 0, impl: str | None = None):
    """Per-sequence CTC negative log-likelihood; logits are unnormalized
    (softmax applied internally, matching warp-ctc)."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if (impl or _default_impl()) == "pallas":
        from wavenet_speech_tpu.ops.pallas.ctc import (
            ctc_forward_logprob_pallas,
        )

        return -ctc_forward_logprob_pallas(log_probs, logit_lengths, labels,
                                           label_lengths, blank)
    return -ctc_forward_logprob(log_probs, logit_lengths, labels, label_lengths, blank)


def ctc_loss(logits, logit_lengths, labels, label_lengths, blank: int = 0):
    """Summed-over-batch CTC loss (warp-ctc default reduction, the value the
    reference divides by T for its 'per-logit average', Loss.py:53)."""
    return jnp.sum(ctc_loss_per_seq(logits, logit_lengths, labels, label_lengths, blank))


def densify_labels(flat_labels, label_lengths, max_len: int | None = None, pad: int = 0):
    """Host-side helper converting warp-ctc's flattened-label convention
    (reference data loaders emit concatenated target sequences, e.g.
    utils/pore_model.py:130-165) into the dense (B, S) array the jitted CTC
    kernel wants. Runs in numpy — static shapes on device."""
    flat_labels = np.asarray(flat_labels)
    label_lengths = np.asarray(label_lengths)
    B = label_lengths.shape[0]
    S = int(max_len) if max_len is not None else (int(label_lengths.max()) if B else 0)
    dense = np.full((B, S), pad, dtype=np.int32)
    off = 0
    for b, n in enumerate(label_lengths):
        n = int(n)
        dense[b, :n] = flat_labels[off:off + n]
        off += n
    return dense


def ctc_loss_flat(logits, logit_lengths, flat_labels, label_lengths, blank: int = 0):
    """warp-ctc flat-label API: accepts concatenated labels (host arrays) and
    densifies before dispatching to the jittable kernel."""
    label_lengths = np.asarray(label_lengths)
    dense = densify_labels(flat_labels, label_lengths)
    return ctc_loss(logits, jnp.asarray(logit_lengths), jnp.asarray(dense),
                    jnp.asarray(label_lengths), blank)
