"""Sequence-sharded CTC loss: the training-side companion of the
sequence-sharded beam decoder (decoding/distributed.py) and the halo-
exchange SP forward (parallel/halo.py).

When a halo-exchange forward produces logits whose TIME axis lives sharded
over the mesh's "seq" axis (signals too long for one chip's HBM), the CTC
alpha recursion — a strict left-to-right recurrence — is threaded through
the shards: shard s advances the (B, 2S+1) alpha lattice over its local
frames starting from the state shard s-1 handed it via ``lax.ppermute``,
and the last shard reduces the terminal states to log-likelihoods,
broadcast back with a psum-select. The logits never gather to one chip;
only the tiny lattice state crosses ICI (2S+1 floats per sequence per
shard boundary).

Gradients flow end-to-end through jax autodiff: ``ppermute`` is linear
(its transpose is the reverse permutation) and ``lax.cond`` differentiates
per-branch, so one ``jax.grad`` over the shard_mapped loss reproduces the
single-device gradient exactly (tested in tests/test_ctc_sharded.py).

Replaces: the reference's warp-ctc call (Loss.py:48-53) at scales the
reference could never reach (single process, full read on one device).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from wavenet_speech_tpu.ops.ctc import (
    _extend_labels,
    _gather_ext,
    ctc_alpha_init,
    ctc_alpha_scan,
    ctc_alpha_terminal,
)


def ctc_loss_seq_sharded(mesh: Mesh, logits, logit_lengths, labels,
                         label_lengths, blank: int = 0,
                         data_sharded: bool = False):
    """Per-sequence CTC negative log-likelihood over time-sharded logits.

    Args:
      logits: (B, T, C) unnormalized activations, T sharded over "seq"
        (T divisible by the seq-axis size); softmax applied internally
        (warp-ctc semantics, like ops.ctc.ctc_loss_per_seq).
      data_sharded: also shard B over "data".
    Returns: (B,) losses, replicated over "seq".
    """
    B, T, C = logits.shape
    n_seq = mesh.shape["seq"]
    if T % n_seq:
        raise ValueError(f"time axis {T} not divisible by seq axis {n_seq}")
    batch_ax = "data" if data_sharded else None
    spec_l = P(batch_ax, "seq", None)
    spec_b = P(batch_ax)

    @partial(shard_map, mesh=mesh,
             in_specs=(spec_l, spec_b, P(batch_ax, None), spec_b),
             out_specs=spec_b, check_vma=False)
    def run(lg, tl, lab, ll):
        i = lax.axis_index("seq")
        Bl, Tl = lg.shape[0], lg.shape[1]
        lp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        ext, allow_skip = _extend_labels(lab, blank)
        lp_ext = _gather_ext(lp, ext)                  # (Bl, Tl, 2S+1)
        lp_ext_t = jnp.transpose(lp_ext, (1, 0, 2))    # (Tl, Bl, 2S+1)
        ts = jnp.arange(Tl) + i * Tl                   # global frame indices

        J = lp_ext_t.shape[-1]
        alpha = jnp.full((Bl, J), -1e30, jnp.float32)
        fwd = [(j, j + 1) for j in range(n_seq - 1)]
        for s in range(n_seq):
            def active(a):
                if s == 0:
                    a = ctc_alpha_init(lp_ext_t[0], ll)
                    return ctc_alpha_scan(a, lp_ext_t[1:], ts[1:], tl,
                                          allow_skip)
                return ctc_alpha_scan(a, lp_ext_t, ts, tl, allow_skip)

            alpha = lax.cond(i == s, active, lambda a: a, alpha)
            if s < n_seq - 1:  # hand the lattice state to the next shard
                alpha = lax.ppermute(alpha, "seq", fwd)
        ll_out = ctc_alpha_terminal(alpha, ll)
        # broadcast the last shard's result to every shard (psum-select)
        ll_out = lax.psum(
            jnp.where(i == n_seq - 1, ll_out, jnp.zeros_like(ll_out)), "seq")
        return -ll_out

    return run(logits, jnp.asarray(logit_lengths, jnp.int32),
               jnp.asarray(labels, jnp.int32),
               jnp.asarray(label_lengths, jnp.int32))
