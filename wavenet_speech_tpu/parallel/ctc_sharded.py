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

import numpy as np

from wavenet_speech_tpu.ops.ctc import (
    _extend_labels,
    _gather_ext,
    ctc_alpha_init,
    ctc_alpha_scan,
    ctc_alpha_terminal,
)

_NEG = -1e30


def _float0(x):
    return np.zeros(x.shape, jax.dtypes.float0)


def _sharded_impl_default() -> str:
    """Per-shard recursion engine: the fused Pallas segment kernels on TPU
    (the XLA scan costs ~35 us/frame of per-kernel latency per shard —
    VERDICT r2 #4/#6), the XLA scan elsewhere. Same override knob as the
    single-chip loss: WAVENET_CTC_IMPL in {pallas, xla}."""
    from wavenet_speech_tpu.ops.ctc import _default_impl

    return _default_impl()


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _sharded_ll_pallas(axis: str, n_seq: int, lp_ext_t, skipadd,
                       logit_lengths, label_lengths):
    """Per-shard terminal log-likelihoods (B,) from SHARD-LOCAL
    extended-label log-probs (Tl, B, J), chaining the fused Pallas segment
    kernels (ops/pallas/ctc.ctc_fwd_segment) across time shards with
    ppermute. Runs inside the seq-sharded shard_map.

    The returned value is shard-VARYING: only the LAST shard's entry is the
    global log-likelihood (the caller psum-selects it, exactly like the XLA
    path) — keeping the replication step outside the custom_vjp so
    shard_map's AD handles the replicated-output cotangent convention
    itself; the bwd rule psum-recovers the full cotangent from whichever
    shard carries it."""
    ll, _ = _sharded_fwd_pallas(axis, n_seq, lp_ext_t, skipadd,
                                logit_lengths, label_lengths)
    return ll


def _sharded_fwd_pallas(axis, n_seq, lp_ext_t, skipadd, logit_lengths,
                        label_lengths):
    from wavenet_speech_tpu.ops.pallas.ctc import ctc_fwd_segment

    Tl, B, J = lp_ext_t.shape
    i = lax.axis_index(axis)
    toff = (i * Tl).astype(jnp.int32)
    alpha = jnp.full((B, J), _NEG, jnp.float32)
    alphas_loc = None
    ll = jnp.zeros((B,), jnp.float32)
    fwd = [(j, j + 1) for j in range(n_seq - 1)]
    for s in range(n_seq):
        def active(a):
            ll_s, alphas, a_out = ctc_fwd_segment(
                lp_ext_t, skipadd, logit_lengths, label_lengths, a, toff)
            return a_out, alphas, ll_s

        def passive(a):
            # shapes must match the active branch (padded alphas length)
            return a, jnp.zeros(_alphas_shape(Tl, B, J), jnp.float32), ll

        alpha, alphas_new, ll_new = lax.cond(i == s, active, passive, alpha)
        if alphas_loc is None:
            alphas_loc = alphas_new
        else:
            alphas_loc = alphas_loc + alphas_new  # only round i contributes
        ll = jnp.where(i == s, ll_new, ll)
        if s < n_seq - 1:  # hand the lattice state to the next shard
            alpha = lax.ppermute(alpha, axis, fwd)
    # residual needs the GLOBAL log-likelihood on every shard (the backward
    # posterior formula divides by it); the returned primal stays
    # shard-varying — the caller does the psum-select
    ll_global = lax.psum(
        jnp.where(i == n_seq - 1, ll, jnp.zeros_like(ll)), axis)
    return ll, (lp_ext_t, skipadd, logit_lengths, label_lengths,
                alphas_loc, ll_global)


def _alphas_shape(Tl: int, B: int, J: int):
    """Padded alphas shape the segment kernel produces (mirrors
    ops/pallas/ctc._pick_ct/_pad_T)."""
    from wavenet_speech_tpu.ops.pallas.ctc import _pick_ct

    ct = _pick_ct(Tl, B, J)
    Tp = ((Tl + ct - 1) // ct) * ct
    return (Tp, B, J)


def _sharded_bwd_pallas(axis, n_seq, res, cot):
    from wavenet_speech_tpu.ops.pallas.ctc import ctc_bwd_segment

    lp_ext_t, skipadd, logit_lengths, label_lengths, alphas_loc, ll = res
    Tl, B, J = lp_ext_t.shape
    i = lax.axis_index(axis)
    # the primal was shard-varying (only the last shard's entry feeds the
    # caller's psum-select), so the incoming cotangent lives on whichever
    # shard(s) the caller read; every shard's local gradient needs the full
    # cotangent of the global log-likelihood — recover it with a psum
    cot = lax.psum(cot, axis)
    toff = (i * Tl).astype(jnp.int32)
    lpb = jnp.full((B, J), _NEG, jnp.float32)
    grad = jnp.zeros((Tl, B, J), jnp.float32)
    bwd = [(j + 1, j) for j in range(n_seq - 1)]
    for s in reversed(range(n_seq)):
        def active(c):
            g, lpb_out = ctc_bwd_segment(
                lp_ext_t, alphas_loc, skipadd, logit_lengths, label_lengths,
                ll, cot, c, toff)
            return lpb_out, g

        lpb, g_new = lax.cond(i == s, active,
                              lambda c: (c, jnp.zeros((Tl, B, J),
                                                      jnp.float32)), lpb)
        grad = grad + g_new  # only round i contributes
        if s > 0:  # hand the beta-state to the PREVIOUS shard
            lpb = lax.ppermute(lpb, axis, bwd)
    return (grad.astype(lp_ext_t.dtype), jnp.zeros_like(skipadd),
            _float0(logit_lengths), _float0(label_lengths))


_sharded_ll_pallas.defvjp(_sharded_fwd_pallas, _sharded_bwd_pallas)


def ctc_loss_seq_sharded(mesh: Mesh, logits, logit_lengths, labels,
                         label_lengths, blank: int = 0,
                         data_sharded: bool = False,
                         impl: Optional[str] = None):
    """Per-sequence CTC negative log-likelihood over time-sharded logits.

    Args:
      logits: (B, T, C) unnormalized activations, T sharded over "seq"
        (T divisible by the seq-axis size); softmax applied internally
        (warp-ctc semantics, like ops.ctc.ctc_loss_per_seq).
      data_sharded: also shard B over "data".
      impl: per-shard recursion engine — "pallas" (fused segment kernels,
        the TPU default; interpret-mode JAX elsewhere) or "xla" (lax.scan,
        the CPU/test default). None = ops.ctc._default_impl().
    Returns: (B,) losses, replicated over "seq".
    """
    B, T, C = logits.shape
    n_seq = mesh.shape["seq"]
    if T % n_seq:
        raise ValueError(f"time axis {T} not divisible by seq axis {n_seq}")
    impl = impl or _sharded_impl_default()
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

        if impl == "pallas":
            skipadd = jnp.where(allow_skip, 0.0, _NEG).astype(jnp.float32)
            ll_shard = _sharded_ll_pallas("seq", n_seq, lp_ext_t, skipadd,
                                          tl, ll)
            # broadcast the last shard's result to every shard, identically
            # to the XLA path below (AD-visible, so shard_map handles the
            # replicated-output cotangent)
            ll_out = lax.psum(
                jnp.where(i == n_seq - 1, ll_shard,
                          jnp.zeros_like(ll_shard)), "seq")
            return -ll_out

        ts = jnp.arange(Tl) + i * Tl                   # global frame indices
        J = lp_ext_t.shape[-1]
        alpha = jnp.full((Bl, J), _NEG, jnp.float32)
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
