"""On-device CTC prefix beam search (lax.scan over time, fixed-shape beam
state, vmapped over batch) — the TPU-native replacement for the reference's
native C++ `ctcdecode.CTCBeamDecoder` (pretrain_rnn.py:23, eval notebooks:
beam_width 7, blank 0).

Why fixed shapes: XLA traces once; the classic hash-map prefix merge is
re-expressed as dense tensor ops:

  state  : prefixes (W, S) int32, plens (W,), pb/pnb (W,) f32 log-probs
           (prefix probability ending in blank / non-blank)
  step   : build W*C candidates: W "stay" candidates (extend by blank OR
           repeat last label — same prefix, so pre-merged) and W*(C-1)
           "extend" candidates; equal candidate prefixes are merged by a
           dense pairwise-equality matrix + masked logsumexp; top-W by
           total probability are kept.

The pairwise merge is O((W*C)^2 * S) elementwise work on the VPU — for the
reference's beam 7 / 5 labels this is ~1.2k comparisons per frame, far
below one conv layer's cost. vmap batches the whole search.

Validated against decoding/prefix_beam.py (the exhaustive-checked host
reference) in tests/test_ctc_beam_device.py.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# plain python float: a module-level jnp scalar would initialize the JAX
# backend at import time, locking the platform before callers can choose it
NEG_INF = -1e30


def _logaddexp(a, b):
    return jnp.logaddexp(a, b)


def _totals(pb, pnb):
    return jnp.logaddexp(pb, pnb)


def _beam_step(state, lp, *, beam_width: int, num_labels: int, blank: int,
               max_len: int):
    """One frame of prefix beam search. state = (prefixes, plens, pb, pnb);
    lp = (C,) log-probs for this frame."""
    prefixes, plens, pb, pnb = state
    W, S = prefixes.shape
    C = num_labels
    total = _totals(pb, pnb)  # (W,)

    last = jnp.where(
        plens > 0,
        jnp.take_along_axis(prefixes, jnp.maximum(plens - 1, 0)[:, None],
                            axis=1)[:, 0],
        -1,
    )  # (W,) last label or -1 for empty prefix
    lp_last = jnp.where(last >= 0, lp[jnp.clip(last, 0, C - 1)], NEG_INF)

    # --- stay candidates: same prefix; blank-extend + repeat-collapse ---
    stay_pb = total + lp[blank]
    stay_pnb = pnb + lp_last  # -inf for empty prefixes

    # --- extend candidates: one per (beam, label != blank) ---
    labels = jnp.arange(C)  # includes blank; masked below
    # P(prefix+c ends nonblank): pb + lp[c] if c == last else total + lp[c]
    ext_src = jnp.where(labels[None, :] == last[:, None],
                        pb[:, None], total[:, None])  # (W, C)
    ext_pnb = ext_src + lp[None, :]  # (W, C)
    can_extend = (labels[None, :] != blank) & (plens[:, None] < max_len)
    ext_pnb = jnp.where(can_extend, ext_pnb, NEG_INF)

    # extended prefixes: prefix with label written at position plen
    pos_onehot = (jnp.arange(S)[None, :] == plens[:, None])  # (W, S)
    # (W, C, S): broadcast each beam's prefix, write label c at plens[w]
    ext_prefixes = jnp.where(pos_onehot[:, None, :],
                             labels[None, :, None],
                             prefixes[:, None, :])
    ext_plens = jnp.minimum(plens + 1, max_len)

    # --- assemble candidate set: W stay + W*C extend (blank col masked) ---
    cand_prefixes = jnp.concatenate(
        [prefixes, ext_prefixes.reshape(W * C, S)], axis=0)  # (N, S)
    cand_plens = jnp.concatenate(
        [plens, jnp.broadcast_to(ext_plens[:, None], (W, C)).reshape(W * C)])
    cand_pb = jnp.concatenate([stay_pb, jnp.full((W * C,), NEG_INF)])
    cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(W * C)])
    N = W + W * C

    # dead candidates (from -inf parent beams) must not merge with live ones:
    # tag their length as -1 so they equal nothing
    alive = _totals(cand_pb, cand_pnb) > NEG_INF / 2
    cand_plens = jnp.where(alive, cand_plens, -1)

    # --- merge equal prefixes (dense pairwise equality) ---
    pad_mask = jnp.arange(S)[None, :] < cand_plens[:, None]  # (N, S)
    masked = jnp.where(pad_mask, cand_prefixes, -1)
    same_len = cand_plens[:, None] == cand_plens[None, :]
    same_lab = jnp.all(masked[:, None, :] == masked[None, :, :], axis=-1)
    eq = same_len & same_lab  # (N, N)

    idx = jnp.arange(N)
    # representative of each equivalence class = its first member
    rep = jnp.argmax(eq, axis=1)  # first True along each row
    is_rep = rep == idx
    # member[j, i]: candidate i merges into representative j
    member = (rep[None, :] == idx[:, None]) & alive[None, :]
    pb_m = jnp.where(member, cand_pb[None, :], NEG_INF)
    pnb_m = jnp.where(member, cand_pnb[None, :], NEG_INF)
    merged_pb = jax.nn.logsumexp(pb_m, axis=1)
    merged_pnb = jax.nn.logsumexp(pnb_m, axis=1)
    merged_pb = jnp.where(is_rep & alive, merged_pb, NEG_INF)
    merged_pnb = jnp.where(is_rep & alive, merged_pnb, NEG_INF)

    # --- top-W by total probability ---
    merged_total = _totals(merged_pb, merged_pnb)
    top_vals, top_idx = lax.top_k(merged_total, W)
    new_prefixes = cand_prefixes[top_idx]
    new_plens = jnp.maximum(cand_plens[top_idx], 0)
    new_pb = merged_pb[top_idx]
    new_pnb = merged_pnb[top_idx]
    return (new_prefixes, new_plens, new_pb, new_pnb)


def _search_single(log_probs, length, *, beam_width: int, blank: int,
                   max_label_len: int):
    T, C = log_probs.shape
    S = max_label_len
    W = beam_width
    prefixes0 = jnp.zeros((W, S), jnp.int32)
    plens0 = jnp.zeros((W,), jnp.int32)
    pb0 = jnp.full((W,), NEG_INF).at[0].set(0.0)
    pnb0 = jnp.full((W,), NEG_INF)
    step = partial(_beam_step, beam_width=W, num_labels=C, blank=blank,
                   max_len=S)

    def scan_fn(state, xt):
        lp, t = xt
        new_state = step(state, lp)
        live = t < length  # frames past the valid length carry state through
        state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(live, n, o), new_state, state)
        return state, None

    ts = jnp.arange(T)
    state, _ = lax.scan(scan_fn, (prefixes0, plens0, pb0, pnb0),
                        (log_probs, ts))
    prefixes, plens, pb, pnb = state
    scores = _totals(pb, pnb)
    order = jnp.argsort(-scores)
    return prefixes[order], plens[order], scores[order]


def ctc_beam_search_jax(logits, lengths=None, beam_width: int = 7,
                        blank: int = 0, max_label_len: Optional[int] = None,
                        log_input: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched on-device CTC prefix beam search.

    Args:
      logits: (B, T, C) activations (softmaxed internally unless log_input).
      lengths: (B,) valid frame counts (default: T).
      max_label_len: cap on decoded length (default: T).
    Returns:
      prefixes: (B, W, S) int32 label arrays (0-padded)
      plens:    (B, W) int32 decoded lengths
      scores:   (B, W) f32 log-probabilities, sorted best-first
    """
    logits = jnp.asarray(logits, jnp.float32)
    B, T, C = logits.shape
    lp = logits if log_input else jax.nn.log_softmax(logits, axis=-1)
    lengths = jnp.full((B,), T, jnp.int32) if lengths is None else jnp.asarray(lengths)
    S = int(max_label_len) if max_label_len is not None else T
    fn = partial(_search_single, beam_width=beam_width, blank=blank,
                 max_label_len=S)
    return jax.vmap(fn)(lp, lengths)
