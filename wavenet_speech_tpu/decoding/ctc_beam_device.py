"""On-device CTC prefix beam search (lax.scan over time, fixed-shape beam
state, vmapped over batch) — the TPU-native replacement for the reference's
native C++ `ctcdecode.CTCBeamDecoder` (pretrain_rnn.py:23, eval notebooks:
beam_width 7, blank 0).

Why fixed shapes: XLA traces once; the classic hash-map prefix merge is
re-expressed as dense tensor ops:

  state  : prefixes (W, S) int32, plens (W,), pb/pnb (W,) f32 log-probs
           (prefix probability ending in blank / non-blank),
           times (W, S) int32 emission frame of each label
  step   : build W*C candidates: W "stay" candidates (extend by blank OR
           repeat last label — same prefix, so pre-merged) and W*(C-1)
           "extend" candidates; merge, keep top-W by total probability.

Merging exploits the beam invariant that all finite-probability beams hold
*distinct* prefixes (established by induction from the all-empty initial
state): stay candidates are therefore pairwise distinct, and extend
candidates from distinct live parents are pairwise distinct (equal extended
prefixes would force equal parents).  The ONLY possible merge is
stay(w) <- extend(v, c) where prefix_v + (c,) == prefix_w, i.e. v is the
"parent" of w.  That parent relation is a (W, W) masked-prefix comparison —
O(W^2 * S) work per frame instead of the O((W*C)^2 * S) all-pairs
candidate-equality matrix a naive dense merge needs (36x fewer comparisons
at the reference's W=7, C=5; the win grows quadratically in C, making the
kernel usable for real speech alphabets).

Dead beam slots (log-prob -inf, e.g. top-k filler early on) may duplicate a
live prefix; they are excluded as merge *targets* (alive gate) so they can
never siphon probability mass, and their own candidates carry -inf mass, so
the distinct-live-prefix invariant is preserved.

`times` reproduces the native ctcdecode's per-label timestep output (eval
notebook cells 19-22): times[w, s] is the frame at which hypothesis w's
s-th label was appended.  When a stay and an extend candidate merge, the
merged hypothesis keeps the times of whichever path family carries more
probability mass (ctcdecode reports the best path's frames).

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


def _totals(pb, pnb):
    return jnp.logaddexp(pb, pnb)


def _onehot_rows(idx, n, dtype=jnp.float32):
    """(K,) indices -> (K, n) one-hot. XLA lowers take_along_axis / fancy
    indexing to serial per-element gathers on TPU (measured 16 ms for one
    mid-sized gather in the CTC loss); contracting against a one-hot matrix
    instead keeps every selection on the MXU/VPU."""
    return (idx[:, None] == jnp.arange(n)[None, :]).astype(dtype)


def _select_rows(onehot, table):
    """Gather-free row selection: (K, N) one-hot @ (N, ...) table."""
    flat = table.reshape(table.shape[0], -1)
    out = onehot @ flat.astype(onehot.dtype)
    return out.reshape((onehot.shape[0],) + table.shape[1:]).astype(table.dtype)


def _beam_step(state, lp, t, *, num_labels: int, blank: int, max_len: int,
               prune: Optional[int] = None):
    """One frame of prefix beam search.
    state = (prefixes, plens, pb, pnb, times); lp = (C,) log-probs; t = frame.

    prune: consider only the frame's top-`prune` labels as extension
    candidates (the native ctcdecode's cutoff_top_n) — cuts the candidate
    pool from W*(1+C) to W*(1+prune) for large alphabets; exact whenever
    every label that would survive the top-W cut is in the frame's top-K
    (in practice K ~ 2W loses nothing — benchmarks/decode.py measures it).
    """
    prefixes, plens, pb, pnb, times = state
    W, S = prefixes.shape
    C = num_labels
    total = _totals(pb, pnb)  # (W,)
    alive = total > NEG_INF / 2  # (W,)

    pos_last = jnp.arange(S)[None, :] == (plens - 1)[:, None]  # (W, S)
    last = jnp.where(plens > 0,
                     jnp.sum(jnp.where(pos_last, prefixes, 0), axis=1),
                     -1)  # (W,) last label or -1 for empty prefix
    lp_last = jnp.where(last >= 0,
                        _onehot_rows(jnp.clip(last, 0, C - 1), C) @ lp,
                        NEG_INF)

    # --- stay candidates: same prefix; blank-extend + repeat-collapse ---
    stay_pb = total + lp[blank]
    stay_pnb = pnb + lp_last  # -inf for empty prefixes

    # --- extend candidates: one per (beam, candidate label != blank) ---
    if prune is not None and prune < C:
        lp_cand, labels = lax.top_k(lp, prune)  # (K,) frame's best labels
        K = prune
    else:
        labels = jnp.arange(C)  # includes blank; masked below
        lp_cand = lp
        K = C
    # P(prefix+c ends nonblank): pb + lp[c] if c == last else total + lp[c]
    ext_src = jnp.where(labels[None, :] == last[:, None],
                        pb[:, None], total[:, None])  # (W, K)
    ext_pnb = ext_src + lp_cand[None, :]  # (W, K)
    can_extend = (labels[None, :] != blank) & (plens[:, None] < max_len)
    ext_pnb = jnp.where(can_extend, ext_pnb, NEG_INF)

    # --- merge: stay(w) absorbs extend(v, c) when prefix_v + (c,) == prefix_w
    # masked prefix equality over v's valid positions: (v, w)
    care = jnp.arange(S)[None, None, :] < plens[:, None, None]  # (W, 1, S)
    eq_vw = jnp.all((prefixes[:, None, :] == prefixes[None, :, :]) | ~care,
                    axis=-1)  # (W_v, W_w)
    is_parent = (eq_vw
                 & (plens[None, :] == plens[:, None] + 1)
                 & alive[None, :])  # merge targets must be live
    # contribution of ext(v, last_w) into stay(w)'s non-blank mass; the
    # candidate label set may be pruned, so match labels by VALUE (at most
    # one candidate slot equals last_w -> masked-max selects it)
    label_is_cw = labels[None, :] == last[None, :].T  # (W_w, K) -> (W_w, K)
    ext_at_cw = jnp.max(
        jnp.where(label_is_cw[None, :, :],          # (1, W_w, K)
                  ext_pnb[:, None, :],              # (W_v, 1, K)
                  NEG_INF), axis=-1)                # (W_v, W_w)
    contrib = jnp.where(is_parent, ext_at_cw, NEG_INF)
    contrib_mass = jax.nn.logsumexp(contrib, axis=0)  # (W,)
    # merged times follow the more probable path family (ctcdecode reports
    # the best path's per-label frames): if the merged-in extension mass
    # dominates the prefix's prior mass, adopt the winning parent's times
    # with this frame written at the last position
    vstar = jnp.argmax(contrib, axis=0)  # (W,) dominant parent per target
    par_times = jnp.where(pos_last, t,
                          _select_rows(_onehot_rows(vstar, W), times))
    stay_times = jnp.where(
        (contrib_mass > _totals(stay_pb, stay_pnb))[:, None],
        par_times, times)
    stay_pnb = jnp.logaddexp(stay_pnb, contrib_mass)
    # consumed extends must leave the candidate pool (mass moved to stay)
    consumed = jnp.any(
        is_parent[:, :, None] & (last[None, :, None] == labels[None, None, :]),
        axis=1)  # (W_v, K)
    ext_pnb = jnp.where(consumed, NEG_INF, ext_pnb)

    # extended prefixes/times: label c / frame t written at position plen
    pos_onehot = (jnp.arange(S)[None, :] == plens[:, None])  # (W, S)
    ext_prefixes = jnp.where(pos_onehot[:, None, :],
                             labels[None, :, None],
                             prefixes[:, None, :])  # (W, K, S)
    ext_times = jnp.broadcast_to(
        jnp.where(pos_onehot[:, None, :], t, times[:, None, :]),
        (W, K, S))  # (W, K, S)
    ext_plens = jnp.minimum(plens + 1, max_len)

    # --- assemble candidate set: W stay + W*K extend (blank col masked) ---
    cand_prefixes = jnp.concatenate(
        [prefixes, ext_prefixes.reshape(W * K, S)], axis=0)  # (N, S)
    cand_times = jnp.concatenate([stay_times, ext_times.reshape(W * K, S)],
                                 axis=0)
    cand_plens = jnp.concatenate(
        [plens, jnp.broadcast_to(ext_plens[:, None], (W, K)).reshape(W * K)])
    cand_pb = jnp.concatenate([stay_pb, jnp.full((W * K,), NEG_INF)])
    cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(W * K)])

    # --- top-W by total probability (gather-free selection) ---
    top_vals, top_idx = lax.top_k(_totals(cand_pb, cand_pnb), W)
    sel = _onehot_rows(top_idx, W + W * K)
    return (_select_rows(sel, cand_prefixes), _select_rows(sel, cand_plens),
            _select_rows(sel, cand_pb), _select_rows(sel, cand_pnb),
            _select_rows(sel, cand_times))


def beam_init(beam_width: int, max_label_len: int):
    """Initial beam state for one sequence: slot 0 = empty prefix with
    probability 1, remaining slots dead. A decode can be resumed from any
    returned state (the sequence-sharded distributed decoder threads this
    state across chips)."""
    W, S = beam_width, max_label_len
    return (jnp.zeros((W, S), jnp.int32),          # prefixes
            jnp.zeros((W,), jnp.int32),            # plens
            jnp.full((W,), NEG_INF).at[0].set(0.0),  # pb
            jnp.full((W,), NEG_INF),               # pnb
            jnp.zeros((W, S), jnp.int32))          # times


def beam_scan(state, log_probs, ts, length, *, blank: int = 0,
              prune: Optional[int] = None):
    """Advance a beam state over frames `log_probs` ((T, C) log-softmax)
    whose *global* frame indices are `ts` ((T,) int32); frames with
    ts >= length carry the state through unchanged."""
    W, S = state[0].shape
    step = partial(_beam_step, num_labels=log_probs.shape[-1], blank=blank,
                   max_len=S, prune=prune)

    def scan_fn(st, xt):
        lp, t = xt
        new_state = step(st, lp, t)
        live = t < length  # frames past the valid length carry state through
        st = jax.tree_util.tree_map(
            lambda n, o: jnp.where(live, n, o), new_state, st)
        return st, None

    state, _ = lax.scan(scan_fn, state, (log_probs, ts))
    return state


def beam_finalize(state):
    """Sort a beam state best-first -> (prefixes, plens, scores, times)."""
    prefixes, plens, pb, pnb, times = state
    scores = _totals(pb, pnb)
    order = jnp.argsort(-scores)
    sel = _onehot_rows(order, scores.shape[0])
    return (_select_rows(sel, prefixes), _select_rows(sel, plens),
            sel @ scores, _select_rows(sel, times))


def _search_single(log_probs, length, *, beam_width: int, blank: int,
                   max_label_len: int, prune: Optional[int] = None):
    T, C = log_probs.shape
    state = beam_init(beam_width, max_label_len)
    state = beam_scan(state, log_probs, jnp.arange(T), length, blank=blank,
                      prune=prune)
    return beam_finalize(state)


def ctc_beam_search_jax(logits, lengths=None, beam_width: int = 7,
                        blank: int = 0, max_label_len: Optional[int] = None,
                        log_input: bool = False, return_times: bool = False,
                        prune: Optional[int] = None,
                        impl: Optional[str] = None
                        ) -> Tuple[jnp.ndarray, ...]:
    """Batched on-device CTC prefix beam search.

    Args:
      logits: (B, T, C) activations (softmaxed internally unless log_input).
      lengths: (B,) valid frame counts (default: T).
      max_label_len: cap on decoded length (default: T).
      return_times: also return per-label emission frames (the native
        ctcdecode's `times` output, eval notebook cells 19-22).
      prune: per-frame top-K label pre-prune for large alphabets
        (ctcdecode's cutoff_top_n); None = exact over all C labels.
      impl: "xla" (lax.scan over vmapped frames — the default) or
        "pallas" (ATTIC: the fused per-sequence kernel,
        ops/pallas/attic/beam.py — parity-tested but measured 19x slower
        than the XLA scan at B=32 because the grid serializes the batch;
        kept only so tests keep exercising it. WAVENET_BEAM_IMPL env
        overrides the default).
    Returns:
      prefixes: (B, W, S) int32 label arrays (0-padded)
      plens:    (B, W) int32 decoded lengths
      scores:   (B, W) f32 log-probabilities, sorted best-first
      times:    (B, W, S) int32 emission frame per label (if return_times)
    """
    logits = jnp.asarray(logits, jnp.float32)
    B, T, C = logits.shape
    lp = logits if log_input else jax.nn.log_softmax(logits, axis=-1)
    lengths = jnp.full((B,), T, jnp.int32) if lengths is None else jnp.asarray(lengths)
    S = int(max_label_len) if max_label_len is not None else T
    if impl is None:
        import os

        impl = os.environ.get("WAVENET_BEAM_IMPL", "xla")
    if impl == "pallas":
        from wavenet_speech_tpu.ops.pallas.attic.beam import (
            WPAD, beam_search_pallas)

        if beam_width > WPAD:
            # the kernel packs beam rows into one sublane tile (WPAD=8);
            # wider beams fall back to the XLA scan instead of asserting
            # (advisor r3: a W=16 pallas request used to fail outright)
            import warnings

            warnings.warn(f"pallas beam supports width <= {WPAD}; "
                          f"falling back to XLA for beam_width={beam_width}")
            impl = "xla"
    if impl == "pallas":
        pref, plen, pb, pnb, times = beam_search_pallas(
            lp, lengths, beam_width=beam_width, blank=blank,
            max_label_len=S, prune=prune)
        state = (pref, plen, pb, pnb, times)
        prefixes, plens, scores, times = jax.vmap(beam_finalize)(state)
    else:
        fn = partial(_search_single, beam_width=beam_width, blank=blank,
                     max_label_len=S, prune=prune)
        prefixes, plens, scores, times = jax.vmap(fn)(lp, lengths)
    if return_times:
        return prefixes, plens, scores, times
    return prefixes, plens, scores
