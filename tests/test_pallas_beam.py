"""Fused Pallas beam-search kernel vs the XLA beam (interpret mode —
CPU-testable end-to-end; the hardware lowering is opt-in until proven)."""
import numpy as np
import jax
import jax.numpy as jnp

from wavenet_speech_tpu.decoding.ctc_beam_device import (NEG_INF,
                                                         ctc_beam_search_jax)
from wavenet_speech_tpu.ops.pallas.attic.beam import beam_search_pallas


def _lp(B, T, C, seed=0, sharp=2.0, blank_frac=0.6):
    rng = np.random.default_rng(seed)
    logits = (sharp * rng.standard_normal((B, T, C))).astype(np.float32)
    logits[:, rng.random(T) < blank_frac, 0] += sharp
    return np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))


def _compare(lp, lengths, W, S, prune=None):
    p0, l0, s0 = ctc_beam_search_jax(lp, lengths=jnp.asarray(lengths),
                                     beam_width=W, max_label_len=S,
                                     log_input=True, prune=prune)
    pref, plen, pb, pnb, times = beam_search_pallas(
        jnp.asarray(lp), lengths, beam_width=W, max_label_len=S,
        prune=prune)
    tot = np.logaddexp(np.asarray(pb), np.asarray(pnb))
    order = np.argsort(-tot, axis=1)
    B = lp.shape[0]
    for b in range(B):
        # compare the LIVE beams (dead NEG fillers may order differently)
        for rank in range(W):
            if np.asarray(s0)[b, rank] <= NEG_INF / 2:
                break
            w = order[b, rank]
            assert abs(tot[b, w] - float(np.asarray(s0)[b, rank])) < 1e-3, \
                (b, rank, tot[b, w], float(np.asarray(s0)[b, rank]))
            n = int(np.asarray(l0)[b, rank])
            assert int(np.asarray(plen)[b, w]) == n
            np.testing.assert_array_equal(
                np.asarray(pref)[b, w, :n], np.asarray(p0)[b, rank, :n])


def test_pallas_beam_matches_xla_dna():
    lp = _lp(2, 100, 5, seed=0)
    _compare(lp, np.asarray([100, 77], np.int32), W=7, S=64)


def test_pallas_beam_matches_xla_speech_alphabet():
    lp = _lp(2, 60, 30, seed=1)
    _compare(lp, np.asarray([60, 60], np.int32), W=8, S=32)


def test_pallas_beam_matches_xla_pruned():
    lp = _lp(1, 60, 30, seed=2)
    _compare(lp, np.asarray([60], np.int32), W=8, S=32, prune=12)


def test_pallas_beam_times_match():
    lp = _lp(1, 80, 5, seed=3)
    W, S = 5, 48
    p0, l0, s0, t0 = ctc_beam_search_jax(lp, beam_width=W, max_label_len=S,
                                         log_input=True, return_times=True)
    pref, plen, pb, pnb, times = beam_search_pallas(
        jnp.asarray(lp), np.asarray([80], np.int32), beam_width=W,
        max_label_len=S)
    tot = np.logaddexp(np.asarray(pb), np.asarray(pnb))
    w = int(np.argmax(tot[0]))
    n = int(np.asarray(l0)[0, 0])
    assert int(np.asarray(plen)[0, w]) == n
    np.testing.assert_array_equal(np.asarray(times)[0, w, :n],
                                  np.asarray(t0)[0, 0, :n])
