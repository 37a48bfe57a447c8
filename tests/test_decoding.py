"""Decoding tests: greedy pipeline and the host prefix beam search
(validated on hand-computable cases + against exhaustive path enumeration)."""
import itertools
import math

import numpy as np

from wavenet_speech_tpu.decoding import (
    argmax_decode,
    beam_search_decode,
    greedy_ctc_decode,
    prefix_beam_search,
)


def brute_force_ctc_best(log_probs, blank=0):
    """Enumerate all alignment paths, sum per collapsed output, return the
    most probable output sequence. Exponential — only for tiny T, C."""
    T, C = log_probs.shape
    totals = {}
    for path in itertools.product(range(C), repeat=T):
        lp = sum(log_probs[t, c] for t, c in enumerate(path))
        # collapse: dedup repeats then drop blanks
        out = []
        prev = None
        for c in path:
            if c != prev and c != blank:
                out.append(c)
            prev = c
        key = tuple(out)
        totals[key] = np.logaddexp(totals.get(key, -np.inf), lp)
    return max(totals.items(), key=lambda kv: kv[1])


def test_prefix_beam_matches_brute_force(rng):
    for seed in range(5):
        r = np.random.default_rng(seed)
        T, C = 5, 4
        logits = r.standard_normal((T, C))
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        best_seq, best_lp = brute_force_ctc_best(lp)
        # full-width beam search is exact
        hyps = prefix_beam_search(lp, beam_width=256)
        assert tuple(hyps[0][0]) == best_seq
        np.testing.assert_allclose(hyps[0][1], best_lp, rtol=1e-10)


def test_beam_better_or_equal_greedy(rng):
    """On peaked distributions beam must find at least the greedy-collapse
    output probability."""
    T, C = 12, 5
    logits = rng.standard_normal((1, T, C)).astype(np.float64) * 2
    results, scores = beam_search_decode(logits, beam_width=16)
    greedy = greedy_ctc_decode(logits)
    from wavenet_speech_tpu.decoding import labels2strings

    beam_str = labels2strings([results[0]])[0]
    # compute both sequence probabilities under the exact forward score
    lp = logits[0] - np.log(np.exp(logits[0]).sum(-1, keepdims=True))
    all_hyps = dict((tuple(k), v) for k, v in prefix_beam_search(lp, 4096))
    greedy_labels = tuple(
        c for c in [int(x) for x in np.asarray(argmax_decode(logits))[0]]
    )
    # collapse greedy path
    out, prev = [], None
    for c in greedy_labels:
        if c != prev and c != 0:
            out.append(c)
        prev = c
    g_lp = all_hyps.get(tuple(out), -np.inf)
    b_lp = all_hyps[tuple(int(x) for x in results[0])]
    assert b_lp >= g_lp - 1e-9


def test_beam_blank_heavy_sequence():
    """Blank-dominated logits decode to the empty string."""
    T, C = 6, 5
    lp = np.full((1, T, C), -5.0)
    lp[:, :, 0] = 0.0
    results, scores = beam_search_decode(lp, beam_width=4, log_input=True)
    assert len(results[0]) == 0


def test_beam_respects_lengths():
    logits = np.zeros((1, 10, 3))
    logits[0, :, 1] = 3.0  # label 1 everywhere
    res_full, _ = beam_search_decode(logits, beam_width=4)
    res_short, _ = beam_search_decode(logits, beam_width=4,
                                      lengths=np.array([2]))
    # repeats collapse: both give a single '1', but with length=2 the
    # search only saw 2 frames — same output here
    assert list(res_full[0]) == [1] and list(res_short[0]) == [1]
