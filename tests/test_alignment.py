"""Alignment identity metric tests (hand-checkable cases)."""
import numpy as np

from wavenet_speech_tpu.decoding.alignment import (
    alignment_identity,
    batch_identity,
    needleman_wunsch,
)


def test_exact_match():
    ident, m, n = alignment_identity("ACGT", "ACGT")
    assert ident == 1.0 and m == 4 and n == 4


def test_single_substitution():
    ident, m, n = alignment_identity("ACGT", "AGGT")
    assert n == 4 and m == 3
    assert abs(ident - 0.75) < 1e-12


def test_insertion_gap():
    # pred has an extra base; best alignment gaps it out
    ident, m, n = alignment_identity("ACGGT", "ACGT")
    assert m == 4 and n == 5
    assert abs(ident - 0.8) < 1e-12


def test_empty_cases():
    assert alignment_identity("", "")[0] == 1.0
    ident, m, n = alignment_identity("", "ACG")
    assert ident == 0.0 and n == 3


def test_affine_gap_prefers_one_long_gap():
    """With affine gaps, one 3-gap beats three scattered 1-gaps."""
    score, aa, bb = needleman_wunsch("AAATTTCCC", "AAACCC")
    # the TTT should come out as one contiguous gap run in b
    gap_runs = 0
    in_gap = False
    for y in bb:
        if y is None and not in_gap:
            gap_runs += 1
            in_gap = True
        elif y is not None:
            in_gap = False
    assert gap_runs == 1


def test_integer_sequences_and_batch():
    preds = [np.array([1, 2, 3]), np.array([1, 1, 4, 2])]
    truths = [np.array([1, 2, 3]), np.array([1, 4, 2])]
    mean, details = batch_identity(preds, truths)
    assert details[0][0] == 1.0
    assert details[1][1] == 3  # 3 matches with one gapped insertion
    assert 0.8 < mean <= 1.0
