"""Smoke tests for the ported kmer research experiments (reference
tests/kmer_mapping.py, tests/kmer_stay_prediction.py,
tests/decode_nucleotides_from_kmer.py)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import kmer_experiments as ke  # noqa: E402


def test_nts_to_kmers_matches_reference_encoding():
    nts = np.array([[1, 2, 3, 4, 1, 2, 3]])
    kmers = ke._nts_to_kmers(nts)
    assert kmers.shape == (1, 3)
    # (nt-1) dot [256, 64, 16, 4, 1]
    assert kmers[0, 0] == 0 * 256 + 1 * 64 + 2 * 16 + 3 * 4 + 0
    assert kmers[0, 1] == 1 * 256 + 2 * 64 + 3 * 16 + 0 * 4 + 1


def test_stay_batch_shapes_and_alignment():
    means, stdvs = ke._kmer_tables()
    rng = np.random.default_rng(0)
    sig, lab, valid = ke._stay_batch(rng, means, stdvs, batch_size=3,
                                     num_kmers=5, shape=2.0, rate=0.5,
                                     max_dur=4, pad_frames=20)
    assert sig.shape == (3, 20, 1) and lab.shape == (3, 20)
    # every row starts with a kmer label (not STAY) and contains STAYs
    assert (lab[:, 0] < 1024).all()
    assert ((lab == 1024) & valid).any()
    # padding frames are zero-signal and excluded from the valid mask
    assert (sig[~valid] == 0).all()
    assert valid[:, 0].all()


def test_decode_learns_quickly():
    loss = ke.run_decode(steps=40, batch_size=8, nt_length=40, channels=32,
                         enc_dim=64, lr=3e-3, seed=0)
    assert np.isfinite(loss) and loss < 1.2  # chance is log(4) ~ 1.386


def test_mapping_runs():
    loss = ke.run_mapping(steps=30, batch_size=16, nhid=32, lr=2e-3, seed=0)
    assert np.isfinite(loss)
