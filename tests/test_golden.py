"""Golden regression: fixed-seed model outputs, CTC loss value, and greedy
decode labels must bit-match the committed fixture (float32 outputs allowed
tiny tolerance for BLAS variation; integer decodes must match exactly)."""
import os

import numpy as np

import tests.make_golden as mg

FIXTURE = mg.OUT


def test_golden_fixture_bitmatch():
    assert os.path.exists(FIXTURE), "run python tests/make_golden.py"
    want = dict(np.load(FIXTURE, allow_pickle=False))
    got = mg.build()
    np.testing.assert_array_equal(got["signal"], want["signal"])
    np.testing.assert_array_equal(got["targets"], want["targets"])
    np.testing.assert_allclose(got["base_out"], want["base_out"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got["logits"], want["logits"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got["ctc_loss"], want["ctc_loss"], rtol=1e-5)
    # the north-star bit-match: greedy decode labels identical
    np.testing.assert_array_equal(got["argmax_labels"], want["argmax_labels"])
