"""CTC loss kernel tests: the reference's two known-answer anchors
(tests/test_classifier.py:52-59 -> 2.4628; CTC Overfit.ipynb cell 27 ->
1.4519), randomized parity against torch's CTC (same DP, independent
implementation), and gradient checks."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from wavenet_speech_tpu.ops import ctc_loss, ctc_loss_flat, densify_labels
from wavenet_speech_tpu.ops.ctc import ctc_loss_per_seq


def test_golden_two_step():
    # warp-ctc example: T=2, B=1, C=5, labels [1,2] -> 2.4628
    logits = jnp.asarray([[[0.1, 0.6, 0.1, 0.1, 0.1],
                           [0.1, 0.1, 0.6, 0.1, 0.1]]])  # (B=1, T=2, C=5)
    loss = ctc_loss(logits, jnp.asarray([2]), jnp.asarray([[1, 2]]),
                    jnp.asarray([2]))
    assert abs(float(loss) - 2.4628) < 2e-3


def test_golden_one_step():
    # warp-ctc example: T=1, activations [-10..-6], label [3] -> 1.4519
    logits = jnp.asarray([[[-10.0, -9.0, -8.0, -7.0, -6.0]]])
    loss = ctc_loss(logits, jnp.asarray([1]), jnp.asarray([[3]]),
                    jnp.asarray([1]))
    assert abs(float(loss) - 1.4519) < 5e-3


def _torch_ctc(logits, logit_lens, dense, label_lens):
    """warp-ctc semantics via torch: log_softmax + sum reduction."""
    lp = F.log_softmax(torch.from_numpy(logits), dim=2).transpose(0, 1)  # (T,B,C)
    return F.ctc_loss(
        lp,
        torch.from_numpy(dense),
        torch.from_numpy(logit_lens),
        torch.from_numpy(label_lens),
        blank=0,
        reduction="sum",
        zero_infinity=False,
    ).item()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_parity_with_torch(seed):
    rng = np.random.default_rng(seed)
    B, T, C, S = 4, 30, 6, 8
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    logit_lens = rng.integers(2 * S + 2, T + 1, size=B).astype(np.int64)
    label_lens = rng.integers(1, S + 1, size=B).astype(np.int64)
    dense = rng.integers(1, C, size=(B, S)).astype(np.int64)

    ours = float(ctc_loss(jnp.asarray(logits), jnp.asarray(logit_lens),
                          jnp.asarray(dense), jnp.asarray(label_lens)))
    theirs = _torch_ctc(logits, logit_lens, dense, label_lens)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_per_seq_and_variable_lengths():
    rng = np.random.default_rng(3)
    B, T, C, S = 3, 25, 5, 6
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    logit_lens = np.array([25, 20, 15], dtype=np.int64)
    label_lens = np.array([6, 3, 1], dtype=np.int64)
    dense = rng.integers(1, C, size=(B, S)).astype(np.int64)

    per = np.asarray(ctc_loss_per_seq(jnp.asarray(logits), jnp.asarray(logit_lens),
                                      jnp.asarray(dense), jnp.asarray(label_lens)))
    # each element must match torch on the single-sequence problem
    for b in range(B):
        single = _torch_ctc(logits[b:b + 1], logit_lens[b:b + 1],
                            dense[b:b + 1], label_lens[b:b + 1])
        np.testing.assert_allclose(per[b], single, rtol=1e-4)


def test_gradient_matches_torch():
    rng = np.random.default_rng(4)
    B, T, C, S = 2, 12, 5, 3
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    logit_lens = np.array([12, 10], dtype=np.int64)
    label_lens = np.array([3, 2], dtype=np.int64)
    dense = rng.integers(1, C, size=(B, S)).astype(np.int64)

    grad = jax.grad(lambda lg: ctc_loss(lg, jnp.asarray(logit_lens),
                                        jnp.asarray(dense),
                                        jnp.asarray(label_lens)))(jnp.asarray(logits))

    t_logits = torch.from_numpy(logits).requires_grad_(True)
    lp = F.log_softmax(t_logits, dim=2).transpose(0, 1)
    loss = F.ctc_loss(lp, torch.from_numpy(dense), torch.from_numpy(logit_lens),
                      torch.from_numpy(label_lens), blank=0, reduction="sum")
    loss.backward()
    np.testing.assert_allclose(np.asarray(grad), t_logits.grad.numpy(),
                               rtol=1e-3, atol=1e-5)


def test_flat_label_api():
    rng = np.random.default_rng(5)
    B, T, C = 3, 20, 5
    label_lens = np.array([4, 2, 5], dtype=np.int64)
    flat = rng.integers(1, C, size=int(label_lens.sum())).astype(np.int64)
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    logit_lens = np.full(B, T, dtype=np.int64)

    flat_loss = float(ctc_loss_flat(jnp.asarray(logits), logit_lens, flat, label_lens))
    dense = densify_labels(flat, label_lens)
    dense_loss = float(ctc_loss(jnp.asarray(logits), jnp.asarray(logit_lens),
                                jnp.asarray(dense), jnp.asarray(label_lens)))
    assert flat_loss == dense_loss
    # densify roundtrip
    assert dense.shape == (3, 5)
    assert (dense[1, 2:] == 0).all()


def test_jit_and_repeated_label_path():
    """Repeated labels force the no-skip path through the lattice; ensure
    parity there too."""
    logits = np.full((1, 8, 4), 0.3, dtype=np.float32)
    dense = np.array([[2, 2, 2]], dtype=np.int64)
    ll = np.array([3], dtype=np.int64)
    tl = np.array([8], dtype=np.int64)
    f = jax.jit(ctc_loss)
    ours = float(f(jnp.asarray(logits), jnp.asarray(tl), jnp.asarray(dense),
                   jnp.asarray(ll)))
    theirs = _torch_ctc(logits, tl, dense, ll)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)
