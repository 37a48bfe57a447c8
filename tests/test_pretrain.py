"""Pretraining drivers: batch-format helpers (reference pretrain_tnt.py:
37-59 parity), scaled architecture builders, and a short encoder-only CTC
pretraining run on the synthetic raw-signal pipeline."""
import numpy as np
import jax

from wavenet_speech_tpu.data import RawGaussianModelLoader
from wavenet_speech_tpu.training.pretrain import (
    build_encdec,
    build_posenc_encoder,
    build_rnn_decoder_pair,
    pretrain_ctc,
    to_concat,
    to_stack,
)


def test_to_concat_to_stack_roundtrip(rng):
    lengths = np.array([3, 5, 2], np.int64)
    stacked = np.zeros((3, 5), np.int64)
    for k, n in enumerate(lengths):
        stacked[k, :n] = rng.integers(1, 5, size=n)
    flat = to_concat(stacked, lengths)
    assert flat.shape[0] == lengths.sum()
    back = to_stack(flat, lengths)
    np.testing.assert_array_equal(back, stacked)


def test_scaled_builders():
    enc = build_posenc_encoder(scale=1 / 32)
    assert enc.positions and enc.num_features == 16
    e2, dec = build_encdec(scale=1 / 32, max_time=10)
    assert dec.num_labels == 7 and dec.stop == 6
    e3, rdec = build_rnn_decoder_pair(scale=1 / 32, max_time=10)
    assert rdec.num_layers == 3

    # builders produce runnable models
    p = enc.init(jax.random.PRNGKey(0))
    y = enc.apply(p, np.zeros((1, 30, 1), np.float32))
    assert y.shape == (1, 32, 5)


def test_pretrain_ctc_loss_decreases():
    loader = RawGaussianModelLoader(max_iters=10 ** 9, num_epochs=10 ** 6,
                                    epoch_size=100, batch_size=2,
                                    upsampling=3, lengths=(15, 18), seed=3,
                                    pad_to=(18 - 1 - 8) * 3, labels_pad_to=17)
    fixed = loader.fetch()

    encoder = build_posenc_encoder(scale=1 / 32, remat=False)
    seen = []
    state, losses = pretrain_ctc(
        encoder, (fixed for _ in range(60)), num_steps=60,
        learning_rate=2e-3, callback=lambda i, v: seen.append((i, v)))
    assert len(losses) == 60
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    assert seen and seen[0][0] == 0
