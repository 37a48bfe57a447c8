"""Pretraining drivers — capability parity with the reference's
pretrain_tnt.py (RawCTCNet on RawSignalGenerator; 'PosEnc' encoder-only and
'EncDec' encoder+ByteNetDecoder variants) and pretrain_rnn.py (encoder +
RNNByteNetDecoder), with the reference's batch-format helpers.

The reference's torchnet-Engine loops with Visdom meters become a single
jitted step + MovingAverageMeter; architectures and hyperparameters follow
pretrain_tnt.py:92-127 (scaled via a `scale` factor so tests/CPUs can run
tiny versions).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def to_concat(labels_batch: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """(B, S) padded -> flat concatenated labels (reference
    pretrain_tnt.py:37-43)."""
    return np.concatenate(
        [labels_batch[k, : int(lengths[k])] for k in range(len(labels_batch))]
    ) if len(labels_batch) else np.zeros((0,), labels_batch.dtype)


def to_stack(labels_concat: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """flat concatenated labels -> (B, max_len) 0-padded (reference
    pretrain_tnt.py:45-59)."""
    max_length = int(max(lengths)) if len(lengths) else 0
    out = np.zeros((len(lengths), max_length), dtype=labels_concat.dtype)
    cur = 0
    for k, n in enumerate(lengths):
        n = int(n)
        out[k, :n] = labels_concat[cur: cur + n]
        cur += n
    return out


def build_posenc_encoder(scale: float = 1.0, remat: bool = True):
    """'PosEnc' config (reference pretrain_tnt.py:115-127): RawCTCNet,
    512 feats, k=3 featurizer, 30 blocks (dils [1..32] x 5, kwidth 3),
    positional embeddings, out_dim 1024."""
    from wavenet_speech_tpu.models import RawCTCNet

    F = max(int(512 * scale), 8)
    out_dim = max(int(1024 * scale), 8)
    reps = 5 if scale >= 1.0 else 1
    layers = tuple((F, F, 3, d) for d in (1, 2, 4, 8, 16, 32)) * reps
    return RawCTCNet(F, 3, 5, layers, out_dim, input_kernel_size=2,
                     input_dilation=1, positions=True, softmax=False,
                     causal=False, remat=remat)


def build_encdec(scale: float = 1.0, max_time: int = 40, remat: bool = True):
    """'EncDec' config (reference pretrain_tnt.py:92-113): RawCTCNet encoder
    (512 feats, 25 blocks, NOTE the reference's layer tuples put the
    dilation in the kwidth slot — we use the intended (c,c,k=2,d) reading)
    + ByteNetDecoder (7 labels incl. start/stop, 32 channels, MU blocks)."""
    from wavenet_speech_tpu.models import ByteNetDecoder, RawCTCNet

    F = max(int(512 * scale), 8)
    reps = 5 if scale >= 1.0 else 1
    enc_layers = tuple((F, F, 2, d) for d in (1, 2, 4, 8, 16)) * reps
    encoder = RawCTCNet(F, 3, F, enc_layers, F, input_kernel_size=2,
                        input_dilation=1, positions=False, softmax=False,
                        causal=False, remat=remat)
    dec_channels = max(int(32 * scale), 4)
    decoder = ByteNetDecoder(num_labels=7, encoding_dim=F,
                             channels=dec_channels,
                             output_dim=dec_channels,
                             layers=tuple((3, d) for d in (1, 2, 4, 8, 16)),
                             block="mult", pad=0, start=5, stop=6,
                             max_timesteps=max_time)
    return encoder, decoder


def build_rnn_decoder_pair(scale: float = 1.0, max_time: int = 100,
                           remat: bool = True):
    """pretrain_rnn.py:102-105 pair: RawCTCNet encoder + RNNByteNetDecoder."""
    from wavenet_speech_tpu.models import RawCTCNet, RNNByteNetDecoder

    F = max(int(512 * scale), 8)
    reps = 5 if scale >= 1.0 else 1
    enc_layers = tuple((F, F, 3, d) for d in (1, 2, 4, 8, 16)) * reps
    encoder = RawCTCNet(F, 3, F, enc_layers, F, softmax=False, causal=False,
                        remat=remat)
    decoder = RNNByteNetDecoder(num_labels=7, encoding_dim=F,
                                hidden_dim=max(int(256 * scale), 8),
                                out_dim=max(int(256 * scale), 8),
                                num_layers=3, pad=0, start=5, stop=6,
                                max_timesteps=max_time)
    return encoder, decoder


def pretrain_ctc(encoder, data_iter, num_steps: int, learning_rate: float = 2e-3,
                 optim_type: str = "adamax", log_every: int = 10,
                 compute_dtype=None, callback=None):
    """Encoder-only CTC pretraining loop (the reference 'PosEnc' path with
    Adamax lr 2e-3, pretrain_tnt.py:164-170). data_iter yields data.Batch.

    Returns (final TrainState, list of per-logit CTC losses)."""
    import jax

    from wavenet_speech_tpu.data.prefetch import batch_to_device
    from wavenet_speech_tpu.training import (TrainState, build_optimizer,
                                             make_ctc_train_step)
    from wavenet_speech_tpu.utils.run_logging import MovingAverageMeter

    tx = build_optimizer(optim_type, learning_rate)
    params = encoder.init(jax.random.PRNGKey(0))
    state = TrainState.create(params, tx)
    step = make_ctc_train_step(encoder, tx, donate=False,
                               compute_dtype=compute_dtype)
    meter = MovingAverageMeter(5)
    losses = []
    for i, batch in enumerate(data_iter):
        if i >= num_steps:
            break
        state, metrics = step(state, batch_to_device(batch))
        loss = float(metrics["ctc_loss"])
        losses.append(loss)
        meter.add(loss)
        if callback and i % log_every == 0:
            callback(i, meter.value)
    return state, losses
