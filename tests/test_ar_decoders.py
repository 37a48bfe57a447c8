"""Autoregressive decoders: LSTM-cell parity vs torch, generation-loop
equivalence (lax.scan vs python reference loop), causality and stop-mask
semantics (reference bytenet_decoder.py:126-191, rnn_decoder.py:184-228)."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from wavenet_speech_tpu.models.bytenet_decoder import ByteNetDecoder
from wavenet_speech_tpu.models.rnn_decoder import (
    RNNByteNetDecoder,
    StackedLSTMCell,
    lstm_cell,
)
from wavenet_speech_tpu.ops.linear_conv import linear_conv_step, ker_ixs
from wavenet_speech_tpu.ops.conv import causal_conv1d


def test_lstm_cell_matches_torch(rng):
    H, B = 16, 3
    p = {
        "w_ih": rng.standard_normal((4 * H, H)).astype(np.float32) * 0.1,
        "w_hh": rng.standard_normal((4 * H, H)).astype(np.float32) * 0.1,
        "b_ih": rng.standard_normal(4 * H).astype(np.float32) * 0.1,
        "b_hh": rng.standard_normal(4 * H).astype(np.float32) * 0.1,
    }
    x = rng.standard_normal((B, H)).astype(np.float32)
    h = rng.standard_normal((B, H)).astype(np.float32)
    c = rng.standard_normal((B, H)).astype(np.float32)

    h2, c2 = lstm_cell({k: jnp.asarray(v) for k, v in p.items()},
                       jnp.asarray(x), jnp.asarray(h), jnp.asarray(c))

    cell = torch.nn.LSTMCell(H, H)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.from_numpy(p["w_ih"]))
        cell.weight_hh.copy_(torch.from_numpy(p["w_hh"]))
        cell.bias_ih.copy_(torch.from_numpy(p["b_ih"]))
        cell.bias_hh.copy_(torch.from_numpy(p["b_hh"]))
        th, tc = cell(torch.from_numpy(x),
                      (torch.from_numpy(h), torch.from_numpy(c)))
    np.testing.assert_allclose(np.asarray(h2), th.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), tc.numpy(), rtol=1e-5, atol=1e-6)


def test_linear_conv_step_equals_conv_last_frame(rng):
    for k, d in [(2, 1), (3, 2), (2, 4)]:
        rf = k + (d - 1) * (k - 1)
        B, Cin, Cout = 2, 4, 6
        frame = rng.standard_normal((B, rf, Cin)).astype(np.float32)
        w = rng.standard_normal((k, Cin, Cout)).astype(np.float32)
        b = rng.standard_normal(Cout).astype(np.float32)
        step = linear_conv_step(jnp.asarray(frame), jnp.asarray(w),
                                jnp.asarray(b), dilation=d)
        full = causal_conv1d(jnp.asarray(frame), jnp.asarray(w),
                             jnp.asarray(b), dilation=d)
        np.testing.assert_allclose(np.asarray(step), np.asarray(full[:, -1]),
                                   rtol=1e-5, atol=1e-6)
        assert list(ker_ixs(d, k)) == [i * d for i in range(k)]


def _tiny_bytenet(block="mult", max_t=12):
    return ByteNetDecoder(num_labels=7, encoding_dim=6, channels=4,
                          output_dim=8, layers=((3, 1), (3, 2)), block=block,
                          max_timesteps=max_t)


def test_bytenet_linear_equals_full_forward_last_step(rng):
    dec = _tiny_bytenet()
    params = dec.init(jax.random.PRNGKey(0))
    rf = dec.receptive_field
    labels = jnp.asarray(rng.integers(0, 7, size=(2, rf)))
    enc = jnp.asarray(rng.standard_normal((2, rf, 6)).astype(np.float32))
    lin = dec.linear(params, labels, enc)
    full = dec.apply(params, labels, enc)
    np.testing.assert_allclose(np.asarray(lin), np.asarray(full[:, -1]),
                               rtol=1e-5, atol=1e-6)


def _python_generate(dec, params, encoded):
    """Direct python transcription of reference bytenet_decoder.py:126-191
    using dec.linear as the step function."""
    B, L_enc, E = encoded.shape
    rf = dec.receptive_field
    buf = np.full((B, rf), dec.pad, np.int32)
    buf[:, -1] = dec.start
    enc_pad = np.zeros((B, rf - 1 + L_enc, E), np.float32)
    enc_pad[:, rf - 1:] = encoded
    outs, stopped = [], np.zeros(B, bool)
    lengths = np.zeros(B, np.int32)
    for k in range(dec.max_timesteps):
        if k < L_enc:
            window = enc_pad[:, k: k + rf]
        else:
            window = np.zeros((B, rf, E), np.float32)
        o = np.asarray(dec.linear(params, jnp.asarray(buf), jnp.asarray(window)))
        outs.append(o)
        nxt = o.argmax(-1).astype(np.int32)
        stopped |= (nxt == dec.stop)
        lengths += (~stopped).astype(np.int32)
        buf = np.concatenate([buf[:, 1:], nxt[:, None]], axis=1)
    return np.stack(outs, axis=1), lengths


def test_bytenet_generate_matches_python_loop(rng):
    for block in ["mult", "relu"]:
        dec = _tiny_bytenet(block)
        params = dec.init(jax.random.PRNGKey(1))
        enc = rng.standard_normal((2, 8, 6)).astype(np.float32)
        logits, lengths = dec.generate(params, jnp.asarray(enc))
        ref_logits, ref_lengths = _python_generate(dec, params, enc)
        np.testing.assert_allclose(np.asarray(logits), ref_logits,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(lengths), ref_lengths)


def test_bytenet_stop_bookkeeping():
    """Force <STOP> by biasing the output layer; lengths must freeze."""
    dec = _tiny_bytenet(max_t=6)
    params = dec.init(jax.random.PRNGKey(2))
    params["out2"]["b"] = params["out2"]["b"].at[dec.stop].set(100.0)
    enc = jnp.zeros((3, 5, 6))
    logits, lengths = dec.generate(params, enc)
    np.testing.assert_array_equal(np.asarray(lengths), 0)  # stop at step 0


def test_rnn_decoder_unfold_matches_python_loop(rng):
    dec = RNNByteNetDecoder(num_labels=7, encoding_dim=6, hidden_dim=8,
                            out_dim=8, num_layers=2, max_timesteps=10)
    params = dec.init(jax.random.PRNGKey(3))
    enc = rng.standard_normal((2, 6, 6)).astype(np.float32)

    logits, lengths = dec.unfold(params, jnp.asarray(enc))

    # python loop with zero-init states
    B, L, E = enc.shape
    hs = [jnp.zeros((B, 8)) for _ in range(2)]
    cs = [jnp.zeros((B, 8)) for _ in range(2)]
    label = jnp.full((B,), dec.start, jnp.int32)
    stopped = np.zeros(B, bool)
    lens = np.zeros(B, np.int32)
    outs = []
    for t in range(dec.max_timesteps):
        enc_step = jnp.asarray(enc[:, t]) if t < L else jnp.zeros((B, E))
        o, hs, cs = dec.apply(params, label, hs, cs, enc_step)
        outs.append(np.asarray(o))
        label = jnp.argmax(o, axis=-1).astype(jnp.int32)
        stopped |= (np.asarray(label) == dec.stop)
        lens += (~stopped).astype(np.int32)
    np.testing.assert_allclose(np.asarray(logits), np.stack(outs, 1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(lengths), lens)


def test_stacked_lstm_shapes():
    stack = StackedLSTMCell(8, 3)
    p = stack.init(jax.random.PRNGKey(4))
    x = jnp.ones((2, 8))
    hs = [jnp.zeros((2, 8))] * 3
    cs = [jnp.zeros((2, 8))] * 3
    out, h1s, c1s = stack.apply(p, x, hs, cs)
    assert out.shape == (2, 8) and len(h1s) == 3 and len(c1s) == 3
