"""RNN ByteNet-style decoder (reference modules/rnn_decoder.py:13-228):
StackedLSTMCell (LSTM cells + FC/ELU inter-layer links + residual adds +
per-layer skip projections summed) and RNNByteNetDecoder with a
scan-compiled unfold loop.

The LSTM cell is implemented from scratch with torch.nn.LSTMCell gate
semantics (gates = W_ih x + b_ih + W_hh h + b_hh, split [i, f, g, o]) so
the math is checkable against the reference backend.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from wavenet_speech_tpu.nn.core import Module, Params, rngs
from wavenet_speech_tpu.nn import initializers as init


def xavier_normal(key, shape, dtype=jnp.float32):
    """torch.nn.init.xavier_normal_: N(0, sqrt(2/(fan_in+fan_out))).

    2-D (out, in) dense: fan_in=in, fan_out=out. 3-D (kw, c_in, c_out) conv
    kernels follow torch's receptive-field scaling: fan_in = c_in * kw,
    fan_out = c_out * kw."""
    if len(shape) == 3:
        kw, cin, cout = shape
        fan_in, fan_out = cin * kw, cout * kw
    elif len(shape) == 2:
        fan_in, fan_out = shape[-1], shape[-2]
    else:
        fan_in = fan_out = shape[-1]
    std = (2.0 / (fan_in + fan_out)) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


def lstm_cell(p, x, h, c):
    """torch LSTMCell: returns (h', c'). p holds w_ih (4H, X), w_hh (4H, H),
    b_ih, b_hh (4H,); gate order [i, f, g, o]."""
    gates = x @ p["w_ih"].T + p["b_ih"] + h @ p["w_hh"].T + p["b_hh"]
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[..., 0 * H:1 * H])
    f = jax.nn.sigmoid(gates[..., 1 * H:2 * H])
    g = jnp.tanh(gates[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H:4 * H])
    c2 = f * c + i * g
    return o * jnp.tanh(c2), c2


@dataclasses.dataclass(frozen=True)
class StackedLSTMCell(Module):
    """reference rnn_decoder.py:13-83; forward(x, h0s, c0s) ->
    (skip_sum, h1s, c1s)."""

    hidden_dim: int
    num_layers: int

    def init(self, key) -> Params:
        H = self.hidden_dim
        out = {}
        ks = rngs(key, self.num_layers)
        nz3 = init.with_noise(init.zeros, 1e-3)
        nz5 = init.with_noise(init.zeros, 1e-5)
        for l in range(self.num_layers):
            k = rngs(ks[l], 8)
            out[f"l{l}"] = {
                "cell": {"w_ih": xavier_normal(k[0], (4 * H, H)),
                         "w_hh": xavier_normal(k[1], (4 * H, H)),
                         "b_ih": nz3(k[2], (4 * H,)),
                         "b_hh": nz3(k[3], (4 * H,))},
                "fc": {"w": xavier_normal(k[4], (H, H)),
                       "b": nz3(k[5], (H,))},
                "skip": {"w": init.eye(k[6], (H, H)),
                         "b": nz5(k[7], (H,))},
            }
        return out

    def apply(self, params: Params, x, h0s, c0s):
        h1s, c1s, outs = [], [], []
        out = x
        for l in range(self.num_layers):
            p = params[f"l{l}"]
            h1, c1 = lstm_cell(p["cell"], out, h0s[l], c0s[l])
            out = jax.nn.elu(h1 @ p["fc"]["w"].T + p["fc"]["b"]) + out
            h1s.append(h1)
            c1s.append(c1)
            outs.append(out @ p["skip"]["w"].T + p["skip"]["b"])
        return sum(outs), h1s, c1s


@dataclasses.dataclass(frozen=True)
class RNNByteNetDecoder(Module):
    """reference rnn_decoder.py:86-228."""

    num_labels: int
    encoding_dim: int
    hidden_dim: int
    out_dim: int
    num_layers: int
    pad: int = 0
    start: int = 5
    stop: int = 6
    max_timesteps: int = 500

    def _stack(self) -> StackedLSTMCell:
        return StackedLSTMCell(self.hidden_dim, self.num_layers)

    def init(self, key) -> Params:
        E, H, O = self.encoding_dim, self.hidden_dim, self.out_dim
        k = rngs(key, 12)
        nz = init.with_noise(init.zeros, 1e-4)
        return {
            "embed": xavier_normal(k[0], (self.num_labels, E)),
            "input_fc": {"w": xavier_normal(k[1], (H, E)), "b": nz(k[2], (H,))},
            "enc_fc1": {"w": xavier_normal(k[3], (E, E)), "b": nz(k[4], (E,))},
            "enc_fc2": {"w": xavier_normal(k[5], (H, E)), "b": nz(k[6], (H,))},
            "lstm": self._stack().init(k[7]),
            "out_fc1": {"w": xavier_normal(k[8], (O, H)), "b": nz(k[9], (O,))},
            "out_fc2": {"w": xavier_normal(k[10], (self.num_labels, O)),
                        "b": nz(k[11], (self.num_labels,))},
        }

    def apply(self, params: Params, x0, hvals, cvals, enc_step):
        """One decode step (reference forward(), rnn_decoder.py:150-182).
        x0: (B,) int labels; enc_step: (B, E)."""
        inp = params["embed"][x0] @ params["input_fc"]["w"].T + params["input_fc"]["b"]
        e = jax.nn.elu(enc_step @ params["enc_fc1"]["w"].T + params["enc_fc1"]["b"])
        e = e @ params["enc_fc2"]["w"].T + params["enc_fc2"]["b"]
        out, hvals, cvals = self._stack().apply(params["lstm"], inp + e,
                                                hvals, cvals)
        out = jax.nn.elu(out @ params["out_fc1"]["w"].T + params["out_fc1"]["b"])
        out = out @ params["out_fc2"]["w"].T + params["out_fc2"]["b"]
        return out, hvals, cvals

    def unfold(self, params: Params, encoding_seq, key=None):
        """Autoregressive decode (reference unfold(), rnn_decoder.py:184-228):
        starts from <START>, argmax feedback, <STOP> length bookkeeping, up
        to max_timesteps — as a lax.scan. encoding_seq: (B, L, E).

        Hidden/cell states initialize to 0.001*N(0,1) like the reference
        (rnn_decoder.py:196-198) when a PRNG key is given, else zeros.
        Returns (logits (B, T, num_labels), lengths (B,) int32)."""
        B, L, E = encoding_seq.shape
        H, N = self.hidden_dim, self.num_layers
        T = self.max_timesteps
        if key is not None:
            ks = rngs(key, 2 * N)
            hvals = [0.001 * jax.random.normal(ks[i], (B, H)) for i in range(N)]
            cvals = [0.001 * jax.random.normal(ks[N + i], (B, H)) for i in range(N)]
        else:
            hvals = [jnp.zeros((B, H)) for _ in range(N)]
            cvals = [jnp.zeros((B, H)) for _ in range(N)]

        enc_ext = jnp.pad(encoding_seq, ((0, 0), (0, max(0, T - L)), (0, 0)))

        def step(carry, t):
            label, hs, cs, stopped, length = carry
            enc_step = jnp.where(t < L, enc_ext[:, jnp.minimum(t, enc_ext.shape[1] - 1), :],
                                 jnp.zeros((B, E)))
            logits, hs, cs = self.apply(params, label, hs, cs, enc_step)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            stopped = jnp.logical_or(stopped, nxt == self.stop)
            length = length + jnp.where(stopped, 0, 1)
            return (nxt, hs, cs, stopped, length), logits

        x0 = jnp.full((B,), self.start, jnp.int32)
        carry0 = (x0, hvals, cvals, jnp.zeros((B,), bool),
                  jnp.zeros((B,), jnp.int32))
        (_, _, _, _, lengths), logits = lax.scan(step, carry0, jnp.arange(T))
        return jnp.transpose(logits, (1, 0, 2)), lengths
