"""ByteNet autoregressive conv decoder (reference
modules/bytenet_decoder.py:19-191).

Structure: label embedding (num_labels -> 2C) -> 1x1 -> + encoding 1x1
(enc_dim -> 2C) -> stack of causal ResidualMU/ReLU blocks -> output
1x1 -> ReLU -> 1x1 -> num_labels.

Two evaluation modes:
  * apply(params, labels, encoding): full-sequence parallel forward (for
    teacher-forced training with known alignments);
  * generate(params, encoding): autoregressive loop with a sliding
    receptive-field label buffer and per-step argmax feedback — the
    reference's Python hot loop (bytenet_decoder.py:166-188) becomes one
    lax.scan; each step is the reference's `linear()` mini-forward (a conv
    over just the rf-window, keeping the last frame).  <STOP> bookkeeping
    (stop-flag + length counters, bytenet_decoder.py:181-184) is carried in
    the scan state; the reference's early Python `break` becomes masked
    no-ops, which preserves outputs and lengths exactly while keeping the
    trace static.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from wavenet_speech_tpu.nn.core import Module, Params, rngs
from wavenet_speech_tpu.nn import initializers as init
from wavenet_speech_tpu.models.blocks import ResidualMUBlock, ResidualReLUBlock

_noisy_zeros = init.with_noise(init.zeros, 1e-4)


@dataclasses.dataclass(frozen=True)
class ByteNetDecoder(Module):
    num_labels: int
    encoding_dim: int
    channels: int
    output_dim: int
    layers: Tuple[Tuple[int, int], ...]  # [(kwidth, dilation)]
    block: str = "mult"  # 'mult' -> ResidualMUBlock, 'relu' -> ResidualReLUBlock
    pad: int = 0
    start: int = 5
    stop: int = 6
    max_timesteps: int = 500

    def __post_init__(self):
        assert self.block in ("mult", "relu")
        object.__setattr__(self, "layers", tuple(tuple(l) for l in self.layers))

    def _blocks(self):
        cls = ResidualMUBlock if self.block == "mult" else ResidualReLUBlock
        return [cls(2 * self.channels, k, d) for (k, d) in self.layers]

    @property
    def receptive_field(self) -> int:
        """1 + sum(rf_i - 1) (reference bytenet_decoder.py:83-87)."""
        return 1 + sum(b.receptive_field - 1 for b in self._blocks())

    def init(self, key) -> Params:
        C2 = 2 * self.channels
        ks = rngs(key, 10 + len(self.layers))

        def wb(i, shape_w, shape_b):
            return {"w": init.kaiming_normal(ks[i], shape_w),
                    "b": _noisy_zeros(ks[i + 1], shape_b)}

        params = {
            # torch kaiming_normal_ on Embedding.weight (num_labels, 2C)
            # uses fan_in = size(1) = 2C; generate transposed to match
            "embed": init.kaiming_normal(ks[0], (C2, self.num_labels)).T,
            "input_1x1": wb(1, (C2, C2), (C2,)),
            "encoding_1x1": wb(3, (self.encoding_dim, C2), (C2,)),
            "out1": wb(5, (C2, self.output_dim), (self.output_dim,)),
            "out2": wb(7, (self.output_dim, self.num_labels),
                       (self.num_labels,)),
        }
        for i, blk in enumerate(self._blocks()):
            params[f"block{i}"] = blk.init(ks[9 + i])
        return params

    def _trunk(self, params: Params, labels, encoding):
        """Shared forward: labels (B, L) int, encoding (B, L, enc_dim) ->
        (B, L, num_labels) logits."""
        o = params["embed"][labels]                       # (B, L, 2C)
        o = o @ params["input_1x1"]["w"] + params["input_1x1"]["b"]
        o = o + (encoding @ params["encoding_1x1"]["w"]
                 + params["encoding_1x1"]["b"])
        for i, blk in enumerate(self._blocks()):
            o = blk.apply(params[f"block{i}"], o)
        o = o @ params["out1"]["w"] + params["out1"]["b"]
        o = jax.nn.relu(o)
        return o @ params["out2"]["w"] + params["out2"]["b"]

    def apply(self, params: Params, labels, encoding):
        """Full-sequence teacher-forced forward (causal blocks make output t
        depend only on labels/encoding <= t)."""
        return self._trunk(params, labels, encoding)

    def linear(self, params: Params, dec_frames, enc_frames):
        """One-step evaluation over an rf-window (reference
        bytenet_decoder.py:97-123): returns (B, num_labels) for the last
        timestep only."""
        return self._trunk(params, dec_frames, enc_frames)[:, -1, :]

    def generate(self, params: Params, encoded_seq):
        """Autoregressive decode (reference forward(), bytenet_decoder.py:
        126-191). encoded_seq: (B, L_enc, enc_dim).

        Returns (logits (B, T_max, num_labels), lengths (B,) int32) where
        lengths counts steps before <STOP> was first emitted."""
        B, L_enc, E = encoded_seq.shape
        rf = self.receptive_field
        T = self.max_timesteps

        # initial buffer: [pad]*(rf-1) + [start] (bytenet_decoder.py:154-156)
        buf0 = jnp.full((B, rf), self.pad, jnp.int32).at[:, -1].set(self.start)
        # encoding pre-padded with rf-1 leading zeros; windows slide by k
        enc_pad = jnp.pad(encoded_seq, ((0, 0), (rf - 1, 0), (0, 0)))
        # extend with zeros so dynamic_slice is always in-bounds for k < T
        extra = max(0, T - 1 + rf - enc_pad.shape[1])
        enc_pad = jnp.pad(enc_pad, ((0, 0), (0, extra), (0, 0)))

        def step(carry, k):
            buf, stopped, length = carry
            window = lax.dynamic_slice_in_dim(enc_pad, k, rf, axis=1)
            # reference: once the encoder steps run out the window is filled
            # with the pad VALUE (enc_steps_avail.fill_(self.pad_label),
            # bytenet_decoder.py:170)
            window = jnp.where(k < L_enc, window,
                               jnp.full_like(window, self.pad))
            logits = self.linear(params, buf, window)     # (B, num_labels)
            next_label = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            # stop-mask bookkeeping (bytenet_decoder.py:181-184): the stop
            # step itself is not counted
            stopped = jnp.logical_or(stopped, next_label == self.stop)
            length = length + jnp.where(stopped, 0, 1)
            buf = jnp.concatenate([buf[:, 1:], next_label[:, None]], axis=1)
            return (buf, stopped, length), logits

        init_carry = (buf0, jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32))
        (_, _, lengths), logits = lax.scan(step, init_carry, jnp.arange(T))
        return jnp.transpose(logits, (1, 0, 2)), lengths
