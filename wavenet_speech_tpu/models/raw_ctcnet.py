"""RawCTCNet: CTC classifier over raw (float) waveform (reference
modules/raw_ctcnet.py:13-153).

Structure: wide featurizer conv (1 -> num_features, padding=(fk-1) on BOTH
sides with no slice, so the output is LONGER than the input by fk-1 — a
quirk of the reference we reproduce, raw_ctcnet.py:57-61) -> LeakyReLU ->
1x1 -> LeakyReLU -> optional position-mixing 1x1+Hardtanh added in ->
input ResidualBlock -> dilated residual stack (causal flag selectable) ->
output stack to num_labels logits.

Init scheme (raw_ctcnet.py:90-114): kaiming weights; eye+1e-4-noise
bottlenecks and position conv; 1e-4-noise zero biases.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from wavenet_speech_tpu.nn.core import Module, Params, rngs
from wavenet_speech_tpu.nn import initializers as init
from wavenet_speech_tpu.ops.conv import Conv1x1, _conv1d
from wavenet_speech_tpu.ops.activations import leaky_relu, hardtanh
from wavenet_speech_tpu.models.blocks import ResidualBlock
from wavenet_speech_tpu.models.stack import SkipSumStack, LayerSpec

_EPS = 1e-4
_noisy_zeros = init.with_noise(init.zeros, _EPS)
_noisy_eye = init.with_noise(init.eye, _EPS)


@dataclasses.dataclass(frozen=True)
class RawCTCNet(Module):
    num_features: int
    feature_kwidth: int
    num_labels: int
    layers: Tuple[LayerSpec, ...]
    out_dim: int
    input_kernel_size: int = 2
    input_dilation: int = 1
    positions: bool = False
    softmax: bool = True
    causal: bool = False
    remat: bool = False

    def __post_init__(self):
        object.__setattr__(self, "layers", tuple(tuple(l) for l in self.layers))

    def _input_block(self) -> ResidualBlock:
        return ResidualBlock(self.num_features, self.layers[0][0],
                             self.input_kernel_size, self.input_dilation,
                             causal=self.causal,
                             b_init=_noisy_zeros)

    def _stack(self) -> SkipSumStack:
        return SkipSumStack(self.layers, self.out_dim, causal=self.causal,
                            remat=self.remat,
                            b_init=_noisy_zeros,
                            bottleneck_w_init=_noisy_eye,
                            bottleneck_b_init=_noisy_zeros)

    def init(self, key) -> Params:
        (kf1, kf1b, kf2, kf2b, kpos, kposb, kib, kibw, kibb,
         ks, k1, k1b, k2, k2b) = rngs(key, 14)
        F = self.num_features
        fk = self.feature_kwidth
        c0 = self.layers[0][0]
        params = {
            "feat_conv": {
                "w": init.kaiming_uniform(kf1, (fk, 1, F)),
                "b": _noisy_zeros(kf1b, (F,)),
            },
            "feat_1x1": {
                "w": init.kaiming_uniform(kf2, (1, F, F)),
                "b": _noisy_zeros(kf2b, (F,)),
            },
            "input_block": self._input_block().init(kib),
            "input_bottleneck": {
                "w": _noisy_eye(kibw, (c0, self.out_dim)),
                "b": _noisy_zeros(kibb, (self.out_dim,)),
            },
            "stack": self._stack().init(ks),
            "out1": {
                "w": init.kaiming_uniform(k1, (self.out_dim, self.out_dim)),
                "b": _noisy_zeros(k1b, (self.out_dim,)),
            },
            "out2": {
                "w": init.kaiming_uniform(k2, (self.out_dim, self.num_labels)),
                "b": _noisy_zeros(k2b, (self.num_labels,)),
            },
        }
        if self.positions:
            params["positions_1x1"] = {
                "w": _noisy_eye(kpos, (1, F)),
                "b": _noisy_zeros(kposb, (F,)),
            }
        return params

    def output_length(self, L: int) -> int:
        """The featurizer emits L + feature_kwidth - 1 frames (see module
        docstring)."""
        return L + self.feature_kwidth - 1

    def apply(self, params: Params, seq):
        """seq: (B, L, 1) raw waveform -> (B, L + fk - 1, num_labels).

        Sequence parallelism: under a seq-sharded shard_map
        (parallel/halo.seq_axis) the featurizer's full-width conv (which
        EXTENDS the time axis by fk-1, the reference raw_ctcnet.py:57-61
        quirk) is computed shard-locally from a both-sides (fk-1) halo:
        the valid conv over the haloed window yields global output frames
        [s*Ls, s*Ls + Ls + fk - 1) on shard s, from which each shard
        dynamic-slices its even share of the global L + fk - 1 frames.
        Exact (zero-fill ppermute reproduces the global edge padding);
        requires n_shards | (fk - 1) so shares and offsets are integral.
        """
        from wavenet_speech_tpu.parallel.halo import current_seq_axis, halo_pad

        fk = self.feature_kwidth
        h = fk - 1
        axis = current_seq_axis()
        if axis is not None and h > 0:
            n = lax.psum(1, axis)
            if h % int(n) != 0:
                raise ValueError(
                    f"sequence-sharded RawCTCNet needs seq shards ({int(n)}) "
                    f"to divide feature_kwidth-1 ({h}) so the L+fk-1 output "
                    f"shards evenly; pick fk == 1 (mod n_seq)")
            xp = halo_pad(seq, h, h, axis)                 # (B, Ls+2h, 1)
            v = _conv1d(xp, params["feat_conv"]["w"], dilation=1,
                        pad_left=0, pad_right=0)           # (B, Ls+h, F)
            share = h // int(n)
            start = lax.axis_index(axis) * share
            out = lax.dynamic_slice_in_dim(
                v, start, seq.shape[1] + share, axis=1)    # (B, Ls+h/n, F)
        else:
            # featurizer: pad (fk-1) both sides, NO length slice (ref quirk)
            out = _conv1d(seq, params["feat_conv"]["w"], dilation=1,
                          pad_left=h, pad_right=h)
        out = out + params["feat_conv"]["b"]
        out = leaky_relu(out)
        out = jnp.einsum("blc,kcd->bld", out, params["feat_1x1"]["w"]) + params["feat_1x1"]["b"]
        out = leaky_relu(out)

        if self.positions:
            L = out.shape[1]
            pos = jnp.arange(0, L, dtype=jnp.float32)[None, :, None]
            if axis is not None:
                # global frame index, not shard-local (1 x Ls x 1)
                pos = pos + jnp.asarray(lax.axis_index(axis) * L, jnp.float32)
            pos = pos.astype(out.dtype)
            p = params["positions_1x1"]
            out = out + hardtanh(pos @ p["w"][None] + p["b"])

        out, skip = self._input_block().apply(params["input_block"], out)
        ib = params["input_bottleneck"]
        skips = skip @ ib["w"] + ib["b"]
        out, skips = self._stack().apply(params["stack"], out, skips)

        h = leaky_relu(skips) @ params["out1"]["w"] + params["out1"]["b"]
        h = leaky_relu(h) @ params["out2"]["w"] + params["out2"]["b"]
        if not self.softmax:
            return h
        return jax.nn.softmax(h, axis=-1)
