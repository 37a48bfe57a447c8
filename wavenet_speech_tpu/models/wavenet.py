"""WaveNet generative stack (reference modules/wavenet.py:13-111).

Structure: entry CausalConv1d -> N gated residual blocks with per-layer 1x1
skip bottlenecks (eye-init) summed -> output stack
(LeakyReLU -> 1x1 -> LeakyReLU -> 1x1) -> optional softmax.

All tensors are NLC; the block stack compiles as a lax.scan over dilation
cycles (see models/stack.py).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from wavenet_speech_tpu.nn.core import Module, Params, rngs
from wavenet_speech_tpu.nn import initializers as init
from wavenet_speech_tpu.ops.conv import CausalConv1d, Conv1x1
from wavenet_speech_tpu.ops.activations import leaky_relu
from wavenet_speech_tpu.models.stack import SkipSumStack, LayerSpec


@dataclasses.dataclass(frozen=True)
class WaveNet(Module):
    """Args mirror the reference constructor (modules/wavenet.py:29-44):
    in_dim, entry_kwidth, layers=[(c_in,c_out,k,dilation)...], out_dim,
    softmax flag."""

    in_dim: int
    entry_kwidth: int
    layers: Tuple[LayerSpec, ...]
    out_dim: int
    softmax: bool = True
    remat: bool = False
    use_pallas: bool = False
    # False unrolls the dilation cycles instead of lax.scan-ning them:
    # bigger HLO + slower compile, but XLA schedules across all blocks
    # (no scan-carry copies / stacked-param slicing — see the round-4
    # trace attribution in RESULTS.md). Param layout differs (blocks/N
    # vs cycle-stacked), so flip only on fresh params.
    scan_cycles: bool = True

    def __post_init__(self):
        object.__setattr__(self, "layers", tuple(tuple(l) for l in self.layers))

    @property
    def num_layers(self) -> int:
        return len(self.layers)

    @property
    def receptive_field(self) -> int:
        rf = self.entry_kwidth
        rf += sum((k - 1) * d for (_, _, k, d) in self.layers)
        return rf

    def _stack(self) -> SkipSumStack:
        return SkipSumStack(self.layers, self.out_dim, causal=True,
                            remat=self.remat, use_pallas=self.use_pallas,
                            min_scan_repeats=(2 if self.scan_cycles
                                              else 10 ** 9))

    def _entry(self) -> CausalConv1d:
        return CausalConv1d(self.in_dim, self.layers[0][0], self.entry_kwidth)

    def _out_convs(self):
        return (Conv1x1(self.out_dim, self.out_dim), Conv1x1(self.out_dim, self.out_dim))

    def init(self, key) -> Params:
        ke, ks, k1, k2 = rngs(key, 4)
        c1, c2 = self._out_convs()
        return {
            "entry": self._entry().init(ke),
            "stack": self._stack().init(ks),
            "out1": c1.init(k1),
            "out2": c2.init(k2),
        }

    def apply(self, params: Params, signal):
        """signal: (B, L, in_dim) -> (B, L, out_dim) predicted next-signal
        distribution (softmaxed if self.softmax)."""
        out = self._entry().apply(params["entry"], signal)
        _, skips = self._stack().apply(params["stack"], out)
        c1, c2 = self._out_convs()
        h = c1.apply(params["out1"], leaky_relu(skips))
        h = c2.apply(params["out2"], leaky_relu(h))
        if not self.softmax:
            return h
        return jax.nn.softmax(h, axis=-1)
