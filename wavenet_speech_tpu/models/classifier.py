"""WaveNetClassifier: CTC head over the WaveNet features (reference
modules/classifier.py:13-120).

Structure: AvgPool1d downsample -> non-causal input ResidualBlock + eye-init
skip bottleneck -> non-causal residual stack with skip sum -> output stack
(LeakyReLU -> 1x1 -> LeakyReLU -> 1x1 to num_labels) -> optional softmax.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from wavenet_speech_tpu.nn.core import Module, Params, rngs
from wavenet_speech_tpu.nn import initializers as init
from wavenet_speech_tpu.ops.conv import Conv1x1
from wavenet_speech_tpu.ops.activations import leaky_relu
from wavenet_speech_tpu.models.blocks import ResidualBlock
from wavenet_speech_tpu.models.stack import SkipSumStack, LayerSpec


def avg_pool1d(x, kernel_size: int):
    """nn.AvgPool1d(kernel) over NLC: stride=kernel, no padding; output
    length floor(L / kernel) (reference classifier.py:53,101-102)."""
    B, L, C = x.shape
    Lo = L // kernel_size
    x = x[:, : Lo * kernel_size, :]
    return jnp.mean(x.reshape(B, Lo, kernel_size, C), axis=2)


@dataclasses.dataclass(frozen=True)
class WaveNetClassifier(Module):
    in_dim: int
    num_labels: int
    layers: Tuple[LayerSpec, ...]
    out_dim: int
    pool_kernel_size: int = 2
    input_kernel_size: int = 2
    input_dilation: int = 1
    softmax: bool = True
    remat: bool = False
    scan_cycles: bool = True  # see models/wavenet.py

    def __post_init__(self):
        object.__setattr__(self, "layers", tuple(tuple(l) for l in self.layers))

    def _input_block(self) -> ResidualBlock:
        return ResidualBlock(self.in_dim, self.layers[0][0],
                             self.input_kernel_size, self.input_dilation,
                             causal=False)

    def _stack(self) -> SkipSumStack:
        return SkipSumStack(self.layers, self.out_dim, causal=False,
                            remat=self.remat,
                            min_scan_repeats=(2 if self.scan_cycles
                                              else 10 ** 9))

    def init(self, key) -> Params:
        kib, kibn, ks, k1, k2 = rngs(key, 5)
        c0 = self.layers[0][0]
        return {
            "input_block": self._input_block().init(kib),
            "input_bottleneck": {
                "w": init.eye(kibn, (c0, self.out_dim)),
                "b": jnp.zeros((self.out_dim,), jnp.float32),
            },
            "stack": self._stack().init(ks),
            "out1": Conv1x1(self.out_dim, self.out_dim).init(k1),
            "out2": Conv1x1(self.out_dim, self.num_labels).init(k2),
        }

    def apply(self, params: Params, seq):
        """seq: (B, L, in_dim) -> (B, floor(L/pool), num_labels)."""
        out = avg_pool1d(seq, self.pool_kernel_size)
        out, skip = self._input_block().apply(params["input_block"], out)
        ib = params["input_bottleneck"]
        skips = skip @ ib["w"] + ib["b"]
        out, skips = self._stack().apply(params["stack"], out, skips)
        h = Conv1x1(self.out_dim, self.out_dim).apply(params["out1"], leaky_relu(skips))
        h = Conv1x1(self.out_dim, self.num_labels).apply(params["out2"], leaky_relu(h))
        if not self.softmax:
            return h
        return jax.nn.softmax(h, axis=-1)
