"""WaveNet / ByteNet residual blocks, TPU-first.

Functional parity with reference modules/block.py, but restructured for the
MXU: wherever the reference runs several same-shaped convs over the same
input (the tanh/sigmoid gate pair, block.py:43-44; the four MU gate convs,
block.py:205-220), we fuse them into ONE wider conv and split the result —
half the kernel launches, bigger matmuls, identical math and identical init
distribution (kaiming fan_in is unchanged by fusing output channels).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from wavenet_speech_tpu.nn.core import Module, Params, rngs
from wavenet_speech_tpu.nn import initializers as init
from wavenet_speech_tpu.ops.conv import (
    causal_conv1d,
    noncausal_conv1d,
    receptive_field,
    Conv1x1,
    Dense,
)
from wavenet_speech_tpu.ops.norm import LayerNorm
from wavenet_speech_tpu.ops.activations import gated_activation


@dataclasses.dataclass(frozen=True)
class ResidualBlock(Module):
    """Gated residual block (reference modules/block.py:15-82).

    forward(x) -> (residual_out, skip_out):
      gate   = tanh(conv_d(x)) * sigmoid(conv_d'(x))   # fused dilated conv
      resid  = conv1x1_r(gate) + dense(x)              # Linear residual proj
      skip   = conv1x1_s(gate)                         # fused with conv1x1_r
    """

    in_channels: int
    out_channels: int
    kernel_width: int
    dilation: int
    causal: bool = True
    w_init: object = staticmethod(init.kaiming_uniform)
    b_init: object = staticmethod(init.zeros)
    use_pallas: bool = False  # fused Pallas forward (causal blocks, TPU only)

    @property
    def receptive_field(self) -> int:
        return receptive_field(self.kernel_width, self.dilation)

    def init(self, key) -> Params:
        kg, kgb, ko, kob, kr, krb = rngs(key, 6)
        C_in, C_out, K = self.in_channels, self.out_channels, self.kernel_width
        return {
            # fused tanh|sigmoid gate conv: output channels [0:C) tanh-arm,
            # [C:2C) sigmoid-arm
            "gate": {
                "w": self.w_init(kg, (K, C_in, 2 * C_out)),
                "b": self.b_init(kgb, (2 * C_out,)),
            },
            # fused residual|skip 1x1: [0:C) residual-arm, [C:2C) skip-arm
            "out1x1": {
                "w": self.w_init(ko, (1, C_out, 2 * C_out)),
                "b": self.b_init(kob, (2 * C_out,)),
            },
            "residual_proj": {
                "w": self.w_init(kr, (C_in, C_out)),
                "b": self.b_init(krb, (C_out,)),
            },
        }

    def apply(self, params: Params, x):
        if self.use_pallas and self.causal:
            from wavenet_speech_tpu.ops.pallas import fused_gated_block

            return fused_gated_block(
                x, params["gate"]["w"], params["gate"]["b"],
                params["out1x1"]["w"][0], params["out1x1"]["b"],
                params["residual_proj"]["w"], params["residual_proj"]["b"],
                self.dilation)
        conv = causal_conv1d if self.causal else noncausal_conv1d
        g = conv(x, params["gate"]["w"], params["gate"]["b"], dilation=self.dilation)
        C = self.out_channels
        act = gated_activation(g[..., :C], g[..., C:])
        o = causal_conv1d(act, params["out1x1"]["w"], params["out1x1"]["b"], dilation=1)
        resid_proj = x @ params["residual_proj"]["w"] + params["residual_proj"]["b"]
        residual_out = o[..., :C] + resid_proj
        skip_out = o[..., C:]
        return residual_out, skip_out


@dataclasses.dataclass(frozen=True)
class MultiplicativeUnit(Module):
    """Causal multiplicative unit (reference modules/block.py:192-225):
    sigma(g1) * tanh(sigma(g2)*h + sigma(g3)*tanh(u)), all four branch convs
    fused into one (K, C, 4C) causal conv.

    Init: kaiming-normal weights, noisy-zero (1e-3) biases, as the reference
    MU constructor does (block.py:221-225)."""

    ndim: int
    kernel_width: int
    dilation: int = 1

    @property
    def receptive_field(self) -> int:
        return receptive_field(self.kernel_width, self.dilation)

    def init(self, key) -> Params:
        kw, kb = rngs(key, 2)
        C = self.ndim
        return {
            "w": init.kaiming_normal(kw, (self.kernel_width, C, 4 * C)),
            "b": init.with_noise(init.zeros, 1e-3)(kb, (4 * C,)),
        }

    def apply(self, params: Params, h):
        C = self.ndim
        z = causal_conv1d(h, params["w"], params["b"], dilation=self.dilation)
        g1 = jax.nn.sigmoid(z[..., 0 * C:1 * C])
        g2 = jax.nn.sigmoid(z[..., 1 * C:2 * C])
        g3 = jax.nn.sigmoid(z[..., 2 * C:3 * C])
        u = jnp.tanh(z[..., 3 * C:4 * C])
        return g1 * jnp.tanh(g2 * h + g3 * u)


def _halved_stack_params(key, modules):
    params = {}
    keys = rngs(key, len(modules))
    for i, (name, mod) in enumerate(modules):
        params[name] = mod.init(keys[i])
    return params


@dataclasses.dataclass(frozen=True)
class ResidualMUBlock(Module):
    """ByteNet residual multiplicative block (reference block.py:86-126):
    x + [LN -> ReLU -> 1x1 halve -> LN -> ReLU -> MU(k) -> MU(1) -> 1x1 double](x)
    """

    nchannels: int
    kernel_width: int
    dilation: int = 1

    def _submodules(self):
        C, H = self.nchannels, self.nchannels // 2
        return [
            ("ln_in", LayerNorm(C)),
            ("down", Conv1x1(C, H)),
            ("ln_mid", LayerNorm(H)),
            ("mu_k", MultiplicativeUnit(H, self.kernel_width, self.dilation)),
            ("mu_1", MultiplicativeUnit(H, 1, 1)),
            ("up", Conv1x1(H, C)),
        ]

    @property
    def receptive_field(self) -> int:
        return receptive_field(self.kernel_width, self.dilation)

    def init(self, key) -> Params:
        return _halved_stack_params(key, self._submodules())

    def apply(self, params: Params, x):
        m = dict(self._submodules())
        h = m["ln_in"].apply(params["ln_in"], x)
        h = jax.nn.relu(h)
        h = m["down"].apply(params["down"], h)
        h = m["ln_mid"].apply(params["ln_mid"], h)
        h = jax.nn.relu(h)
        h = m["mu_k"].apply(params["mu_k"], h)
        h = m["mu_1"].apply(params["mu_1"], h)
        h = m["up"].apply(params["up"], h)
        return x + h


@dataclasses.dataclass(frozen=True)
class ResidualReLUBlock(Module):
    """ByteNet residual ReLU block (reference block.py:130-173):
    x + [LN -> ReLU -> 1x1 halve -> LN -> ReLU -> CausalConv(k,d) -> LN ->
    ReLU -> 1x1 double](x)
    """

    nchannels: int
    kernel_width: int
    dilation: int = 1

    def _submodules(self):
        C, H = self.nchannels, self.nchannels // 2
        from wavenet_speech_tpu.ops.conv import CausalConv1d

        return [
            ("ln_in", LayerNorm(C)),
            ("down", Conv1x1(C, H)),
            ("ln_mid", LayerNorm(H)),
            ("conv", CausalConv1d(H, H, self.kernel_width, self.dilation)),
            ("ln_out", LayerNorm(H)),
            ("up", Conv1x1(H, C)),
        ]

    @property
    def receptive_field(self) -> int:
        return receptive_field(self.kernel_width, self.dilation)

    def init(self, key) -> Params:
        return _halved_stack_params(key, self._submodules())

    def apply(self, params: Params, x):
        m = dict(self._submodules())
        h = m["ln_in"].apply(params["ln_in"], x)
        h = jax.nn.relu(h)
        h = m["down"].apply(params["down"], h)
        h = m["ln_mid"].apply(params["ln_mid"], h)
        h = jax.nn.relu(h)
        h = m["conv"].apply(params["conv"], h)
        h = m["ln_out"].apply(params["ln_out"], h)
        h = jax.nn.relu(h)
        h = m["up"].apply(params["up"], h)
        return x + h
