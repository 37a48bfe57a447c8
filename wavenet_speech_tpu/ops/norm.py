"""Channel LayerNorm with the reference's exact (slightly unusual) numerics.

The reference (modules/layernorm.py:11-28) normalizes as
    gamma * (x - mean) / (std + eps) + beta
where std is the *Bessel-corrected* (ddof=1) standard deviation — torch's
Tensor.std default — and eps is added to std, not to variance. We reproduce
that here so parity fixtures bit-match.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from wavenet_speech_tpu.nn.core import Module, Params
from wavenet_speech_tpu.nn import initializers as init


def batch_standardize(x, eps: float = 1e-5):
    """Normalize a raw-signal batch to zero mean / unit variance over ALL
    non-channel axes — the training-mode statistics of the reference's
    nn.BatchNorm1d(1) base model (Model.py:51; Gaussian train notebook
    `batch_norm(signals.unsqueeze(1))`). The learnable affine of torch BN
    is exactly absorbed by the conv that follows, so this parameter-free
    form has identical capacity. Padding frames participate in the
    statistics, as in the reference."""
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


@dataclasses.dataclass(frozen=True)
class LayerNorm(Module):
    """Normalizes over the channel axis (last axis in NLC layout; the
    reference normalizes dim=1 of NCL, which is the same axis)."""

    features: int
    eps: float = 1e-6
    axis: int = -1

    def init(self, key) -> Params:
        del key
        return {
            "gamma": jnp.ones((self.features,), jnp.float32),
            "beta": jnp.zeros((self.features,), jnp.float32),
        }

    def apply(self, params: Params, x):
        mean = jnp.mean(x, axis=self.axis, keepdims=True)
        n = x.shape[self.axis]
        var = jnp.sum((x - mean) ** 2, axis=self.axis, keepdims=True) / max(n - 1, 1)
        std = jnp.sqrt(var)
        # broadcast gamma/beta along the normalized axis (not blindly the
        # last axis, which would scale the wrong dim for axis != -1)
        shape = [1] * x.ndim
        shape[self.axis] = self.features
        gamma = params["gamma"].reshape(shape)
        beta = params["beta"].reshape(shape)
        return gamma * (x - mean) / (std + self.eps) + beta
