"""Elementwise activations. XLA fuses these into the surrounding convs, so
they are free on TPU (no separate HBM round-trip)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gated_activation(x, y):
    """tanh(x) * sigmoid(y) — the WaveNet gate (reference
    modules/block.py:177-188)."""
    return jnp.tanh(x) * jax.nn.sigmoid(y)


def leaky_relu(x, negative_slope: float = 0.01):
    """LeakyReLU(0.01) as used in all reference output stacks
    (e.g. modules/wavenet.py:67-71)."""
    return jnp.where(x >= 0, x, negative_slope * x)


def hardtanh(x, min_val: float = -1.0, max_val: float = 1.0):
    """nn.Hardtanh, used by RawCTCNet's position mixer
    (reference modules/raw_ctcnet.py:63-67)."""
    return jnp.clip(x, min_val, max_val)
