"""Linearized (incremental) convolution — the fast-generation primitive
(reference modules/linear_conv_ops.py:20-73: apply a conv kernel as a dense
layer to one receptive-field window; dilation-aware index selection
get_ker_ixs, linear_conv_ops.py:112-123).

On TPU this is a gather + one MXU matmul per generated frame.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from wavenet_speech_tpu.ops.conv import receptive_field


def ker_ixs(dilation: int, kernel_width: int) -> np.ndarray:
    """Timestep indices (within a receptive-field window) touched by a
    dilated kernel (reference get_ker_ixs)."""
    total = kernel_width * dilation - (dilation - 1)
    return np.arange(0, total, dilation)


def linear_conv_step(frame, w, b=None, *, dilation: int = 1):
    """Evaluate one output frame of a causal dilated conv.

    Args:
      frame: (B, rf, C_in) — the last rf = k + (d-1)(k-1) input frames.
      w: (K, C_in, C_out) conv kernel; b: (C_out,).
    Returns: (B, C_out), equal to causal_conv1d(...)[:, -1, :] on the window.
    """
    k = w.shape[0]
    rf = receptive_field(k, dilation)
    assert frame.shape[1] == rf, (frame.shape, rf)
    taps = frame[:, ker_ixs(dilation, k), :]          # (B, K, C_in)
    return jnp.einsum("bkc,kcd->bd", taps, w) + (0 if b is None else b)
