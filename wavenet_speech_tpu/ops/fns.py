"""Small tensor helpers (reference modules/fns.py:6-15,
legacy_code/model_tuning.py:4-17)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def one_hot_encoding(labels, num_labels: int, axis: int = -1):
    """(B, L) int -> one-hot along `axis` (reference fns.py returns
    (B, num_labels, L); NLC default here puts labels last)."""
    out = jax.nn.one_hot(labels, num_labels, dtype=jnp.float32)
    if axis != -1:
        out = jnp.moveaxis(out, -1, axis)
    return out


def compute_receptive_field(dilation_depth: int, nb_stacks: int,
                            kernel_width: int = 2) -> int:
    """Composite receptive field of stacked dilation cycles
    [1, 2, 4, ..., 2^depth] * nb_stacks (reference
    legacy_code/model_tuning.py:4-17)."""
    cycle = sum((kernel_width - 1) * (2 ** i) for i in range(dilation_depth + 1))
    return nb_stacks * cycle + 1
