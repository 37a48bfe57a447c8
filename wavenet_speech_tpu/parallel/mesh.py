"""Device mesh construction (new TPU-side design; the reference is strictly
single-process/single-GPU — SURVEY.md §2.7).

Axes:
  data  — batch (DP): gradients exchanged by XLA-inserted psum over ICI
  model — channels (TP): conv channel dims sharded for nets exceeding one
          chip's HBM (the 2048-feature RawCTCNet eval config)
  seq   — time (SP): sequence-sharded long-signal inference with causal
          halo exchange (parallel/halo.py)
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "model", "seq")


def make_mesh(data: Optional[int] = None, model: int = 1, seq: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model, seq) mesh. data=None uses all remaining
    devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % (model * seq):
            raise ValueError(f"{n} devices not divisible by model*seq={model * seq}")
        data = n // (model * seq)
    need = data * model * seq
    if need > n:
        raise ValueError(f"mesh {data}x{model}x{seq} needs {need} devices, "
                         f"have {n}")
    arr = np.asarray(devices[:need]).reshape(data, model, seq)
    return Mesh(arr, AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
