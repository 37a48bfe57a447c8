"""Minimal functional module system: modules are dataclasses with
`init(key) -> params` and `apply(params, *args)`; params are nested dicts of
jnp arrays (pytrees), which keeps checkpointing, sharding annotation and
surgery trivial."""

from wavenet_speech_tpu.nn.core import Module, Sequential, rngs
from wavenet_speech_tpu.nn import initializers

__all__ = ["Module", "Sequential", "rngs", "initializers"]
