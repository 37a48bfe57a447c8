"""Core of the functional module system.

A Module is a (frozen) dataclass describing architecture hyperparameters.
It exposes:

  * ``init(key) -> params``   — build the parameter pytree (nested dicts)
  * ``apply(params, *args)``  — pure forward function, safe under jit/vmap/
                                 pjit/shard_map/grad.

No parameter state lives on the module itself, so a single module instance
can be reused across devices, meshes and transformations — the idiomatic
JAX design (vs. the reference's stateful nn.Module objects).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence

import jax

Params = Dict[str, Any]


def rngs(key, n: int):
    """Split a PRNG key into n keys (convenience)."""
    return list(jax.random.split(key, n))


class Module:
    """Base class. Subclasses are dataclasses implementing init/apply."""

    def init(self, key) -> Params:  # pragma: no cover - interface
        raise NotImplementedError

    def apply(self, params: Params, *args, **kwargs):  # pragma: no cover
        raise NotImplementedError

    def __call__(self, params: Params, *args, **kwargs):
        return self.apply(params, *args, **kwargs)

    def update_state(self, old_params: Params, new_params: Params,
                     *inputs) -> Params:
        """Hook for modules carrying non-gradient state (e.g. BatchNorm
        running statistics): called by the train step AFTER the optimizer
        update with the pre-update params, the post-update params, and the
        raw batch inputs; returns post-update params with state leaves
        recomputed. Default: stateless, no-op."""
        del old_params, inputs
        return new_params


@dataclasses.dataclass(frozen=True)
class Sequential(Module):
    """Compose modules; params stored as {"0": ..., "1": ...}.

    Callables that are not Modules (e.g. activation lambdas) are applied
    directly and hold no parameters.
    """

    layers: Sequence[Any]

    def init(self, key) -> Params:
        params: Params = {}
        mods = [l for l in self.layers if isinstance(l, Module)]
        keys = rngs(key, max(len(mods), 1))
        ki = 0
        for i, layer in enumerate(self.layers):
            if isinstance(layer, Module):
                params[str(i)] = layer.init(keys[ki])
                ki += 1
        return params

    def apply(self, params: Params, x, **kwargs):
        for i, layer in enumerate(self.layers):
            if isinstance(layer, Module):
                x = layer.apply(params[str(i)], x, **kwargs)
            else:
                x = layer(x)
        return x
