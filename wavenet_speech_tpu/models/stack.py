"""Residual-block stack with skip-sum bottlenecks — the shared core of
WaveNet, WaveNetClassifier and RawCTCNet (reference modules/wavenet.py:58-64,
classifier.py:60-67, raw_ctcnet.py:70-81).

TPU-first design: the reference's dilation schedules are cycles (e.g.
[1,2,4,8,16] * 20).  Unrolling 100 blocks into the HLO graph makes XLA
compile times explode and bloats the executable; instead we detect the cycle
and ``lax.scan`` over cycle repeats with stacked parameters — the compiled
program contains ONE cycle of convs, weights stream from HBM per step, and
the math is identical.  Non-cyclic schedules fall back to unrolled blocks.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from wavenet_speech_tpu.nn.core import Module, Params, rngs
from wavenet_speech_tpu.nn import initializers as init
from wavenet_speech_tpu.models.blocks import ResidualBlock

LayerSpec = Tuple[int, int, int, int]  # (c_in, c_out, kernel_width, dilation)


def detect_cycle(layers: Sequence[LayerSpec]) -> int:
    """Smallest cycle length c with layers[i] == layers[i % c]; returns
    len(layers) if no shorter cycle exists."""
    n = len(layers)
    for c in range(1, n):
        if n % c == 0 and all(layers[i] == layers[i % c] for i in range(n)):
            return c
    return n


@dataclasses.dataclass(frozen=True)
class SkipSumStack(Module):
    """Applies residual blocks in sequence; each block's skip output passes
    through a per-layer 1x1 "bottleneck" to out_dim and is summed.

    apply(params, x, skips0) -> (residual_out, skips_sum)
    """

    layers: Tuple[LayerSpec, ...]
    out_dim: int
    causal: bool = True
    w_init: object = staticmethod(init.kaiming_uniform)
    b_init: object = staticmethod(init.zeros)
    # Identity init for skip bottlenecks implements the reference's INTENT
    # (wavenet.py:80-83 "eye" branch). Note the reference's own eye branch is
    # dead code — its `len(p.size()) == 2` guard never matches a Conv1d
    # weight (out, in, 1), so reference bottlenecks actually keep torch's
    # default Conv1d init. We deliberately ship the working identity init
    # (skip sums start as pass-throughs, which trains better).
    bottleneck_w_init: object = staticmethod(init.eye)
    bottleneck_b_init: object = staticmethod(init.zeros)
    min_scan_repeats: int = 2  # use lax.scan when the cycle repeats >= this
    remat: bool = False  # rematerialize each cycle in backward (HBM for FLOPs)
    use_pallas: bool = False  # fused Pallas forward for causal blocks

    def __post_init__(self):
        object.__setattr__(self, "layers", tuple(tuple(l) for l in self.layers))

    @property
    def receptive_field(self) -> int:
        """Composite receptive field of the stacked dilated convs:
        1 + sum((k-1)*d) (cf. reference legacy_code/model_tuning.py:4-17)."""
        return 1 + sum((k - 1) * d for (_, _, k, d) in self.layers)

    def _block(self, spec: LayerSpec) -> ResidualBlock:
        c_in, c_out, kw, d = spec
        return ResidualBlock(c_in, c_out, kw, d, causal=self.causal,
                             w_init=self.w_init, b_init=self.b_init,
                             use_pallas=self.use_pallas)

    def _layer_init(self, key, spec: LayerSpec) -> Params:
        kb, kw, kbb = rngs(key, 3)
        c_out = spec[1]
        return {
            "block": self._block(spec).init(kb),
            "bottleneck": {
                "w": self.bottleneck_w_init(kw, (c_out, self.out_dim)),
                "b": self.bottleneck_b_init(kbb, (self.out_dim,)),
            },
        }

    def _scan_config(self):
        c = detect_cycle(self.layers)
        repeats = len(self.layers) // c
        use_scan = repeats >= self.min_scan_repeats
        return c, repeats, use_scan

    def init(self, key) -> Params:
        c, repeats, use_scan = self._scan_config()
        keys = rngs(key, len(self.layers))
        per_layer = [self._layer_init(keys[i], self.layers[i])
                     for i in range(len(self.layers))]
        if not use_scan:
            return {"blocks": {str(i): p for i, p in enumerate(per_layer)}}
        # stack cycle-wise: leaf shapes become (repeats, ...)
        cycles = []
        for r in range(repeats):
            cycles.append({f"b{j}": per_layer[r * c + j] for j in range(c)})
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *cycles)
        return {"cycle": stacked}

    def _apply_one(self, layer_params: Params, spec: LayerSpec, out, skips):
        blk = self._block(spec)
        out, skip = blk.apply(layer_params["block"], out)
        bn = layer_params["bottleneck"]
        skips = skips + skip @ bn["w"] + bn["b"]
        return out, skips

    def apply(self, params: Params, x, skips0=None):
        B, L, _ = x.shape
        skips = (jnp.zeros((B, L, self.out_dim), x.dtype)
                 if skips0 is None else skips0)
        c, repeats, use_scan = self._scan_config()
        if not use_scan:
            out = x
            for i, spec in enumerate(self.layers):
                out, skips = self._apply_one(params["blocks"][str(i)], spec,
                                             out, skips)
            return out, skips

        cycle_specs = self.layers[:c]

        def cycle_step(carry, cycle_params):
            out, sk = carry
            for j, spec in enumerate(cycle_specs):
                out, sk = self._apply_one(cycle_params[f"b{j}"], spec, out, sk)
            return (out, sk), None

        if self.remat:
            # trade FLOPs for HBM: only cycle-boundary activations are kept
            # live for the backward pass (jax.checkpoint around each cycle)
            cycle_step = jax.checkpoint(cycle_step)
        (out, skips), _ = lax.scan(cycle_step, (x, skips), params["cycle"])
        return out, skips
