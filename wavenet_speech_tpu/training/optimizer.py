"""Optimizers on optax (replaces reference Optimizer.py:5-39 and the
driver-script optimizer zoo: Adam/Adagrad (Optimizer.py:22-25), Adamax
(pretrain_tnt.py:164-170), RMSprop (tests/test_classifier.py), plus the
reference's unsupported-but-declared weight_decay / max_grad_norm config
knobs (configs/ecoli_testrun.json) and ReduceLROnPlateau
(pretrain_rnn.py:152-158)."""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax


def make_lr_schedule(opt_cfg: dict):
    """Resolve the config's optim block to a learning rate or optax
    schedule (optax optimizers accept either).

    Config keys (all under "optim"): "schedule" = null/"constant" (the
    reference protocol) | "warmup_cosine" (linear warmup then cosine decay
    to end_factor * peak over decay_steps) | "warmup_constant" (linear
    warmup then flat); "warmup_steps" (default 500), "decay_steps",
    "end_factor" (default 0.05). The reference's drivers hard-code
    constant LR (legacy_code/train.py:60); schedules are what its
    real-data path lacked to converge (VERDICT r4 #3)."""
    lr = opt_cfg["learning_rate"]
    sched = (opt_cfg.get("schedule") or "constant").lower()
    if sched == "constant":
        return lr
    warmup = int(opt_cfg.get("warmup_steps", 500))
    if sched == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps=warmup,
            decay_steps=int(opt_cfg["decay_steps"]),
            end_value=lr * float(opt_cfg.get("end_factor", 0.05)))
    if sched == "warmup_constant":
        return optax.linear_schedule(0.0, lr, warmup)
    raise ValueError(f"unknown lr schedule: {sched}")


def build_optimizer(optim_type: str, learning_rate,
                    weight_decay: Optional[float] = None,
                    max_grad_norm: Optional[float] = None,
                    max_update_norm: Optional[float] = None) -> optax.GradientTransformation:
    """Build an optax chain from the reference's config vocabulary.
    learning_rate: a float, or an optax schedule (make_lr_schedule).

    max_grad_norm clips RAW gradients (standard, but note: the batch-summed
    CTC loss produces gradient norms of O(1e13) through the 100-block
    eye-init stacks at init — a threshold of O(100) rescales gradients
    below Adamax's eps and destroys the update direction entirely; measured
    on TPU, the loss then climbs). max_update_norm instead clips the
    post-optimizer UPDATE (whose norm is ~lr*sqrt(n_params), O(1) here) —
    the scale-correct divergence guard for adaptive optimizers."""
    optim_type = optim_type.lower()
    if optim_type == "adam":
        tx = optax.adam(learning_rate)
    elif optim_type == "adamw":
        tx = optax.adamw(learning_rate, weight_decay=weight_decay or 0.0)
        weight_decay = None  # already applied
    elif optim_type == "adagrad":
        tx = optax.adagrad(learning_rate)
    elif optim_type == "adamax":
        tx = optax.adamax(learning_rate)
    elif optim_type == "rmsprop":
        tx = optax.rmsprop(learning_rate)
    elif optim_type == "sgd":
        tx = optax.sgd(learning_rate)
    else:
        raise ValueError(f"unknown optimizer type: {optim_type}")

    parts = []
    if max_grad_norm:
        parts.append(_clip_by_global_norm_safe(max_grad_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(tx)
    if max_update_norm:
        parts.append(_clip_by_global_norm_safe(max_update_norm))
    return optax.chain(*parts)


def _clip_by_global_norm_safe(max_norm: float) -> optax.GradientTransformation:
    """optax.clip_by_global_norm with an overflow-proof norm.

    The stock clip squares in f32: a FINITE gradient tree with |g|max
    ~1e18 (which the batch-summed CTC loss produces) reads global norm
    inf, the trust ratio becomes max_norm/inf = 0, and every update is
    silently zeroed — the same failure family as the round-5 skip-guard
    freeze (trainer.all_finite). Same EmptyState, so checkpoints are
    structurally unchanged."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        from wavenet_speech_tpu.training.trainer import global_norm_safe

        g = global_norm_safe(updates)
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(g, 1e-30))
        return jax.tree_util.tree_map(lambda u: u * scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


@dataclasses.dataclass
class Optimizer:
    """Stateful facade mirroring the reference Optimizer class API
    (step/zero_grad/adjust_lr), including a working adjust_lr via the LR
    multiplier (the reference left it as a stub, Optimizer.py:27-31)."""

    optim_type: str
    lr: float
    weight_decay: Optional[float] = None
    max_grad_norm: Optional[float] = None

    def __post_init__(self):
        self.tx = build_optimizer(self.optim_type, self.lr,
                                  self.weight_decay, self.max_grad_norm)
        self._lr_scale = 1.0

    def init(self, params):
        return self.tx.init(params)

    def update(self, grads, opt_state, params):
        updates, opt_state = self.tx.update(grads, opt_state, params)
        if self._lr_scale != 1.0:
            updates = jax.tree_util.tree_map(
                lambda u: u * self._lr_scale, updates)
        return updates, opt_state

    def adjust_lr(self, new_lr: float):
        self._lr_scale = new_lr / self.lr


class ReduceLROnPlateau:
    """Host-side plateau scheduler (torch semantics subset used by
    pretrain_rnn.py:158: mode=min, factor, patience)."""

    def __init__(self, optimizer: Optimizer, factor: float = 0.1,
                 patience: int = 10, min_lr: float = 0.0):
        self.optimizer = optimizer
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = float("inf")
        self.bad_steps = 0
        self.current_lr = optimizer.lr

    def step(self, metric: float):
        if metric < self.best:
            self.best = metric
            self.bad_steps = 0
            return
        self.bad_steps += 1
        if self.bad_steps > self.patience:
            self.current_lr = max(self.current_lr * self.factor, self.min_lr)
            self.optimizer.adjust_lr(self.current_lr)
            self.bad_steps = 0
