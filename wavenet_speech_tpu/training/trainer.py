"""Train state and jitted train/eval steps.

Replaces the reference's five divergent driver loops (wavenet_speech.py,
train_tnt.py, pretrain_tnt.py, pretrain_rnn.py, legacy_code/train.py) with
one functional core: a TrainState pytree and step factories that close over
the model(s) and loss, and compile to a single XLA program per config.

Two step shapes cover every reference driver:
  * make_joint_train_step: WaveNet base + WaveNetClassifier CTC head with
    joint XE+CTC loss (wavenet_speech.py:41-101, legacy_code/train.py:24-61)
  * make_ctc_train_step: single CTC network (RawCTCNet) with CTC loss
    (pretrain_tnt.py:86-225, legacy_code/run_raw_ctc.py)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from wavenet_speech_tpu.training.loss import JointLoss
from wavenet_speech_tpu.ops.ctc import ctc_loss_per_seq


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Carryable training state: params pytree(s), optimizer state, step."""

    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation):
        return cls(params=params, opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))


def _cast(tree, dtype):
    if dtype is None:
        return tree
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating)
        else a, tree)


def all_finite(tree) -> jnp.ndarray:
    """True iff every element of every leaf is finite. The overflow-proof
    skip-guard predicate: testing finiteness of optax.global_norm instead
    FALSELY fails on fully-finite gradients once their scale passes
    ~1.8e19 — global_norm squares in f32, and the batch-summed CTC loss
    through the eval-scale stack produces finite grads with |g|max ~1e17-
    1e18 whose sum of squares exceeds f32 max (3.4e38). Measured on
    hardware: every leg-3 step of the round-5 quality run was silently
    skipped this way for 12k steps with zero non-finite grad ELEMENTS
    (results/tpu_r5/freeze_repro.json)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.stack([jnp.all(jnp.isfinite(l)) for l in leaves]).all()


def global_norm_safe(tree) -> jnp.ndarray:
    """Overflow-proof global L2 norm: rescale by the global absmax before
    squaring, so O(1e18)-magnitude finite trees report their true norm
    instead of inf (see all_finite). Returns 0 for an all-zero tree; a
    non-finite tree reports a non-finite norm, as the naive norm does."""
    leaves = jax.tree_util.tree_leaves(tree)
    absmax = jnp.stack([jnp.max(jnp.abs(l)) for l in leaves]).max()
    scale = jnp.maximum(absmax, jnp.finfo(jnp.float32).tiny)
    ssq = sum(jnp.sum(jnp.square(l / scale)) for l in leaves)
    return jnp.where(absmax > 0, scale * jnp.sqrt(ssq), 0.0)


def _scan_steps(step_fn, k: int, same_batch: bool, unroll: int = 1):
    """Wrap a (state, batch) -> (state, metrics) step body into a K-step
    device-side loop: ONE dispatched XLA program runs k optimizer steps.

    Why: every dispatch through the remote-PJRT tunnel costs ~3-4 ms of
    host overhead on top of the ~30 ms device step (RESULTS.md round-4
    trace: device 30.6 ms busy vs 33.4-35.4 ms host-observed) — the same
    per-step driver boundary the reference pays in its Python loop
    (wavenet_speech.py:59-80, one .cuda() dispatch per step). Running k
    steps per call amortizes it to ~0.4 ms/step.

    same_batch=True re-feeds one batch to every inner step (bench.py's
    fixed-batch workload); otherwise `batch` must carry a leading axis of
    length k (k stacked batches) that the scan consumes one per step.
    Metrics come back stacked with shape (k,) per entry."""

    def multi_fn(state, batch):
        if same_batch:
            def body(s, _):
                return step_fn(s, batch)

            return jax.lax.scan(body, state, None, length=k, unroll=unroll)
        return jax.lax.scan(step_fn, state, batch, unroll=unroll)

    return multi_fn


def make_joint_train_step(base_model, ctc_model, tx,
                          loss: Optional[JointLoss] = None,
                          donate: bool = True,
                          compute_dtype=None,
                          logit_length_fn: Optional[Callable] = None,
                          steps_per_call: int = 1,
                          multi_same_batch: bool = False,
                          scan_unroll: int = 1):
    """Jitted joint (XE + CTC) step over a {"base":..., "ctc":...} param
    tree. batch is the dict pytree from data/prefetch.batch_to_device.

    compute_dtype=jnp.bfloat16 runs the conv stacks in bf16 (mixed
    precision: f32 master params and f32 losses/grads accumulation —
    params are cast on entry to the forward; CTC/XE losses always compute
    in f32 internally).

    steps_per_call > 1 compiles a device-side K-step loop (_scan_steps):
    one dispatch runs K optimizer steps, erasing the per-step tunnel
    dispatch tax; metrics come back stacked (K,). With
    multi_same_batch=False the batch pytree must carry a leading K axis.

    Returns step_fn(state, batch) -> (state, metrics dict)."""
    loss = loss or JointLoss("joint")

    def _signal(batch):
        sig = batch["signal"]
        if sig.ndim == 2:
            # quantized LEVELS shipped from host (data/hdf5.py
            # device_onehot): one-hot HERE, on device — the one-hot form
            # is num_levels x bigger and host->device transfer through
            # the tunnel dominates the hdf5 path otherwise
            return jax.nn.one_hot(sig, base_model.in_dim,
                                  dtype=jnp.float32)
        return sig

    def loss_fn(params, batch):
        signal = _cast(_signal(batch), compute_dtype)
        cparams = _cast(params, compute_dtype)
        signal_pred = base_model.apply(cparams["base"], signal)
        # the classifier reads the WaveNet's output distribution, exactly as
        # in inference (facade Model.predict; reference Model.py:55-59,
        # legacy_code/train.py:31-33 "run classifier on wavenet output")
        logits = ctc_model.apply(cparams["ctc"], signal_pred)
        # reference semantics: CTC over full logit length (Loss.py:50);
        # logit_length_fn maps true signal lengths -> per-seq logit lengths
        # so statically-padded batches don't train blanks on pad frames
        if logit_length_fn is not None:  # length-aware mode
            xe, ctc = loss.calculate(
                signal, signal_pred, logits, batch["labels"],
                batch["label_lengths"],
                logit_lengths=logit_length_fn(batch["signal_lengths"]),
                signal_lengths=batch["signal_lengths"])
        else:  # reference-default: full lengths, unmasked XE
            xe, ctc = loss.calculate(signal, signal_pred, logits,
                                     batch["labels"], batch["label_lengths"])
        if xe is None:
            total = ctc
        else:
            total = loss.joint_weight * xe + loss.ctc_weight * ctc
        return total, {"xe_loss": (jnp.zeros(()) if xe is None else xe),
                       "ctc_loss": ctc}

    def step_fn(state: TrainState, batch):
        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        # non-finite step SKIP (see make_ctc_train_step): params and
        # optimizer state carry through a poisoned step unchanged.
        # all_finite/global_norm_safe, NOT isfinite(optax.global_norm):
        # the naive norm overflows f32 on finite grads past ~1.8e19 and
        # would silently freeze training (round-5 postmortem).
        gnorm = global_norm_safe(grads)
        ok = jnp.isfinite(total) & all_finite(grads)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates)
        opt_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_opt_state, state.opt_state)
        params = optax.apply_updates(state.params, updates)
        # non-gradient state (BatchNorm running statistics): recomputed from
        # the PRE-update leaves so optimizer side effects (e.g. weight
        # decay) never touch them
        params = dict(params, base=base_model.update_state(
            state.params["base"], params["base"], batch["signal"]))
        metrics = dict(metrics, total_loss=total, grad_norm=gnorm,
                       skipped_nonfinite=(~ok).astype(jnp.int32))
        return TrainState(params, opt_state, state.step + 1), metrics

    if steps_per_call > 1:
        step_fn = _scan_steps(step_fn, steps_per_call, multi_same_batch,
                              scan_unroll)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_ctc_train_step(model, tx, average_per_logit: bool = True,
                        use_logit_lengths: bool = False,
                        length_fn: Optional[Callable[[int], int]] = None,
                        donate: bool = True,
                        compute_dtype=None,
                        preprocess: Optional[Callable] = None,
                        steps_per_call: int = 1,
                        multi_same_batch: bool = False,
                        scan_unroll: int = 1):
    """Jitted CTC-only step for a single encoder (e.g. RawCTCNet).

    average_per_logit: divide the summed CTC by T (reference per-logit
    average, pretrain_tnt.py:159-162).
    use_logit_lengths: derive per-sequence logit lengths from the batch's
    signal_lengths via length_fn (the reference always uses full length).
    compute_dtype: see make_joint_train_step.
    preprocess: optional signal -> signal map applied in the input dtype
    BEFORE the compute_dtype cast (e.g. batch-stat normalization of raw
    pico-amp signals, the reference's BatchNorm1d(1) base model — raw
    values quantize badly if cast to bf16 un-normalized).
    steps_per_call / multi_same_batch / scan_unroll: see
    make_joint_train_step (device-side K-step loop)."""

    def loss_fn(params, batch):
        signal = batch["signal"]
        if preprocess is not None:
            signal = preprocess(signal)
        logits = model.apply(_cast(params, compute_dtype),
                             _cast(signal, compute_dtype))
        B, T = logits.shape[0], logits.shape[1]
        if use_logit_lengths and length_fn is not None:
            logit_lengths = length_fn(batch["signal_lengths"])
        else:
            logit_lengths = jnp.full((B,), T, jnp.int32)
        ctc = jnp.sum(ctc_loss_per_seq(logits, logit_lengths,
                                       batch["labels"],
                                       batch["label_lengths"]))
        if average_per_logit:
            ctc = ctc / T
        return ctc, {"ctc_loss": ctc}

    def step_fn(state: TrainState, batch):
        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        # Non-finite step SKIP: a bf16 loss spike can overflow the loss or
        # gradients in ONE step; update-norm clipping cannot save it
        # (nan * scale = nan) and a single poisoned step NaNs the params
        # forever (observed twice in the anneal leg of the quality run,
        # RESULTS.md). Skip the whole update — params AND optimizer state
        # carry through unchanged — and report it. Structure-preserving, so
        # checkpoints remain compatible.
        # all_finite/global_norm_safe, NOT isfinite(optax.global_norm):
        # the naive norm squares in f32 and overflows to inf on FINITE
        # grads once their scale passes ~1.8e19 — which the batch-summed
        # CTC loss reaches in practice — turning this guard into a silent
        # permanent freeze (every step skipped, loss still finite; the
        # round-5 leg-3 postmortem, results/tpu_r5/freeze_repro.json).
        gnorm = global_norm_safe(grads)
        ok = jnp.isfinite(total) & all_finite(grads)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates)
        opt_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_opt_state, state.opt_state)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, total_loss=total, grad_norm=gnorm,
                       skipped_nonfinite=(~ok).astype(jnp.int32))
        return TrainState(params, opt_state, state.step + 1), metrics

    if steps_per_call > 1:
        step_fn = _scan_steps(step_fn, steps_per_call, multi_same_batch,
                              scan_unroll)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(base_model, ctc_model, loss: Optional[JointLoss] = None,
                   compute_dtype=None,
                   logit_length_fn: Optional[Callable] = None):
    """Jitted validation step returning the same metrics (and the same
    objective weighting / length handling) as the train step, without
    updates."""
    loss = loss or JointLoss("joint")

    def eval_fn(params, batch):
        sig = batch["signal"]
        if sig.ndim == 2:  # quantized levels -> one-hot on device (see
            sig = jax.nn.one_hot(sig, base_model.in_dim,  # joint step)
                                 dtype=jnp.float32)
        signal = _cast(sig, compute_dtype)
        cparams = _cast(params, compute_dtype)
        signal_pred = base_model.apply(cparams["base"], signal)
        logits = ctc_model.apply(cparams["ctc"], signal_pred)
        kwargs = {}
        if logit_length_fn is not None:
            kwargs = {"logit_lengths": logit_length_fn(batch["signal_lengths"]),
                      "signal_lengths": batch["signal_lengths"]}
        xe, ctc = loss.calculate(signal, signal_pred, logits,
                                 batch["labels"], batch["label_lengths"],
                                 **kwargs)
        total = (ctc if xe is None
                 else loss.joint_weight * xe + loss.ctc_weight * ctc)
        return {"xe_loss": (jnp.zeros(()) if xe is None else xe),
                "ctc_loss": ctc, "total_loss": total}

    return jax.jit(eval_fn)
