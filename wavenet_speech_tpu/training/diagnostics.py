"""Anomaly forensics for long training runs: capture + bisect non-finite
steps.

The reference's numerics (warp-ctc through Loss.py:48-53, torch f32
everywhere) never needed this; our mixed-precision (bf16 compute) long
runs have diverged on single loss spikes (RESULTS.md anneal legs). The
trainer's non-finite skip guard (trainer.py) keeps the run alive but used
to DISCARD the poisoned batch — so the overflow site could never be
located. This module:

  * dump_anomaly: save the exact (batch, params) pair at the moment the
    guard fires. Because the skip guard carries params through unchanged,
    post-step params == pre-step params on a skipped step — the dump is an
    exact reproduction kit.
  * section_report: re-run the forward SECTION BY SECTION (featurizer ->
    input block -> each residual cycle -> output head -> CTC) plus the
    backward per top-level param group, recording max|x| and finiteness at
    every stage, in any compute dtype. Comparing the bf16 report against
    the f32 report on the same dump names the first tensor that goes
    non-finite and whether it is precision-induced.
  * first_nonfinite: the first stage name whose stats are non-finite.

Offline driver: tools/bisect_nonfinite.py. CPU-runnable (tests
tests/test_diagnostics.py).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_speech_tpu.ops.conv import _conv1d
from wavenet_speech_tpu.ops.activations import hardtanh, leaky_relu
from wavenet_speech_tpu.ops.ctc import ctc_loss_per_seq


# --------------------------------------------------------------------------
# dump


def dump_anomaly(dump_dir: str, batch, params, step: int, note: str,
                 extra: Optional[Dict[str, Any]] = None,
                 max_dumps: int = 3) -> Optional[str]:
    """Persist the forensic kit for one anomalous step.

    batch: host Batch (data/common.Batch) or dict with the same fields.
    params: the model params pytree (NOT the optimizer state — the bisect
    only needs the forward/backward).

    Layout: <dump_dir>/step_<step>_<note>/{batch.npz, params/, meta.json}.
    Returns the dump path, or None if it already exists (re-exec of the
    same failing step) or max_dumps is reached."""
    from wavenet_speech_tpu.training.checkpoint import save_params

    os.makedirs(dump_dir, exist_ok=True)
    existing = [d for d in os.listdir(dump_dir) if d.startswith("step_")]
    path = os.path.join(dump_dir, f"step_{int(step)}_{note}")
    if os.path.isdir(path) or len(existing) >= max_dumps:
        return None
    os.makedirs(path)
    fields = (batch if isinstance(batch, dict) else {
        "signal": batch.signal, "labels": batch.labels,
        "label_lengths": batch.label_lengths,
        "signal_lengths": batch.signal_lengths})
    np.savez(os.path.join(path, "batch.npz"),
             **{k: np.asarray(v) for k, v in fields.items()})
    save_params(os.path.join(path, "params"),
                jax.tree_util.tree_map(np.asarray, params))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"step": int(step), "note": note,
                   **{k: float(v) for k, v in (extra or {}).items()}}, f)
    return path


def load_anomaly(path: str, params_like):
    """Inverse of dump_anomaly: returns (batch dict of np arrays, params)."""
    from wavenet_speech_tpu.training.checkpoint import restore_params

    with np.load(os.path.join(path, "batch.npz")) as z:
        batch = {k: z[k] for k in z.files}
    params = restore_params(os.path.join(path, "params"), params_like)
    return batch, params


# --------------------------------------------------------------------------
# section-wise report


def _cast(tree, dtype):
    if dtype is None:
        return tree
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating)
        else a, tree)


def _stat(x):
    """(finite?, max|x|) computed in f32 (inf survives the upcast)."""
    x32 = jnp.asarray(x, jnp.float32)
    return jnp.all(jnp.isfinite(x32)), jnp.max(jnp.abs(x32))


def section_report(model, params, batch: Dict[str, np.ndarray],
                   compute_dtype=None, preprocess=None,
                   average_per_logit: bool = True) -> Dict[str, Any]:
    """Stage-by-stage numeric health of one RawCTCNet train step.

    Recomputes the forward exactly as RawCTCNet.apply (single-device path;
    cross-checked: the final logits must match model.apply bit-for-bit)
    but with (finite?, max|x|) probes after every section, then the
    backward with per-top-level-group gradient stats and the f32
    sum-of-squares each group contributes to optax.global_norm — the norm
    itself can overflow f32 when grads are O(1e13)+ (sum of ~1e8 squares).

    Returns {"stages": [(name, finite, max_abs), ... in execution order],
             "grads": {group: {...}}, "loss": float, "gnorm_sumsq": float}.
    """
    stack = model._stack()
    c, repeats, use_scan = stack._scan_config()

    def fwd_probes(cp, signal):
        probes = []  # (name, finite, max_abs)
        fk = model.feature_kwidth
        h = fk - 1
        out = _conv1d(signal, cp["feat_conv"]["w"], dilation=1,
                      pad_left=h, pad_right=h) + cp["feat_conv"]["b"]
        probes.append(("feat_conv",) + _stat(out))
        out = leaky_relu(out)
        out = jnp.einsum("blc,kcd->bld", out, cp["feat_1x1"]["w"]) \
            + cp["feat_1x1"]["b"]
        probes.append(("feat_1x1",) + _stat(out))
        out = leaky_relu(out)
        if model.positions:
            L = out.shape[1]
            pos = jnp.arange(0, L, dtype=jnp.float32)[None, :, None]
            pos = pos.astype(out.dtype)
            p = cp["positions_1x1"]
            out = out + hardtanh(pos @ p["w"][None] + p["b"])
            probes.append(("positions",) + _stat(out))
        out, skip = model._input_block().apply(cp["input_block"], out)
        probes.append(("input_block",) + _stat(out))
        ib = cp["input_bottleneck"]
        skips = skip @ ib["w"] + ib["b"]

        if use_scan:
            cycle_specs = model.layers[:c]

            def cycle_step(carry, cycle_params):
                o, sk = carry
                for j, spec in enumerate(cycle_specs):
                    o, sk = stack._apply_one(cycle_params[f"b{j}"], spec,
                                             o, sk)
                (_, mo) = _stat(o)
                (_, ms) = _stat(sk)
                return (o, sk), (mo, ms)

            (out, skips), (mo, ms) = jax.lax.scan(
                cycle_step, (out, skips), cp["stack"]["cycle"])
            cyc = [("cycles_out", jnp.all(jnp.isfinite(mo)), jnp.max(mo)),
                   ("cycles_skips", jnp.all(jnp.isfinite(ms)), jnp.max(ms))]
        else:
            # unrolled path (the flagship: 50 k=2 + 50 k=3 blocks have no
            # global cycle, stack.detect_cycle -> len(layers)) — record
            # per-BLOCK maxima instead of per-cycle
            o, sk = out, skips
            mo_l, ms_l = [], []
            for i, spec in enumerate(model.layers):
                o, sk = stack._apply_one(cp["stack"]["blocks"][str(i)],
                                         spec, o, sk)
                mo_l.append(_stat(o)[1])
                ms_l.append(_stat(sk)[1])
            out, skips = o, sk
            mo, ms = jnp.stack(mo_l), jnp.stack(ms_l)
            cyc = [("blocks_out", jnp.all(jnp.isfinite(mo)), jnp.max(mo)),
                   ("blocks_skips", jnp.all(jnp.isfinite(ms)), jnp.max(ms))]
        per_cycle_max = (mo, ms)
        probes.extend(cyc)

        hh = leaky_relu(skips) @ cp["out1"]["w"] + cp["out1"]["b"]
        probes.append(("out1",) + _stat(hh))
        logits = leaky_relu(hh) @ cp["out2"]["w"] + cp["out2"]["b"]
        probes.append(("logits",) + _stat(logits))
        return logits, probes, per_cycle_max

    def loss_fn(p, signal, labels, label_lengths):
        cp = _cast(p, compute_dtype)
        logits, probes, per_cycle = fwd_probes(cp, signal)
        B, T = logits.shape[0], logits.shape[1]
        per_seq = ctc_loss_per_seq(logits,
                                   jnp.full((B,), T, jnp.int32),
                                   labels, label_lengths)
        ctc = jnp.sum(per_seq)
        if average_per_logit:
            ctc = ctc / T
        return ctc, (probes, per_seq, logits, per_cycle)

    @jax.jit
    def run(p, batch):
        signal = jnp.asarray(batch["signal"])
        if preprocess is not None:
            signal = preprocess(signal)
        signal = _cast(signal, compute_dtype)
        (loss, (probes, per_seq, logits, per_cycle)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(
                p, signal, jnp.asarray(batch["labels"]),
                jnp.asarray(batch["label_lengths"]))
        gstats = {}
        for k, g in grads.items():
            leaves = jax.tree_util.tree_leaves(g)
            fin = jnp.all(jnp.stack(
                [jnp.all(jnp.isfinite(l_)) for l_ in leaves]))
            mx = jnp.max(jnp.stack(
                [jnp.max(jnp.abs(l_.astype(jnp.float32))) for l_ in leaves]))
            ss = sum(jnp.sum(jnp.square(l_.astype(jnp.float32)))
                     for l_ in leaves)
            gstats[k] = {"finite": fin, "max_abs": mx, "sumsq_f32": ss}
        probe_fin = jnp.stack([p_[1] for p_ in probes])
        probe_max = jnp.stack([p_[2] for p_ in probes])
        ctc_stat = _stat(per_seq)
        return (loss, probe_fin, probe_max, ctc_stat, gstats, logits,
                per_cycle)

    (loss, probe_fin, probe_max, ctc_stat, gstats, logits, per_cycle) = \
        run(params, batch)

    names = _stage_names(model, use_scan)
    stages = [(n, bool(f), float(m))
              for n, f, m in zip(names, np.asarray(probe_fin),
                                 np.asarray(probe_max))]
    stages.append(("ctc_per_seq", bool(ctc_stat[0]), float(ctc_stat[1])))
    report = {
        "compute_dtype": str(compute_dtype) if compute_dtype else "float32",
        "loss": float(loss),
        "stages": stages,
        "grads": {k: {kk: (bool(vv) if kk == "finite" else float(vv))
                      for kk, vv in v.items()}
                  for k, v in gstats.items()},
        "gnorm_sumsq_f32": float(sum(float(v["sumsq_f32"])
                                     for v in gstats.values())),
    }
    mo, ms = per_cycle
    report["per_cycle_max_out"] = [float(x) for x in np.asarray(mo)]
    report["per_cycle_max_skips"] = [float(x) for x in np.asarray(ms)]
    # cross-check: the probed forward IS the model forward
    ref_logits = model.apply(
        _cast(params, compute_dtype),
        _cast(jnp.asarray(batch["signal"]) if preprocess is None
              else preprocess(jnp.asarray(batch["signal"])), compute_dtype))
    lg, rf = np.asarray(logits, np.float32), np.asarray(ref_logits,
                                                        np.float32)
    both = np.isfinite(lg) & np.isfinite(rf)
    report["probe_matches_model_apply"] = bool(
        np.array_equal(np.isfinite(lg), np.isfinite(rf))
        and (not both.any() or float(np.max(np.abs(lg[both] - rf[both])))
             <= 1e-3 * max(1.0, float(np.max(np.abs(rf[both]))))))
    return report


def _stage_names(model, use_scan):
    names = ["feat_conv", "feat_1x1"]
    if model.positions:
        names.append("positions")
    names.append("input_block")
    names += (["cycles_out", "cycles_skips"] if use_scan
              else ["blocks_out", "blocks_skips"])
    names += ["out1", "logits"]
    return names


def first_nonfinite(report: Dict[str, Any]) -> Optional[str]:
    """Name of the first stage (execution order; grads after the forward)
    that is non-finite, or None."""
    for name, finite, _ in report["stages"]:
        if not finite:
            return name
    if not np.isfinite(report["loss"]):
        return "loss"
    for k, v in report["grads"].items():
        if not v["finite"]:
            return f"grad:{k}"
    if not np.isfinite(report["gnorm_sumsq_f32"]):
        return "global_norm_sumsq"
    return None
