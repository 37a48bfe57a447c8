"""Offline bisection of a dumped anomalous training step.

Loads a forensic dump written by examples/gaussian_eval.py's skip-guard
hook (training/diagnostics.dump_anomaly) and re-runs the exact step
section-by-section in BOTH bf16 and f32 (training/diagnostics.
section_report), printing the first non-finite stage in each — i.e.
WHERE the overflow happens and whether it is precision-induced.

Usage:
  python tools/bisect_nonfinite.py --dump runs/<run>/anomalies/step_N_nonfinite \
      --scale 1.0 --nhid 512 [--platform cpu] [--out report.json]

The --scale/--nhid flags must match the run that produced the dump
(examples/gaussian_eval.py build_model).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", required=True)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--nhid", type=int, default=512)
    ap.add_argument("--platform", default="cpu",
                    help="cpu (default: the bisect is offline) or empty "
                         "for the session default")
    ap.add_argument("--out", default=None, help="write full reports here")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from examples.gaussian_eval import build_model
    from wavenet_speech_tpu.ops.norm import batch_standardize
    from wavenet_speech_tpu.training.diagnostics import (
        first_nonfinite, load_anomaly, section_report)

    model = build_model(args.scale, remat=False, nhid=args.nhid)
    template = model.init(jax.random.PRNGKey(0))
    batch, params = load_anomaly(args.dump, template)
    with open(os.path.join(args.dump, "meta.json")) as f:
        meta = json.load(f)
    print(f"dump: step {meta['step']} ({meta['note']}), recorded loss "
          f"{meta.get('ctc_loss')}, grad_norm {meta.get('grad_norm')}")

    reports = {}
    for name, dtype in (("bf16", jnp.bfloat16), ("f32", None)):
        rep = section_report(model, params, batch, compute_dtype=dtype,
                             preprocess=batch_standardize)
        reports[name] = rep
        site = first_nonfinite(rep)
        print(f"\n=== {name} ===  loss={rep['loss']:.6g}  "
              f"first_nonfinite={site}  "
              f"probe==model.apply: {rep['probe_matches_model_apply']}")
        for stage, finite, mx in rep["stages"]:
            flag = "" if finite else "   <-- NON-FINITE"
            print(f"  {stage:<14} max|x| {mx:12.6g}{flag}")
        for k, v in rep["grads"].items():
            flag = "" if v["finite"] else "   <-- NON-FINITE"
            print(f"  grad:{k:<12} max|g| {v['max_abs']:12.6g} "
                  f"sumsq_f32 {v['sumsq_f32']:12.6g}{flag}")
        print(f"  global_norm sum-of-squares (f32): "
              f"{rep['gnorm_sumsq_f32']:.6g}"
              + ("   <-- OVERFLOWS f32" if not
                 __import__("numpy").isfinite(rep["gnorm_sumsq_f32"])
                 else ""))

    b16 = first_nonfinite(reports["bf16"])
    f32 = first_nonfinite(reports["f32"])
    if b16 and not f32:
        verdict = (f"PRECISION-INDUCED: bf16 first goes non-finite at "
                   f"'{b16}'; the same step is finite in f32")
    elif b16 and f32:
        verdict = (f"NUMERIC DIVERGENCE (not precision): non-finite at "
                   f"'{b16}' (bf16) / '{f32}' (f32)")
    elif not b16 and not f32:
        verdict = ("NOT REPRODUCED offline: both dtypes finite — suspect "
                   "the donated-buffer state or optimizer interaction, "
                   "not the forward/backward math")
    else:
        verdict = f"f32-only non-finite at '{f32}' (unexpected)"
    print(f"\nVERDICT: {verdict}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"meta": meta, "verdict": verdict,
                       "reports": reports}, f, indent=1)
        print(f"full reports -> {args.out}")


if __name__ == "__main__":
    main()
