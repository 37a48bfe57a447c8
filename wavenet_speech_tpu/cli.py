"""Config-driven trainer/evaluator CLI — the single entry point replacing
the reference's five divergent driver scripts (wavenet_speech.py:115-121 is
the interface mirrored here: `wavenet-speech-tpu {train,evaluate} cfg.json`).

Training semantics follow wavenet_speech.py:41-101: epoch loop with
per-epoch validation, early stopping on validation-loss threshold, periodic
checkpointing, crash-safe save in `finally`.  New vs reference: jitted
steps, device prefetch, samples/sec metrics, full-state (params+opt+step)
resumable checkpoints.
"""
from __future__ import annotations

import argparse
import os
import sys
import threading
import time
from typing import Optional

import numpy as np

# --- optional stall watchdog (long TPU runs over the flaky tunnel) -------
# A fresh tunnel connection can hang forever and never recovers in-process
# (CLAUDE.md); gaussian_eval.py re-execs itself on stall and resumes from
# its checkpoint. The CLI gets the same mitigation, gated on
# WAVENET_CLI_STALL_SECS (only meaningful when invoked as a process whose
# sys.argv can be re-exec'd — the wrapper scripts set it; programmatic
# callers like tools/bayes_opt.py leave it unset).
_progress = {"t": time.time(), "armed": False}


def _tick():
    _progress["t"] = time.time()


def _stall_watchdog(stall_seconds: float):
    while True:
        time.sleep(10)
        if _progress["armed"] and time.time() - _progress["t"] > stall_seconds:
            print("[cli] TPU transport stall; re-exec for checkpoint resume",
                  file=sys.stderr, flush=True)
            os.execv(sys.executable, [sys.executable] + sys.argv)


def _arm_watchdog():
    secs = os.environ.get("WAVENET_CLI_STALL_SECS")
    if secs:
        threading.Thread(target=_stall_watchdog, args=(float(secs),),
                         daemon=True).start()
        _tick()
        _progress["armed"] = True


def _logit_length_fn(cfg, model, model_type):
    """Maps true signal lengths -> per-sequence logit lengths for the
    model's CTC head (classifier downsample / RawCTCNet featurizer growth,
    models/raw_ctcnet.py output_length)."""
    if model_type == "wavenet-ctc":
        pool = cfg.get("model", {}).get("classifier", {}).get("downsample", 1)
        return lambda sl: sl // pool
    return model.model_ctc.output_length


def build_from_config(cfg):
    import jax

    from wavenet_speech_tpu.facade import Dataset, Model
    from wavenet_speech_tpu.training import (
        JointLoss,
        TrainState,
        build_optimizer,
        make_joint_train_step,
        make_eval_step,
        make_lr_schedule,
    )
    from wavenet_speech_tpu.utils.config import training_cfg

    t = training_cfg(cfg)
    datatype = t.get("datatype", "pore" if t["training_data"] is None else "hdf5")
    dataset = Dataset(
        datatype, dataset=t["training_data"],
        max_iters=t["max_iters"], num_epochs=t["num_epochs"],
        epoch_size=t["epoch_size"], batch_size=t["batch_size"],
        num_levels=cfg.get("model", {}).get("base", {}).get("signal_dim", 256),
        min_length=t["min_sample_length"], max_length=t["max_sample_length"],
        nworkers=t["nworkers"], seed=t.get("seed"),
        upsampling=t.get("upsampling", 4),
        sample_noise=t.get("sample_noise", 2.0),
        pad_to=t.get("pad_to"), labels_pad_to=t.get("labels_pad_to"),
        device_onehot=bool(t.get("device_onehot", False)),
    )

    model_type = cfg.get("model", {}).get("type", "wavenet-ctc")
    model = Model(model_type, cfg)
    params = model.init(jax.random.PRNGKey(t.get("seed") or 0))

    opt = t["optim"]
    tx = build_optimizer(opt["type"], make_lr_schedule(opt),
                         weight_decay=opt.get("wd") or None,
                         max_grad_norm=opt.get("max_grad_norm"),
                         max_update_norm=opt.get("max_update_norm"))
    state = TrainState.create(params, tx)

    loss_choice = t.get("loss", "joint" if model_type == "wavenet-ctc" else "ctc")
    loss = JointLoss(loss_choice)
    compute_dtype = None
    if str(t.get("compute_dtype", "")).lower() in ("bf16", "bfloat16"):
        import jax.numpy as jnp

        compute_dtype = jnp.bfloat16
    logit_length_fn = (_logit_length_fn(cfg, model, model_type)
                       if t.get("length_aware_ctc") else None)
    # donate=True: the old state's buffers are recycled into the new
    # state (halves live param+opt memory; VERDICT r3 weak #6). The state
    # is used linearly below — eval/checkpoints always read the NEW state.
    step = make_joint_train_step(model.model_base, model.model_ctc, tx, loss,
                                 donate=True, compute_dtype=compute_dtype,
                                 logit_length_fn=logit_length_fn)
    # steps_per_call > 1: a device-side K-step loop (trainer._scan_steps)
    # consumes K stacked batches per dispatch — amortizes the ~3-4 ms
    # per-dispatch tunnel tax the per-step loop pays (VERDICT r4 #2; the
    # reference pays the same boundary per step, wavenet_speech.py:59-80)
    K = int(t.get("steps_per_call", 1) or 1)
    multi_step = (make_joint_train_step(
        model.model_base, model.model_ctc, tx, loss, donate=True,
        compute_dtype=compute_dtype, logit_length_fn=logit_length_fn,
        steps_per_call=K, multi_same_batch=False) if K > 1 else None)
    eval_step = make_eval_step(model.eval_base(), model.model_ctc, loss,
                               compute_dtype=compute_dtype,
                               logit_length_fn=logit_length_fn)
    # optional XE-only pretraining phase (two-phase training of
    # legacy_code/wavenet_ctc_artificial.py:146-164)
    xe_iters = int(t.get("xe_pretrain_iters", 0) or 0)
    if xe_iters > 0 and loss_choice == "joint":
        xe_step = make_joint_train_step(
            model.model_base, model.model_ctc, tx,
            JointLoss("joint", ctc_weight=0.0), donate=True,
            compute_dtype=compute_dtype, logit_length_fn=logit_length_fn)
    else:
        xe_step = None
    return dataset, model, state, (step, xe_step, xe_iters, multi_step, K), \
        eval_step, t


def train(cfg) -> int:
    train_with_result(cfg)
    return 0


def train_with_result(cfg) -> dict:
    """Run the training loop and return final statistics — the programmatic
    entry the hyperparameter search (tools/bayes_opt.py) optimizes over.
    Returns {"vloss": best validation loss (train moving average when no
    validation stream produced a number), "train_loss", "steps"}."""
    import jax

    from wavenet_speech_tpu.data.prefetch import batch_to_device
    from wavenet_speech_tpu.training.checkpoint import (
        latest_step,
        restore_checkpoint,
        save_checkpoint,
        wait_for_async_saves,
    )
    from wavenet_speech_tpu.utils.config import config_to_json
    from wavenet_speech_tpu.utils.run_logging import Logger, MovingAverageMeter, Throughput

    _arm_watchdog()  # BEFORE the first backend touch (tunnel init can hang)
    dataset, model, state, (step_fn, xe_step_fn, xe_iters, multi_fn, K), \
        eval_fn, t = build_from_config(cfg)
    logger = Logger(t["save_dir"])
    config_to_json(cfg, f"{t['save_dir'].rstrip('/')}/config.json")

    if t.get("restore"):
        state = restore_checkpoint(t["restore"], state)
        logger.message(f"restored checkpoint from {t['restore']} "
                       f"@ step {int(state.step)}")
    elif latest_step(logger.ckpt_dir) is not None:
        state = restore_checkpoint(logger.ckpt_dir, state)
        logger.message(f"resumed from {logger.ckpt_dir} @ step {int(state.step)}")

    # fixed held-out validation batches: sampled ONCE, re-scored at every
    # print — a fresh random valid batch per print makes the valid curve
    # pure per-batch variance on generative datatypes (the round-4 HDF5
    # run's 4.2-5.7 oscillation; VERDICT r4 #3)
    fixed_valid = []
    for _ in range(int(t.get("fixed_valid_batches", 0) or 0)):
        try:
            fixed_valid.append(batch_to_device(dataset.fetch("valid")))
        except StopIteration:
            break

    meter = MovingAverageMeter(5)
    tput = Throughput()
    best_vloss = float("inf")
    stop_threshold = t.get("early_stop_vloss")
    step_idx = int(state.step)
    samples_acc = 0
    try:
        while True:
            _tick()
            prev_idx = step_idx
            # device-side K-step loop once past the XE-pretrain phase:
            # K batches stack on a leading scan axis, ship in ONE transfer,
            # and run as ONE dispatched program (build_from_config)
            use_multi = (multi_fn is not None
                         and (xe_step_fn is None or step_idx >= xe_iters))
            batches = []
            try:
                while len(batches) < (K if use_multi else 1):
                    batches.append(dataset.fetch("train"))
            except StopIteration:
                if not batches:
                    break
            if use_multi and len(batches) == K:
                stacked = jax.device_put({  # host-side stack, ONE transfer
                    "signal": np.stack([b.signal for b in batches]),
                    "labels": np.stack([b.labels for b in batches]),
                    "label_lengths": np.stack([b.label_lengths
                                               for b in batches]),
                    "signal_lengths": np.stack([b.signal_lengths
                                                for b in batches])})
                state, metrics = multi_fn(state, stacked)
                metrics = {k: v[-1] for k, v in metrics.items()}
                step_idx += K
            else:  # single steps (K=1, XE phase, or a ragged epoch tail)
                for b in batches:
                    dev = batch_to_device(b)
                    step_idx += 1
                    if xe_step_fn is not None and step_idx <= xe_iters:
                        state, metrics = xe_step_fn(state, dev)  # XE phase
                    else:
                        state, metrics = step_fn(state, dev)
            samples_acc += sum(int(np.prod(b.signal.shape[:2]))
                               for b in batches)

            if step_idx // t["print_every"] > prev_idx // t["print_every"]:
                # sync only here: reading the loss back every step would
                # serialize the async dispatch pipeline (the tunnel RTT
                # dominates small steps)
                meter.add(float(metrics["total_loss"]))
                # tick AFTER the sync so each window interval spans a full
                # print period including the device drain — per-step ticks
                # would measure async dispatch rate, not device throughput
                tput.tick(samples_acc)
                samples_acc = 0
                vloss = float("nan")
                if fixed_valid:
                    vloss = float(np.mean([
                        float(eval_fn(state.params, vb)["total_loss"])
                        for vb in fixed_valid]))
                else:
                    try:
                        vbatch = dataset.fetch("valid")
                        vloss = float(eval_fn(
                            state.params,
                            batch_to_device(vbatch))["total_loss"])
                    except StopIteration:
                        pass
                logger.log("loss", step_idx, meter.value, vloss)
                logger.metrics(step_idx, train_loss=meter.value,
                               valid_loss=vloss,
                               ctc_loss=float(metrics["ctc_loss"]),
                               samples_per_sec=tput.samples_per_sec)
                print(f"step {step_idx}: loss {meter.value:.4f} "
                      f"(valid {vloss:.4f}) "
                      f"[{(tput.samples_per_sec or 0):.0f} samples/s]")
                if not np.isnan(vloss) and vloss < best_vloss:
                    best_vloss = vloss
                # early stop on VALIDATION loss (reference
                # wavenet_speech.py:78-80); datatypes with no valid stream
                # fall back to the train moving average
                stop_crit = vloss if not np.isnan(vloss) else meter.value
                if stop_threshold is not None and stop_crit < stop_threshold:
                    logger.message(f"early stop at step {step_idx}: "
                                   f"loss {stop_crit:.4f} < {stop_threshold}")
                    break
            if step_idx // t["save_every"] > prev_idx // t["save_every"]:
                # async_checkpoint: true overlaps the serialization/write
                # with the next training steps (training/checkpoint.py)
                save_checkpoint(logger.ckpt_dir, state,
                                async_save=bool(t.get("async_checkpoint")))
                logger.message(f"checkpoint @ step {step_idx}")
    except KeyboardInterrupt:
        logger.message("interrupted; saving")
    finally:
        # crash-safe save-on-exit (reference wavenet_speech.py:96-101).
        # With donated steps an interrupt DURING a dispatched step can
        # leave `state` pointing at donated buffers — skip the final save
        # then (the periodic checkpoint stands) instead of crashing.
        try:
            wait_for_async_saves(logger.ckpt_dir)  # no-op in sync mode
            save_checkpoint(logger.ckpt_dir, state)
            logger.message(f"final checkpoint @ step {step_idx}")
        except RuntimeError as e:
            logger.message(f"final save skipped (donated buffers mid-step: "
                           f"{e})")
        dataset.close()
        logger.close()
    return {"vloss": (best_vloss if np.isfinite(best_vloss)
                      else meter.value),
            "train_loss": meter.value, "steps": step_idx}


def evaluate(cfg) -> int:
    import jax

    from wavenet_speech_tpu.data.prefetch import batch_to_device
    from wavenet_speech_tpu.facade import Decoder
    from wavenet_speech_tpu.training.checkpoint import restore_checkpoint
    from wavenet_speech_tpu.decoding import labels2strings

    dataset, model, state, _, eval_fn, t = build_from_config(cfg)
    ckpt = t.get("restore") or f"{t['save_dir'].rstrip('/')}/ckpts/"
    state = restore_checkpoint(ckpt, state)
    decoder = Decoder(t.get("decoder", "argmax"),
                      beam_width=t.get("beam_width", 7))
    # one jitted forward for decoding (model.predict run eagerly would cost
    # thousands of serialized dispatches through the tunnel)
    import jax.numpy as jnp

    C_sig = cfg.get("model", {}).get("base", {}).get("signal_dim", 256)

    def _predict(p, x):
        if x.ndim == 2:  # device_onehot levels batch (data/hdf5.py)
            x = jax.nn.one_hot(x, C_sig, dtype=jnp.float32)
        return model.predict(p, x)[1]

    predict_logits = jax.jit(_predict)
    llf = _logit_length_fn(cfg, model,
                           cfg.get("model", {}).get("type", "wavenet-ctc"))

    n_batches = t.get("eval_batches", 10)
    losses, identities = [], []
    for i in range(n_batches):
        try:
            # held-out stream for every datatype (synthetic datatypes have a
            # dedicated re-seeded valid generator in facade.Dataset)
            batch = dataset.fetch("valid")
        except StopIteration:
            break
        dev = batch_to_device(batch)
        m = eval_fn(state.params, dev)
        losses.append(float(m["total_loss"]))
        logits = predict_logits(state.params, dev["signal"])
        # exclude statically-padded frames from decoding
        _, decoded = decoder.decode(
            np.asarray(logits), lengths=np.asarray(llf(batch.signal_lengths)))
        truth_seqs = [batch.labels[b, : batch.label_lengths[b]]
                      for b in range(batch.labels.shape[0])]
        targets = labels2strings(truth_seqs)
        from wavenet_speech_tpu.decoding.alignment import batch_identity

        mean_id, _ = batch_identity([list(d) for d in decoded], targets)
        identities.append(mean_id)
        if t.get("print_samples") and i == 0:
            for d, tg in list(zip(decoded, targets))[:4]:
                print(f"  pred: {d}\n  true: {tg}")
    print(f"eval loss over {len(losses)} batches: "
          f"{np.mean(losses) if losses else float('nan'):.4f} | "
          f"basecall identity: "
          f"{np.mean(identities) if identities else float('nan'):.3f}")
    dataset.close()
    return 0


def basecall(cfg, signals_path: str, out_path: Optional[str] = None,
             long_reads: bool = False) -> int:
    """Basecall signals from an NPY/NPZ file and emit FASTA.

    Input file: 'signal' array — (B, L) raw float, (B, L) int quantized
    levels (one-hot encoded to the model's signal_dim), or (B, L, C)."""
    import jax
    import numpy as np

    from wavenet_speech_tpu.facade import Model
    from wavenet_speech_tpu.inference import Basecaller
    from wavenet_speech_tpu.training import TrainState, build_optimizer
    from wavenet_speech_tpu.training.checkpoint import restore_checkpoint
    from wavenet_speech_tpu.utils.config import training_cfg

    # inference needs no Dataset / train steps — build just the model and a
    # state template matching the checkpoint layout
    t = training_cfg(cfg)
    model_type = cfg.get("model", {}).get("type", "wavenet-ctc")
    model = Model(model_type, cfg)
    params = model.init(jax.random.PRNGKey(t.get("seed") or 0))
    opt = t["optim"]
    tx = build_optimizer(opt["type"], opt["learning_rate"],
                         weight_decay=opt.get("wd") or None,
                         max_grad_norm=opt.get("max_grad_norm"))
    state = TrainState.create(params, tx)
    ckpt = t.get("restore") or f"{t['save_dir'].rstrip('/')}/ckpts/"
    state = restore_checkpoint(ckpt, state)

    data = np.load(signals_path)
    sig = data["signal"] if hasattr(data, "files") else data
    if sig.ndim == 2 and np.issubdtype(sig.dtype, np.integer):
        C = cfg.get("model", {}).get("base", {}).get("signal_dim", 256)
        sig = jax.nn.one_hot(sig, C)
        sig = np.asarray(sig, np.float32)
    elif sig.ndim == 2 and model_type == "wavenet-ctc":
        # quantized-input model fed raw floats: apply the training
        # pipeline's mu-law quantization + one-hot (data/common.py, the
        # reference's utils/pore_model.py:58-96 law) per sequence
        from wavenet_speech_tpu.data.common import MuLawQuantizer, one_hot_lc

        C = cfg.get("model", {}).get("base", {}).get("signal_dim", 256)
        q = MuLawQuantizer(C)
        sig = np.stack([one_hot_lc(q(s), C) for s in sig.astype(np.float64)])
    elif sig.ndim == 2:
        sig = sig.astype(np.float32)[..., None]

    class _Pipe:
        def apply(self, params, x):
            _, logits = model.predict(params, x)
            return logits

    caller = Basecaller(model=_Pipe(), params=state.params,
                        beam_width=t.get("beam_width", 7),
                        cutoff_top_n=t.get("cutoff_top_n"),
                        logit_length_fn=_logit_length_fn(cfg, model,
                                                         model_type))
    if long_reads or sig.shape[1] > 65536:
        # production-length reads (10^5-10^6 samples): chunked forwards +
        # ONE batched streaming bounded-window beam over all reads
        # (inference.basecall_long_batch — the vmapped chunk scans decode
        # the whole batch concurrently; VERDICT r3 #4, parity vs the
        # monolithic beam in tests/test_streaming_beam.py)
        seqs, scores = caller.basecall_long_batch(sig)
    else:
        seqs, scores = caller(sig)
    lines = []
    for i, (s, sc) in enumerate(zip(seqs, scores)):
        lines.append(f">read_{i} score={sc:.3f}")
        lines.append(s)
    text = "\n".join(lines) + "\n"
    if out_path:
        with open(out_path, "w") as f:
            f.write(text)
    else:
        print(text, end="")
    return 0


def main(argv: Optional[list] = None) -> int:
    from wavenet_speech_tpu.utils.config import json_to_config

    ap = argparse.ArgumentParser(
        prog="wavenet-speech-tpu",
        description="TPU-native WaveNet-CTC trainer/evaluator/basecaller")
    ap.add_argument("command", choices=["train", "evaluate", "basecall"])
    ap.add_argument("config", help="path to JSON config")
    ap.add_argument("--signals", default=None,
                    help="basecall: NPY/NPZ file of signals")
    ap.add_argument("--out", default=None,
                    help="basecall: output FASTA path (default stdout)")
    ap.add_argument("--long", action="store_true",
                    help="basecall: force the long-read path (chunked "
                         "forward + streaming beam); auto above 65536 "
                         "samples")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    cfg = json_to_config(args.config)
    if args.command == "train":
        return train(cfg)
    if args.command == "basecall":
        if not args.signals:
            ap.error("basecall requires --signals")
        return basecall(cfg, args.signals, args.out, long_reads=args.long)
    return evaluate(cfg)


if __name__ == "__main__":
    sys.exit(main())
