"""Facade layer: the reference's intended top-level API (Model.py, Loss.py,
Optimizer.py, Decoder.py, Dataset.py), rebuilt so it actually composes (the
reference versions carry syntax errors and were never run — SURVEY.md
"repo health caveat").

Model       — ('wavenet-ctc' | 'raw-ctcnet') base+CTC pair with
              predict/save/restore (Model.py:7-75)
Dataset     — datatype-dispatching loader wrapper (Dataset.py:12-73)
Decoder     — 'argmax' or 'beam' logits decoding (Decoder.py:4-41); 'beam'
              here is true CTC prefix beam search (what the reference's
              eval notebooks used native ctcdecode for), not the
              label-synchronous seq2seq beam of Decoder.py.
Loss/Optimizer live in training/ (JointLoss, Optimizer).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_speech_tpu.models import RawCTCNet, WaveNet, WaveNetClassifier
from wavenet_speech_tpu.nn.core import Module, Params
from wavenet_speech_tpu.utils.config import base_model_cfg, classifier_cfg
from wavenet_speech_tpu.data import (
    DEFAULT_CURRENTS,
    GaussianModelLoader,
    PoreModelLoader,
    QueueLoader,
    RawGaussianModelLoader,
)


@dataclasses.dataclass(frozen=True)
class BatchNorm1d(Module):
    """Batch normalization over (batch, time) for raw signals — the
    reference uses nn.BatchNorm1d(1) as the 'base' model of the raw-ctcnet
    pair (Model.py:51), whose eval mode normalizes with RUNNING statistics.

    Training forward (use_running=False) normalizes with current batch
    stats (biased variance), exactly torch train mode; the running mean /
    unbiased-variance EMA (torch momentum semantics: new = (1-m)*old +
    m*batch) is maintained by `update_state`, which the train step calls
    outside the gradient path. Eval/inference uses the use_running=True
    variant (`Model.eval_base()`), matching torch .eval()."""

    num_features: int = 1
    eps: float = 1e-5
    momentum: float = 0.1  # torch nn.BatchNorm1d default
    use_running: bool = False

    def init(self, key) -> Params:
        del key
        return {"gamma": jnp.ones((self.num_features,)),
                "beta": jnp.zeros((self.num_features,)),
                "mean": jnp.zeros((self.num_features,)),   # running stats:
                "var": jnp.ones((self.num_features,))}     # zero-grad leaves

    def apply(self, params: Params, x):
        if self.use_running:
            mean, var = params["mean"], params["var"]
        else:
            mean = jnp.mean(x, axis=(0, 1))
            var = jnp.var(x, axis=(0, 1))
        return params["gamma"] * (x - mean) * jax.lax.rsqrt(var + self.eps) \
            + params["beta"]

    def update_state(self, old_params: Params, new_params: Params,
                     *inputs) -> Params:
        x = inputs[0]
        n = x.shape[0] * x.shape[1]
        bm = jnp.mean(x, axis=(0, 1))
        bv = jnp.var(x, axis=(0, 1)) * (n / max(n - 1, 1))  # unbiased (torch)
        m = self.momentum
        return dict(new_params,
                    mean=(1 - m) * old_params["mean"] + m * bm,
                    var=(1 - m) * old_params["var"] + m * bv)


class Model:
    """Base + CTC model pair with a single params pytree
    {"base":..., "ctc":...}."""

    def __init__(self, model_type: str, cfg: Optional[Dict[str, Any]] = None):
        assert model_type in ("wavenet-ctc", "raw-ctcnet")
        self.model_type = model_type
        cfg = cfg or {}

        if model_type == "wavenet-ctc":
            b = base_model_cfg(cfg)
            c = classifier_cfg(cfg)
            self.model_base = WaveNet(b["signal_dim"], b["entry_kwidth"],
                                      b["layers"], b["out_dim"],
                                      softmax=False, remat=b["remat"],
                                      use_pallas=b["use_pallas"])
            self.model_ctc = WaveNetClassifier(c["in_dim"], c["num_labels"],
                                               c["layers"], c["out_dim"],
                                               pool_kernel_size=c["downsample"],
                                               softmax=False)
        else:
            # defaults from the (intended) reference raw-ctcnet config
            # (Model.py:41-53): 2048 feats, k=3, 20 dilation cycles, out 512
            m = cfg.get("model", {}).get("raw", {})
            nfeats = m.get("num_features", 2048)
            fk = m.get("feature_kwidth", 3)
            num_labels = m.get("num_labels", 5)
            blocks = m.get("num_dilation_blocks", 20)
            kernel = m.get("kernel", 3)
            dils = tuple(m.get("dilations", [1, 2, 4, 8, 16, 32, 64]))
            out_dim = m.get("out_dim", 512)
            layers = tuple((nfeats, nfeats, kernel, d) for d in dils) * blocks
            self.model_base = BatchNorm1d(1)
            self.model_ctc = RawCTCNet(nfeats, fk, num_labels, layers,
                                       out_dim, softmax=False,
                                       causal=m.get("causal", False),
                                       remat=m.get("remat", True))

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        return {"base": self.model_base.init(k1),
                "ctc": self.model_ctc.init(k2)}

    def eval_base(self):
        """The base model in eval mode: BatchNorm normalizes with running
        statistics (torch .eval() semantics); stateless bases unchanged."""
        if isinstance(self.model_base, BatchNorm1d):
            return dataclasses.replace(self.model_base, use_running=True)
        return self.model_base

    def predict(self, params: Params, signal):
        """base -> ctc pipeline (Model.py:55-59) in EVAL mode (running-stat
        BatchNorm for raw-ctcnet); returns (base_out, logits)."""
        base_out = self.eval_base().apply(params["base"], signal)
        return base_out, self.model_ctc.apply(params["ctc"], base_out)

    def save(self, path: str, params: Params):
        from wavenet_speech_tpu.training.checkpoint import save_params

        save_params(path, params)

    def restore(self, path: str, params_like: Params) -> Params:
        from wavenet_speech_tpu.training.checkpoint import restore_params

        return restore_params(path, params_like)


class Dataset:
    """Datatype-dispatching loader (Dataset.py:12-73), with the reference's
    hardcoded hyperparameters as overridable keyword defaults."""

    QUEUE_TYPES = ("hdf5", "raw-hdf5")

    def __init__(self, datatype: str, dataset: Optional[str] = None, **kw):
        assert datatype in ("pore", "gauss", "hdf5",
                            "raw-pore", "raw-gauss", "raw-hdf5")
        self.datatype = datatype
        p = dict(max_iters=kw.get("max_iters", 1000),
                 num_epochs=kw.get("num_epochs", 1),
                 epoch_size=kw.get("epoch_size", 1000))
        bsz = kw.get("batch_size", 8)
        nlevels = kw.get("num_levels", 256)
        lengths = (kw.get("min_length", 90), kw.get("max_length", 100))
        upsample = kw.get("upsampling", 4)
        noise = kw.get("sample_noise", 2.0)
        pw = kw.get("pore_width", 4)
        seed = kw.get("seed")
        # static output shapes by default: jitted train steps compile ONCE
        # instead of once per batch-length combination (the reference pads
        # only to the per-batch max, utils/pore_model.py:107-127)
        static_shapes = kw.get("static_shapes", True)

        # synthetic datatypes get a dedicated infinite validation generator
        # (separate seed) so validation doesn't consume the training budget —
        # the analogue of the hdf5 loader's separate valid queue
        p_valid = dict(max_iters=2 ** 62, num_epochs=2 ** 30,
                       epoch_size=p["epoch_size"])
        vseed = None if seed is None else seed + 10 ** 6
        if datatype in ("pore", "raw-pore"):
            mk = lambda pp, s: PoreModelLoader(
                **pp, batch_size=bsz, num_levels=nlevels, lengths=lengths,
                pore_width=pw, sample_rate=upsample,
                currents_dict=DEFAULT_CURRENTS, sample_noise=noise,
                raw_signal=(datatype == "raw-pore"), seed=s)
            self.data = mk(p, seed)
            self.valid_data = mk(p_valid, vseed)
        elif datatype == "gauss":
            mk = lambda pp, s: GaussianModelLoader(
                **pp, batch_size=bsz, num_levels=nlevels,
                upsampling=upsample, lengths=lengths, seed=s)
            self.data = mk(p, seed)
            self.valid_data = mk(p_valid, vseed)
        elif datatype == "raw-gauss":
            mk = lambda pp, s: RawGaussianModelLoader(
                **pp, batch_size=bsz, upsampling=upsample, lengths=lengths,
                seed=s)
            self.data = mk(p, seed)
            self.valid_data = mk(p_valid, vseed)
        elif datatype == "hdf5":
            # static shapes can't be derived from the HDF5 a priori (signal
            # length = sum of per-event chunks); callers pass pad_to /
            # labels_pad_to to compile the train step once instead of once
            # per batch-shape combination
            self.data = QueueLoader(
                dataset, num_epochs=p["num_epochs"], max_iters=p["max_iters"],
                num_workers=kw.get("nworkers", 1),
                queue_size=kw.get("queue_size", 50), batch_size=bsz,
                sample_lengths=lengths, num_levels=nlevels, seed=seed,
                pad_to=kw.get("pad_to"),
                labels_pad_to=kw.get("labels_pad_to"),
                device_onehot=kw.get("device_onehot", False))
        else:
            raise NotImplementedError("raw-hdf5 currently unsupported "
                                      "(matches reference Dataset.py:57-58)")

        if static_shapes and datatype not in self.QUEUE_TYPES:
            for ld in (self.data, self.valid_data):
                if hasattr(ld, "max_signal_length"):
                    ld.pad_to = ld.max_signal_length
                    ld.labels_pad_to = ld.max_label_length

    @property
    def signal_channels(self) -> int:
        return getattr(self.data, "signal_channels", 256)

    def fetch(self, train_or_valid: str = "train"):
        if self.datatype in self.QUEUE_TYPES:
            return self.data.dequeue(from_queue=train_or_valid)
        if train_or_valid == "valid":
            return self.valid_data.fetch()
        return self.data.fetch()

    def close(self):
        if self.datatype in self.QUEUE_TYPES:
            self.data.close()


class Decoder:
    """'argmax' or 'beam' decoding of (B, L, C) logits -> strings
    (Decoder.py:4-41).

    Beam engines (engine=):
      'device' — on-device lax.scan prefix beam search (default)
      'native' — multithreaded C++ decoder (native/ctc_beam.cc)
      'python' — host numpy reference implementation
    """

    def __init__(self, decoder: str = "argmax", beam_width: int = 7,
                 blank: int = 0, engine: str = "device",
                 prune: "int | None" = None):
        assert decoder in ("argmax", "beam")
        assert engine in ("device", "native", "python")
        self.decoder_type = decoder
        self.beam_width = beam_width
        self.blank = blank
        self.engine = engine
        # per-frame top-K label pre-prune for large alphabets (ctcdecode's
        # cutoff_top_n); device engine only, None = exact
        self.prune = prune

    def decode(self, logits, lengths=None, return_times: bool = False):
        """-> (scores, strings[, times]): times (one int list per sequence,
        the emission frame of each output label) reproduces the native
        ctcdecode's third output (eval notebook cells 19-22); supported by
        the 'device' and 'native' beam engines."""
        from wavenet_speech_tpu.decoding import (
            beam_search_decode,
            ctc_beam_search_jax,
            greedy_ctc_decode,
            labels2strings,
        )

        if self.decoder_type == "argmax":
            if return_times:
                raise ValueError("times are a beam-engine output")
            return None, greedy_ctc_decode(np.asarray(logits), lengths,
                                           self.blank)
        if self.engine == "device":
            prefixes, plens, scores, times = ctc_beam_search_jax(
                logits, lengths, beam_width=self.beam_width, blank=self.blank,
                return_times=True, prune=self.prune)
            prefixes, plens = np.asarray(prefixes), np.asarray(plens)
            results = [prefixes[b, 0, : plens[b, 0]]
                       for b in range(prefixes.shape[0])]
            out = ([float(s) for s in np.asarray(scores)[:, 0]],
                   labels2strings(results))
            if return_times:
                times = np.asarray(times)
                out += ([times[b, 0, : plens[b, 0]].tolist()
                         for b in range(prefixes.shape[0])],)
            return out
        if self.engine == "native":
            from wavenet_speech_tpu.native import ctc_beam_search_native

            labels, lens, scores, times = ctc_beam_search_native(
                np.asarray(logits), beam_width=self.beam_width,
                blank=self.blank, lengths=lengths, return_times=True)
            results = [labels[b, : lens[b]] for b in range(labels.shape[0])]
            out = ([float(s) for s in scores], labels2strings(results))
            if return_times:
                out += ([times[b, : lens[b]].tolist()
                         for b in range(labels.shape[0])],)
            return out
        if return_times:
            raise ValueError("times need the 'device' or 'native' engine")
        results, scores = beam_search_decode(np.asarray(logits),
                                             self.beam_width, self.blank,
                                             lengths)
        return scores, labels2strings(results)
