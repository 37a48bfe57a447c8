"""Regenerate the golden decode fixture (run manually from repo root:
`python tests/make_golden.py`). Fixed seeds everywhere; the paired test
asserts today's outputs bit-match the committed fixture, guarding numerical
drift across JAX/library versions (BASELINE north star: bit-matched greedy
CTC decodes on overfit fixtures)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from wavenet_speech_tpu.data import PoreModelLoader
from wavenet_speech_tpu.models import WaveNet, WaveNetClassifier
from wavenet_speech_tpu.ops.ctc import ctc_loss
from wavenet_speech_tpu.decoding import argmax_decode

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "golden", "overfit_fixture.npz")


def build():
    loader = PoreModelLoader(max_iters=10, num_epochs=1, epoch_size=10,
                             batch_size=2, num_levels=32, lengths=(8, 12),
                             sample_rate=2, sample_noise=0.5, seed=1234)
    batch = loader.fetch()
    C = 16
    base = WaveNet(32, 2, tuple((C, C, 2, d) for d in (1, 2, 4)), 32,
                   softmax=False)
    clf = WaveNetClassifier(32, 5, tuple((C, C, 2, d) for d in (1, 2, 4)),
                            C, pool_kernel_size=1, softmax=False)
    bp = base.init(jax.random.PRNGKey(42))
    cp = clf.init(jax.random.PRNGKey(43))
    signal = jnp.asarray(batch.signal)
    base_out = base.apply(bp, signal)
    logits = clf.apply(cp, base_out)  # base->ctc pipeline (Model.predict)
    loss = ctc_loss(logits,
                    jnp.full((2,), logits.shape[1], jnp.int32),
                    jnp.asarray(batch.labels),
                    jnp.asarray(batch.label_lengths))
    labels = argmax_decode(logits)
    return {
        "signal": batch.signal,
        "targets": batch.labels,
        "target_lengths": batch.label_lengths,
        "base_out": np.asarray(base_out, np.float32),
        "logits": np.asarray(logits, np.float32),
        "ctc_loss": np.asarray(loss, np.float32),
        "argmax_labels": np.asarray(labels, np.int32),
    }


if __name__ == "__main__":
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT, **build())
    print("wrote", OUT)
