"""Profiling helpers + multi-host utility behavior (single-process mode)."""
import numpy as np
import jax
import jax.numpy as jnp

from wavenet_speech_tpu.parallel.distributed import (
    initialize_multihost,
    is_primary,
    local_batch_slice,
)
from wavenet_speech_tpu.utils.profiling import (
    StepTimer,
    conv_stack_flops,
    mfu,
)


def test_initialize_multihost_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    initialize_multihost()  # must be a no-op, not raise
    assert is_primary()
    assert local_batch_slice(16) == slice(0, 16)


def test_step_timer_sync():
    t = StepTimer()
    x = jnp.ones((256, 256))
    f = jax.jit(lambda a: a @ a)
    for _ in range(3):
        with t.step(sync_value=None):
            y = f(x)
        _ = float(y[0, 0])
    assert len(t.times) == 3 and t.mean > 0
    assert t.percentile(50) >= 0


def test_flops_and_mfu():
    layers = [(256, 256, 2, d) for d in (1, 2, 4)]
    fwd = conv_stack_flops(layers, seq_len=100, batch=2, train=False)
    train = conv_stack_flops(layers, seq_len=100, batch=2, train=True)
    train_remat = conv_stack_flops(layers, 100, 2, train=True, remat=True)
    assert train == 3 * fwd and train_remat == 4 * fwd
    assert 0 < mfu(train, 1.0) < 1e-3  # tiny model, 1s step -> tiny MFU


def test_gaussian_eval_example_smoke():
    import importlib.util, os, sys

    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "gaussian_eval.py")
    spec = importlib.util.spec_from_file_location("gaussian_eval", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    res = mod.main(["--smoke", "--steps", "40", "--eval-batches", "1"])
    assert "avg_per_logit_ctc" in res and np.isfinite(res["avg_per_logit_ctc"])
    assert 0.0 <= res["mean_identity"] <= 1.0
