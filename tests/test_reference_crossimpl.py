"""TRUE cross-implementation parity (VERDICT r2 weak #7): run the
reference's OWN torch modules (imported read-only from /root/reference —
they execute on modern torch) and our JAX models with the reference's
weights mapped in, on the same inputs. Logits must match to fp tolerance
and greedy CTC decodes must BIT-match — the north-star "bit-matched greedy
decodes" claim, crossing implementations rather than regenerating our own
golden fixture.

Weight mapping: torch Conv1d (C_out, C_in, K) -> ours (K, C_in, C_out);
the reference block's separate conv_tanh/conv_sigmoid (block.py:43-44) and
conv1x1_residual/skip (block.py:45-46) concatenate into our fused gate /
out1x1 kernels; nn.Linear (out, in) -> ours (in, out).
"""
import os

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout unavailable")


def _ref_modules():
    import sys

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from modules.classifier import WaveNetClassifier as RefClassifier
        from modules.raw_ctcnet import RawCTCNet as RefRawCTCNet
        from modules.wavenet import WaveNet as RefWaveNet
    return RefWaveNet, RefClassifier, RefRawCTCNet


def _t(x):
    return np.asarray(x.detach().numpy(), np.float32)


def _conv_w(sd, key):
    return np.transpose(_t(sd[f"{key}.weight"]), (2, 1, 0))


def _map_block(sd, p):
    """Reference ResidualBlock params under prefix p -> our fused tree."""
    gate_w = np.concatenate([_conv_w(sd, f"{p}.conv_tanh.conv1d"),
                             _conv_w(sd, f"{p}.conv_sigmoid.conv1d")], axis=2)
    gate_b = np.concatenate([_t(sd[f"{p}.conv_tanh.conv1d.bias"]),
                             _t(sd[f"{p}.conv_sigmoid.conv1d.bias"])])
    out_w = np.concatenate([_conv_w(sd, f"{p}.conv1x1_residual"),
                            _conv_w(sd, f"{p}.conv1x1_skip")], axis=2)
    out_b = np.concatenate([_t(sd[f"{p}.conv1x1_residual.bias"]),
                            _t(sd[f"{p}.conv1x1_skip.bias"])])
    return {
        "gate": {"w": gate_w, "b": gate_b},
        "out1x1": {"w": out_w, "b": out_b},
        "residual_proj": {"w": _t(sd[f"{p}.residual_proj.weight"]).T,
                          "b": _t(sd[f"{p}.residual_proj.bias"])},
    }


def _map_1x1(sd, key):
    """nn.Conv1d(.,.,1) -> our (in, out) matrix + bias."""
    return {"w": _t(sd[f"{key}.weight"])[:, :, 0].T,
            "b": _t(sd[f"{key}.bias"])}


def _map_stack(sd, n_layers, stack_template):
    """convolutions.{i} + bottlenecks.{i} -> our SkipSumStack tree, matching
    the template's unrolled-vs-cycle-scanned structure."""
    import jax
    import jax.numpy as jnp

    per_layer = [{
        "block": _map_block(sd, f"convolutions.{i}"),
        "bottleneck": _map_1x1(sd, f"bottlenecks.{i}"),
    } for i in range(n_layers)]
    if "blocks" in stack_template:
        return {"blocks": {str(i): per_layer[i] for i in range(n_layers)}}
    cyc = stack_template["cycle"]
    c = len(cyc)  # blocks per cycle (keys b0..b{c-1})
    repeats = n_layers // c
    cycles = [{f"b{j}": per_layer[r * c + j] for j in range(c)}
              for r in range(repeats)]
    return {"cycle": jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs], 0), *cycles)}


def _greedy(logits_blc):
    """(B, L, C) -> list of collapsed label lists (blank 0)."""
    from wavenet_speech_tpu.decoding.greedy import ctc_collapse

    return ctc_collapse(np.argmax(logits_blc, axis=-1))


def test_wavenet_full_model_crossimpl():
    import torch

    RefWaveNet, _, _ = _ref_modules()
    from wavenet_speech_tpu.models import WaveNet

    layers = ((8, 8, 2, 1), (8, 8, 2, 2), (8, 8, 2, 4))
    torch.manual_seed(0)
    ref = RefWaveNet(8, 2, list(layers), 8, softmax=False).eval()
    ours = WaveNet(8, 2, layers, 8, softmax=False)
    sd = ref.state_dict()
    import jax

    params = ours.init(jax.random.PRNGKey(0))
    mapped = {
        "entry": {"w": _conv_w(sd, "entry_conv1d.conv1d"),
                  "b": _t(sd["entry_conv1d.conv1d.bias"])},
        "stack": _map_stack(sd, len(layers), params["stack"]),
        "out1": _map_1x1(sd, "output_stack.1"),
        "out2": _map_1x1(sd, "output_stack.3"),
    }
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 64)).astype(np.float32)  # (B, C, L) ref
    with torch.no_grad():
        y_ref = _t(ref(torch.from_numpy(x)))                # (B, C, L)
    y_ours = np.asarray(ours.apply(mapped, np.transpose(x, (0, 2, 1))))
    np.testing.assert_allclose(y_ours, np.transpose(y_ref, (0, 2, 1)),
                               rtol=1e-5, atol=1e-5)


def test_wavenet_cycle_scan_crossimpl():
    """The lax.scan-over-cycles stack (our TPU-first compile-time design)
    must also bit-track the reference's unrolled loop."""
    import torch

    RefWaveNet, _, _ = _ref_modules()
    from wavenet_speech_tpu.models import WaveNet

    layers = ((8, 8, 2, 1), (8, 8, 2, 2)) * 3  # cycle of 2, repeats 3
    torch.manual_seed(1)
    ref = RefWaveNet(8, 2, list(layers), 8, softmax=False).eval()
    ours = WaveNet(8, 2, layers, 8, softmax=False)
    import jax

    params = ours.init(jax.random.PRNGKey(0))
    assert "cycle" in params["stack"]  # the scan path is what's under test
    sd = ref.state_dict()
    mapped = {
        "entry": {"w": _conv_w(sd, "entry_conv1d.conv1d"),
                  "b": _t(sd["entry_conv1d.conv1d.bias"])},
        "stack": _map_stack(sd, len(layers), params["stack"]),
        "out1": _map_1x1(sd, "output_stack.1"),
        "out2": _map_1x1(sd, "output_stack.3"),
    }
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 48)).astype(np.float32)
    with torch.no_grad():
        y_ref = _t(ref(torch.from_numpy(x)))
    y_ours = np.asarray(ours.apply(mapped, np.transpose(x, (0, 2, 1))))
    np.testing.assert_allclose(y_ours, np.transpose(y_ref, (0, 2, 1)),
                               rtol=1e-4, atol=1e-5)


def test_classifier_crossimpl_and_greedy_bitmatch():
    import torch

    _, RefClassifier, _ = _ref_modules()
    from wavenet_speech_tpu.models import WaveNetClassifier

    layers = ((8, 8, 2, 1), (8, 8, 2, 2))
    torch.manual_seed(2)
    ref = RefClassifier(8, 5, list(layers), 8, pool_kernel_size=2,
                        input_kernel_size=2, input_dilation=1,
                        softmax=False).eval()
    ours = WaveNetClassifier(8, 5, layers, 8, pool_kernel_size=2,
                             softmax=False)
    import jax

    params = ours.init(jax.random.PRNGKey(0))
    sd = ref.state_dict()
    mapped = {
        "input_block": _map_block(sd, "input_block"),
        "input_bottleneck": _map_1x1(sd, "input_skip_bottleneck"),
        "stack": _map_stack(sd, len(layers), params["stack"]),
        "out1": _map_1x1(sd, "output_block.1"),
        "out2": _map_1x1(sd, "output_block.3"),
    }
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 8, 64)).astype(np.float32)
    with torch.no_grad():
        y_ref = _t(ref(torch.from_numpy(x)))                # (B, 5, L/2)
    y_ours = np.asarray(ours.apply(mapped, np.transpose(x, (0, 2, 1))))
    y_ref_blc = np.transpose(y_ref, (0, 2, 1))
    np.testing.assert_allclose(y_ours, y_ref_blc, rtol=1e-5, atol=1e-5)
    # the north-star check, cross-implementation: greedy CTC decodes of the
    # two implementations are IDENTICAL label sequences
    for a, b in zip(_greedy(y_ours), _greedy(y_ref_blc)):
        assert list(a) == list(b)


def test_raw_ctcnet_crossimpl_and_greedy_bitmatch():
    import torch

    _, _, RefRawCTCNet = _ref_modules()
    from wavenet_speech_tpu.models import RawCTCNet

    F = 16
    layers = ((F, F, 2, 1), (F, F, 2, 2))
    torch.manual_seed(3)
    ref = RefRawCTCNet(F, 3, 5, list(layers), F, positions=True,
                       softmax=False, causal=False).eval()
    ours = RawCTCNet(F, 3, 5, layers, F, positions=True, softmax=False,
                     causal=False)
    import jax

    params = ours.init(jax.random.PRNGKey(0))
    sd = ref.state_dict()
    mapped = {
        "feat_conv": {"w": _conv_w(sd, "feature_layer.0"),
                      "b": _t(sd["feature_layer.0.bias"])},
        "feat_1x1": {"w": np.transpose(_t(sd["feature_layer.2.weight"]),
                                       (2, 1, 0)),
                     "b": _t(sd["feature_layer.2.bias"])},
        "positions_1x1": {
            "w": _t(sd["positions_conv1x1.0.weight"])[:, 0, 0][None, :],
            "b": _t(sd["positions_conv1x1.0.bias"])},
        "input_block": _map_block(sd, "input_block"),
        "input_bottleneck": _map_1x1(sd, "input_skip_bottleneck"),
        "stack": _map_stack(sd, len(layers), params["stack"]),
        "out1": _map_1x1(sd, "output_block.1"),
        "out2": _map_1x1(sd, "output_block.3"),
    }
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 1, 80)).astype(np.float32)
    with torch.no_grad():
        y_ref = _t(ref(torch.from_numpy(x)))                # (B, 5, L+fk-1)
    y_ours = np.asarray(ours.apply(mapped, np.transpose(x, (0, 2, 1))))
    y_ref_blc = np.transpose(y_ref, (0, 2, 1))
    assert y_ours.shape == y_ref_blc.shape  # the L+fk-1 quirk, both impls
    np.testing.assert_allclose(y_ours, y_ref_blc, rtol=1e-4, atol=1e-4)
    for a, b in zip(_greedy(y_ours), _greedy(y_ref_blc)):
        assert list(a) == list(b)
