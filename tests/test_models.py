"""Model-level tests, mirroring reference tests/test_wavenet.py /
test_classifier.py shape checks, plus the cycle-scan equivalence (the scan
optimization must be bit-identical to the unrolled stack)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from wavenet_speech_tpu.models import WaveNet, WaveNetClassifier, RawCTCNet
from wavenet_speech_tpu.models.stack import SkipSumStack, detect_cycle


def test_detect_cycle():
    cyc = [(8, 8, 2, d) for d in [1, 2, 4, 8]]
    assert detect_cycle(cyc * 5) == 4
    assert detect_cycle(cyc) == 4
    assert detect_cycle([(8, 8, 2, 1), (8, 8, 2, 3)]) == 2
    assert detect_cycle([(8, 8, 2, 1), (8, 8, 2, 3), (8, 8, 2, 1)]) == 3


def test_scan_equals_unrolled():
    layers = tuple((8, 8, 2, d) for d in [1, 2, 4]) * 4
    scan_stack = SkipSumStack(layers, out_dim=6)
    unrolled = dataclasses.replace(scan_stack, min_scan_repeats=10**9)
    key = jax.random.PRNGKey(0)
    p_scan = scan_stack.init(key)
    p_unroll = unrolled.init(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 8))
    out_s, skip_s = scan_stack.apply(p_scan, x)
    out_u, skip_u = unrolled.apply(p_unroll, x)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(skip_s), np.asarray(skip_u),
                               rtol=1e-5, atol=1e-6)


def test_wavenet_shapes():
    in_dim, out_dim = 32, 32
    layers = [(in_dim, in_dim, 2, d) for d in [1, 2, 4, 8] * 2]
    net = WaveNet(in_dim, 2, tuple(layers), out_dim, softmax=True)
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 100, in_dim))
    y = net.apply(params, x)
    assert y.shape == (3, 100, out_dim)
    np.testing.assert_allclose(np.asarray(jnp.sum(y, -1)), 1.0, rtol=1e-4)
    # receptive field formula
    assert net.receptive_field == 2 + sum(d for d in [1, 2, 4, 8] * 2)


def test_classifier_shapes():
    in_dim, num_labels, out_dim = 32, 5, 16
    layers = tuple((in_dim, in_dim, 3, d) for d in [1, 2, 4] * 2)
    clf = WaveNetClassifier(in_dim, num_labels, layers, out_dim,
                            pool_kernel_size=3, softmax=False)
    params = clf.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 99, in_dim))
    y = clf.apply(params, x)
    assert y.shape == (2, 33, num_labels)


def test_raw_ctcnet_shapes_and_quirk_length():
    F, fk, num_labels, out_dim = 16, 5, 5, 8
    layers = tuple((F, F, 3, d) for d in [1, 2, 4] * 2)
    net = RawCTCNet(F, fk, num_labels, layers, out_dim, positions=True,
                    softmax=False)
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 50, 1))
    y = net.apply(params, x)
    # featurizer pads both sides without slicing -> L + fk - 1
    assert y.shape == (2, net.output_length(50), num_labels)
    assert net.output_length(50) == 54


def test_wavenet_grad_flows():
    in_dim = 8
    layers = tuple((in_dim, in_dim, 2, d) for d in [1, 2])
    net = WaveNet(in_dim, 2, layers, in_dim, softmax=False)
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, in_dim))

    def loss_fn(p):
        return jnp.sum(net.apply(p, x) ** 2)

    g = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)
    assert any(float(jnp.abs(t).sum()) > 0 for t in flat)


def test_wavenet_scan_cycles_flag_value_identical():
    """scan_cycles=False (unrolled cycles, the bench --no-scan experiment)
    must be value-identical to the scan default given re-stacked params."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wavenet_speech_tpu.models import WaveNet, WaveNetClassifier
    from wavenet_speech_tpu.models.stack import detect_cycle

    C = 8
    layers = tuple((C, C, 2, d) for d in (1, 2)) * 3
    wn = WaveNet(C, 2, layers, C, softmax=False)
    wn_u = dataclasses.replace(wn, scan_cycles=False)
    p = wn.init(jax.random.PRNGKey(0))
    # re-layout cycle-stacked params into unrolled blocks/<i>
    c = detect_cycle(layers)
    blocks = {}
    for r in range(len(layers) // c):
        for j in range(c):
            blocks[str(r * c + j)] = jax.tree_util.tree_map(
                lambda a: a[r], p["stack"]["cycle"][f"b{j}"])
    p_u = dict(p, stack={"blocks": blocks})
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 32, C)),
                    jnp.float32)
    np.testing.assert_allclose(np.asarray(wn.apply(p, x)),
                               np.asarray(wn_u.apply(p_u, x)),
                               rtol=1e-6, atol=1e-6)

    clf = WaveNetClassifier(C, 5, layers, C, pool_kernel_size=2,
                            softmax=False)
    clf_u = dataclasses.replace(clf, scan_cycles=False)
    pc = clf.init(jax.random.PRNGKey(2))
    blocks = {}
    for r in range(len(layers) // c):
        for j in range(c):
            blocks[str(r * c + j)] = jax.tree_util.tree_map(
                lambda a: a[r], pc["stack"]["cycle"][f"b{j}"])
    pc_u = dict(pc, stack={"blocks": blocks})
    np.testing.assert_allclose(np.asarray(clf.apply(pc, x)),
                               np.asarray(clf_u.apply(pc_u, x)),
                               rtol=1e-6, atol=1e-6)
