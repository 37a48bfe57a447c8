"""Fast incremental WaveNet generation must be self-consistent with the
parallel forward: for the sequence it generates, the full-model prediction
at each position must reproduce the step that generated the next sample."""
import numpy as np
import jax
import jax.numpy as jnp

from wavenet_speech_tpu.models import WaveNet
from wavenet_speech_tpu.models.fast_wavenet import generate


def _model(C_lvl=16, ch=8, dils=(1, 2, 4)):
    layers = tuple((ch, ch, 2, d) for d in dils)
    # entry maps in_dim -> layers[0][0]
    return WaveNet(C_lvl, 2, layers, C_lvl, softmax=False)


def test_incremental_matches_parallel_forward():
    model = _model()
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    B, L0, C = 2, 6, 16
    prime_levels = rng.integers(0, C, size=(B, L0))
    prime = jax.nn.one_hot(jnp.asarray(prime_levels), C)

    T = 10
    levels, probs = generate(model, params, prime, T)
    assert levels.shape == (B, T) and probs.shape == (B, T, C)

    # teacher-forced check: run the parallel model over prime + generated
    # one-hots; softmax of its output at position t must equal probs at the
    # step that emitted level t+1
    gen_onehot = jax.nn.one_hot(levels, C)
    full_in = jnp.concatenate([prime, gen_onehot], axis=1)
    full_out = jax.nn.softmax(model.apply(params, full_in), axis=-1)
    # step j (emitting sample L0+j) corresponds to parallel position L0-1+j
    for j in range(T):
        np.testing.assert_allclose(np.asarray(probs[:, j]),
                                   np.asarray(full_out[:, L0 - 1 + j]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(levels[:, j]),
            np.asarray(jnp.argmax(full_out[:, L0 - 1 + j], -1)))


def test_short_prime_and_sampling():
    model = _model(dils=(1, 2))
    params = model.init(jax.random.PRNGKey(2))
    prime = jax.nn.one_hot(jnp.asarray([[3]]), 16)  # L0 = 1
    levels, probs = generate(model, params, prime, 5,
                             key=jax.random.PRNGKey(3), temperature=0.8)
    assert levels.shape == (1, 5)
    assert (np.asarray(levels) >= 0).all() and (np.asarray(levels) < 16).all()
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-4)


def test_scan_stacked_params_path():
    """Generation must work when the stack uses cycle-scan stacked params."""
    ch = 8
    layers = tuple((ch, ch, 2, d) for d in (1, 2)) * 3  # cyclic -> scan
    model = WaveNet(16, 2, layers, 16, softmax=False)
    params = model.init(jax.random.PRNGKey(4))
    assert "cycle" in params["stack"]
    prime = jax.nn.one_hot(jnp.asarray([[1, 2, 3]]), 16)
    levels, probs = generate(model, params, prime, 4)
    gen_onehot = jax.nn.one_hot(levels, 16)
    full_in = jnp.concatenate([prime, gen_onehot], axis=1)
    full_out = jax.nn.softmax(model.apply(params, full_in), axis=-1)
    np.testing.assert_allclose(np.asarray(probs[:, 0]),
                               np.asarray(full_out[:, 2]), rtol=1e-4,
                               atol=1e-5)


def test_general_kernel_widths_match_parallel():
    """General-k fast path (reference linear_conv_ops get_ker_ixs was
    general-k): k=3 entry + mixed k=2/k=3/k=5 dilated blocks."""
    ch, C = 8, 16
    layers = ((ch, ch, 3, 1), (ch, ch, 2, 2), (ch, ch, 5, 2), (ch, ch, 3, 4))
    model = WaveNet(C, 3, layers, C, softmax=False)
    params = model.init(jax.random.PRNGKey(5))
    rng = np.random.default_rng(6)
    B, L0 = 2, 7
    prime = jax.nn.one_hot(jnp.asarray(rng.integers(0, C, size=(B, L0))), C)

    T = 9
    levels, probs = generate(model, params, prime, T)
    gen_onehot = jax.nn.one_hot(levels, C)
    full_in = jnp.concatenate([prime, gen_onehot], axis=1)
    full_out = jax.nn.softmax(model.apply(params, full_in), axis=-1)
    for j in range(T):
        np.testing.assert_allclose(np.asarray(probs[:, j]),
                                   np.asarray(full_out[:, L0 - 1 + j]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(levels[:, j]),
            np.asarray(jnp.argmax(full_out[:, L0 - 1 + j], -1)))


def test_general_k_short_prime():
    """Prime shorter than the entry kernel (zero left-padding path)."""
    ch, C = 8, 16
    model = WaveNet(C, 4, ((ch, ch, 3, 2),), C, softmax=False)
    params = model.init(jax.random.PRNGKey(7))
    prime = jax.nn.one_hot(jnp.asarray([[5]]), C)  # L0=1 < ke=4
    T = 6
    levels, probs = generate(model, params, prime, T)
    gen_onehot = jax.nn.one_hot(levels, C)
    full_in = jnp.concatenate([prime, gen_onehot], axis=1)
    full_out = jax.nn.softmax(model.apply(params, full_in), axis=-1)
    for j in range(T):
        np.testing.assert_allclose(np.asarray(probs[:, j]),
                                   np.asarray(full_out[:, j]),
                                   rtol=1e-4, atol=1e-5)
