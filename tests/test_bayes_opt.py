"""Bayesian hyperparameter search (working replacement for the reference's
legacy_code/bayes_opt.py placeholder)."""
import numpy as np

from wavenet_speech_tpu.tools.bayes_opt import (
    BayesOpt,
    _GP,
    expected_improvement,
    set_config_path,
)


def test_set_config_path_deep_copy():
    cfg = {"training": {"optim": {"learning_rate": 1e-3}}}
    out = set_config_path(cfg, "training.optim.learning_rate", 5e-4)
    assert out["training"]["optim"]["learning_rate"] == 5e-4
    assert cfg["training"]["optim"]["learning_rate"] == 1e-3  # original intact
    out2 = set_config_path(cfg, "training.new.flag", 1)
    assert out2["training"]["new"]["flag"] == 1


def test_gp_interpolates_and_ei_prefers_unexplored():
    X = np.array([[0.1], [0.5], [0.9]])
    y = np.array([1.0, 0.2, 0.8])
    gp = _GP(lengthscale=0.2, noise=1e-6)
    gp.fit(X, y)
    mean, std = gp.predict(X)
    np.testing.assert_allclose(mean, y, atol=1e-3)   # interpolation
    assert (std < 0.02).all()                        # low var at data
    m2, s2 = gp.predict(np.array([[0.3]]))
    assert s2[0] > std.max()                         # high var off data
    ei_at_data = expected_improvement(mean, np.maximum(std, 1e-9), y.min())
    ei_off = expected_improvement(m2, s2, y.min())
    assert ei_off[0] > ei_at_data.max()


def test_minimizes_quadratic_in_log_space():
    # optimum at lr = 1e-3 inside [1e-5, 1e-1] (log scale)
    def objective(values):
        return (np.log10(values["training.optim.learning_rate"]) + 3.0) ** 2

    bo = BayesOpt({"training.optim.learning_rate": (1e-5, 1e-1, "log")},
                  seed=0)
    best = bo.minimize(objective, num_trials=15)
    assert best["value"] < 0.15, best  # within ~0.4 decades of the optimum
    # and clearly better than the median random trial
    ys = sorted(y for _, y in best["trials"])
    assert best["value"] <= ys[len(ys) // 2] / 2


def test_integer_dimension_and_observe_external():
    bo = BayesOpt({"training.batch_size": (2, 16)}, seed=1)
    v = bo.suggest()
    assert isinstance(v["training.batch_size"], int)
    assert 2 <= v["training.batch_size"] <= 16
    bo.observe({"training.batch_size": 8}, 0.5)  # external observation
    bo.observe(bo.suggest(), 0.4)
    assert len(bo.y) == 2


def test_cli_objective_smoke():
    """One real trial: the CLI objective must run a tiny training job and
    return a finite validation loss."""
    from wavenet_speech_tpu.tools.bayes_opt import cli_objective

    cfg = {
        "model": {"type": "wavenet-ctc",
                  "base": {"signal_dim": 16, "entry_kwidth": 2, "kernel": 2,
                           "dilations": [1, 2]},
                  "classifier": {"num_labels": 5, "kernel": 2,
                                 "dilations": [1, 2], "downsample": 1,
                                 "out_dim": 16}},
        "training": {"datatype": "pore", "batch_size": 2, "num_epochs": 1,
                     "max_iters": 6, "epoch_size": 6,
                     "min_sample_length": 8, "max_sample_length": 10,
                     "num_levels": 16,
                     "print_every": 3, "save_every": 100,
                     "optim": {"type": "adam", "learning_rate": 1e-3}},
    }
    obj = cli_objective(cfg, platform=None)  # conftest already forced cpu
    val = obj({"training.optim.learning_rate": 2e-3})
    assert np.isfinite(val)
