"""Robust-training options: mixup, label smoothing, adversarial training.

These config keys ship in the reference's AASIST-Robust.conf but are
dormant there (nothing reads them — SURVEY.md §5); here they are real
features, so they get real tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from aasist_tpu.registry import build_model
from aasist_tpu.train.loop import RobustOptions, make_train_step
from aasist_tpu.train.losses import weighted_cce

TINY = {
    "architecture": "AASIST", "first_conv": 128,
    "filts": [70, [1, 4], [4, 4], [4, 8], [8, 8]],
    "gat_dims": [8, 12], "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
}


def test_label_smoothing_changes_loss():
    logits = jnp.asarray([[3.0, -1.0], [0.2, 0.4]])
    labels = jnp.asarray([0, 1])
    plain = float(weighted_cce(logits, labels))
    smooth = float(weighted_cce(logits, labels, label_smoothing=0.1))
    assert smooth != plain
    # smoothing penalises overconfident correct predictions
    confident = jnp.asarray([[10.0, -10.0]])
    lab = jnp.asarray([0])
    assert float(weighted_cce(confident, lab, label_smoothing=0.1)) > \
        float(weighted_cce(confident, lab))


def _setup():
    model = build_model(TINY)
    params, state = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16000)) * 0.05, jnp.float32)
    y = jnp.asarray([0, 1, 0, 1], jnp.int32)
    dur = jnp.ones(4, jnp.float32)
    return model, params, state, opt, opt_state, x, y, dur


def _loss_fn(logits, labels, durations=None, mask=None):
    return weighted_cce(logits, labels)


@pytest.mark.parametrize("robust", [
    RobustOptions(),                                    # baseline
    RobustOptions(use_mixup=True, mixup_alpha=0.3),
    RobustOptions(adv_training=True, adv_steps=2),
    RobustOptions(use_mixup=True, adv_training=True, adv_steps=1),
])
def test_train_step_variants_run_and_learn(robust):
    model, params, state, opt, opt_state, x, y, dur = _setup()
    # snapshot before the step donates the param buffers
    before = [np.asarray(a) for a in jax.tree_util.tree_leaves(params)]
    step = make_train_step(model, _loss_fn, opt, freq_aug=False,
                           use_duration=False, robust=robust)
    p2, s2, o2, loss, corr = step(params, state, opt_state, x, y, dur,
                                  jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    moved = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(before, jax.tree_util.tree_leaves(p2)))
    assert moved


def test_adversarial_loss_exceeds_clean():
    """PGD perturbation must not decrease the loss it attacks."""
    model, params, state, opt, opt_state, x, y, dur = _setup()

    def clean_loss(xb):
        (_, logits), _ = model.apply(params, state, xb, train=False)
        return float(weighted_cce(logits, y))

    # build the adversarial example the way the train step does
    eps, alpha, steps = 0.02, 0.01, 3

    def input_loss(xb):
        (_, logits), _ = model.apply(params, state, xb, train=False)
        return weighted_cce(logits, y)

    x_adv = x
    for _ in range(steps):
        g = jax.grad(input_loss)(x_adv)
        x_adv = x + jnp.clip(x_adv + alpha * jnp.sign(g) - x, -eps, eps)
    assert clean_loss(x_adv) >= clean_loss(x) - 1e-6
    # and the perturbation is bounded
    assert float(jnp.abs(x_adv - x).max()) <= eps + 1e-6


def test_robust_options_from_config():
    from aasist_tpu.config import ExperimentConfig
    cfg = ExperimentConfig.from_dict({
        "track": "LA", "model_config": {}, "optim_config": {},
        "use_mixup": True, "mixup_alpha": 0.4, "adv_training": "True",
        "adv_epsilon": 0.05, "adv_steps": 5,
    })
    r = RobustOptions.from_config(cfg)
    assert r.use_mixup and r.adv_training
    assert r.mixup_alpha == 0.4 and r.adv_epsilon == 0.05
    assert r.adv_steps == 5
