"""Mixed-precision (bf16 compute, f32 master) training tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from aasist_tpu.registry import build_model
from aasist_tpu.train.loop import make_train_step
from aasist_tpu.train.losses import weighted_cce

TINY = {
    "architecture": "AASIST", "first_conv": 128,
    "filts": [70, [1, 4], [4, 4], [4, 8], [8, 8]],
    "gat_dims": [8, 12], "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
    "remat": False,
}


def _loss_fn(logits, labels, durations=None, mask=None):
    return weighted_cce(logits, labels)


def test_mixed_precision_step_keeps_f32_master():
    model = build_model(TINY)
    params, state = model.init(jax.random.PRNGKey(0))
    before = [np.asarray(a) for a in jax.tree_util.tree_leaves(params)]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(model, _loss_fn, opt, freq_aug=False,
                           use_duration=False, mixed_precision=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16000)) * 0.05, jnp.float32)
    y = jnp.asarray([0, 1, 0, 1], jnp.int32)
    dur = jnp.ones(4, jnp.float32)
    p2, s2, o2, loss, corr = step(params, state, opt_state, x, y, dur,
                                  jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # master params and BN state stay float32
    for leaf in jax.tree_util.tree_leaves(p2):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(s2):
        assert leaf.dtype == jnp.float32
    moved = any(not np.allclose(a, np.asarray(b))
                for a, b in zip(before, jax.tree_util.tree_leaves(p2)))
    assert moved


def test_mixed_precision_loss_close_to_f32():
    model32 = build_model(TINY)
    params, state = model32.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16000)) * 0.05, jnp.float32)
    y = jnp.asarray([0, 1, 0, 1], jnp.int32)

    (_, logits32), _ = model32.apply(params, state, x, train=False)
    l32 = float(weighted_cce(logits32, y))

    model16 = build_model(dict(TINY, dtype="bfloat16"))
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t)
    (_, logits16), _ = model16.apply(cast(params), cast(state), x,
                                     train=False)
    l16 = float(weighted_cce(logits16.astype(jnp.float32), y))
    assert l16 == pytest.approx(l32, rel=0.1)
