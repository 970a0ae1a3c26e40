"""Parity tests for RawNet2 and RawGAT-ST against reference goldens.

Goldens carry the reference's seeded state_dict (sd__* arrays) plus eval
logits on fixed inputs, so the tests check both checkpoint-conversion
compatibility and forward-pass numerics.
"""

import os

import numpy as np
import pytest

import jax

from aasist_tpu.registry import build_model
from aasist_tpu.utils.torch_compat import fill_from_state_dict

RAWNET2_CONF = {
    "architecture": "RawNet2Spoof",
    "nb_samp": 64600,
    "first_conv": 1024,
    "in_channels": 1,
    "filts": [20, [20, 20], [20, 128], [128, 128]],
    "blocks": [2, 4],
    "nb_fc_node": 1024,
    "gru_node": 1024,
    "nb_gru_layer": 3,
    "nb_classes": 2,
}

RAWGATST_CONF = {
    "architecture": "RawNetGatSpoofST",
    "nb_samp": 64600,
    "first_conv": 128,
    "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
}


def _sd_from_golden(data):
    return {k[len("sd__"):]: data[k] for k in data.files
            if k.startswith("sd__")}


def _load_golden_model(conf, golden_file, golden_dir):
    data = np.load(os.path.join(golden_dir, golden_file))
    model = build_model(conf)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state = fill_from_state_dict(params, state,
                                         _sd_from_golden(data))
    return model, params, state, data


@pytest.mark.parametrize("conf,golden", [
    (RAWNET2_CONF, "rawnet2_golden.npz"),
    (RAWGATST_CONF, "rawgatst_golden.npz"),
])
def test_logits_match_reference(conf, golden, golden_dir):
    model, params, state, data = _load_golden_model(conf, golden,
                                                    golden_dir)
    (hidden, logits), _ = jax.jit(
        lambda p, s, x: model.apply(p, s, x, train=False))(
            params, state, data["x"])
    np.testing.assert_allclose(np.asarray(logits), data["logits"],
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(hidden), data["hidden"],
                               atol=5e-3, rtol=5e-3)


@pytest.mark.parametrize("conf,golden,expected", [
    (RAWNET2_CONF, "rawnet2_golden.npz", 17621410),
    (RAWGATST_CONF, "rawgatst_golden.npz", 437034),
])
def test_param_count(conf, golden, expected, golden_dir):
    from aasist_tpu.models.aasist import count_params
    model = build_model(conf)
    params, _ = model.init(jax.random.PRNGKey(0))
    assert count_params(params) == expected


@pytest.mark.parametrize("conf", [RAWNET2_CONF, RAWGATST_CONF])
def test_train_mode_runs(conf):
    model = build_model(conf)
    params, state = model.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).standard_normal((2, 64600)).astype(
        np.float32) * 0.05
    (_, logits), new_state = model.apply(
        params, state, x, train=True, rng=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(logits)).all()
    before = np.asarray(state["first_bn"]["mean"])
    after = np.asarray(new_state["first_bn"]["mean"])
    assert not np.allclose(before, after)


def test_robust_forward_shapes():
    """AASIST-Robust runs with the (geometry-fixed) standard frontend —
    the reference's shipped config crashes at forward (SURVEY.md)."""
    conf = {
        "architecture": "AASIST_Robust",
        "first_conv": 128,
        "filts": [70, [1, 32], [32, 32], [32, 24], [24, 24]],
        "gat_dims": [24, 32],
        "pool_ratios": [0.4, 0.5, 0.7, 0.5],
        "temperatures": [2.0, 2.0, 100.0, 100.0],
    }
    model = build_model(conf)
    params, state = model.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).standard_normal((2, 64600)).astype(
        np.float32) * 0.05
    (ens, logits), _ = model.apply(params, state, x, train=False)
    assert ens.shape == (2, 2) and logits.shape == (2, 2)
    # inference ensemble must mix the aux head: ens != logits
    assert not np.allclose(np.asarray(ens), np.asarray(logits))
    # train mode (noise + denoise paths)
    (ens_t, logits_t), _ = model.apply(
        params, state, x, train=True, rng=jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(logits_t)).all()
    # in train mode the returned ensemble IS the main head
    np.testing.assert_array_equal(np.asarray(ens_t), np.asarray(logits_t))
