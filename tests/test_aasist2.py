"""AASIST2 (Res2Net+SE encoder, speaker conditioning) parity tests."""

import os

import numpy as np
import pytest

import jax

from aasist_tpu.registry import build_model
from aasist_tpu.utils.torch_compat import fill_from_state_dict

AASIST2_CONF = {
    "architecture": "AASIST",  # fork selects Res2Net purely via these keys
    "nb_samp": 64600,
    "first_conv": 128,
    "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
    "gat_dims": [64, 32],
    "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
    "res2net_width": 14,
    "res2net_scale": 8,
    "speaker_conditioning": True,
    "spk_emb_dim": 256,
    "conditioning_level": "frame",
    "use_attention": True,
}


@pytest.fixture(scope="module")
def golden(golden_dir):
    return np.load(os.path.join(golden_dir, "aasist2_golden.npz"))


@pytest.fixture(scope="module")
def loaded(golden):
    model = build_model(AASIST2_CONF)
    assert model.encoder_type == "res2net"
    params, state = model.init(jax.random.PRNGKey(0))
    sd = {k[len("sd__"):]: golden[k] for k in golden.files
          if k.startswith("sd__")}
    params, state = fill_from_state_dict(params, state, sd)
    return model, params, state


def test_param_count(golden):
    from aasist_tpu.models.aasist import count_params
    model = build_model(AASIST2_CONF)
    params, _ = model.init(jax.random.PRNGKey(0))
    assert count_params(params) == int(golden["n_params"])  # 259,079


def test_logits_match_reference(loaded, golden):
    model, params, state = loaded
    (hidden, logits), _ = jax.jit(
        lambda p, s, x: model.apply(p, s, x, train=False))(
            params, state, golden["x"])
    np.testing.assert_allclose(np.asarray(logits), golden["logits"],
                               atol=1e-3, rtol=1e-3)


def test_speaker_conditioned_logits_match(loaded, golden):
    model, params, state = loaded
    (hidden, logits), _ = jax.jit(
        lambda p, s, x, e: model.apply(p, s, x, train=False,
                                       speaker_embedding=e))(
            params, state, golden["x"], golden["spk"])
    np.testing.assert_allclose(np.asarray(logits), golden["logits_spk"],
                               atol=1e-3, rtol=1e-3)
    # conditioning must actually change the logits
    assert not np.allclose(golden["logits"], golden["logits_spk"])


def test_aasist2_architecture_alias():
    model = build_model(dict(AASIST2_CONF, architecture="AASIST2"))
    assert model.encoder_type == "res2net"


def test_train_mode_with_dcs_length(loaded):
    """AASIST2 trains on DCS windows — verify a non-64600 bucket length."""
    model, params, state = loaded
    x = np.random.default_rng(0).standard_normal((2, 32000)).astype(
        np.float32) * 0.05
    (_, logits), _ = model.apply(params, state, x, train=True,
                                 rng=jax.random.PRNGKey(1), freq_aug=True)
    assert np.isfinite(np.asarray(logits)).all()
