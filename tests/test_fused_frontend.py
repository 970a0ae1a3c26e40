"""Fused sinc-frontend kernel vs the XLA reference path (interpreter)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aasist_tpu import nn
from aasist_tpu.models import layers as L
from aasist_tpu.ops.fused_frontend import fused_frontend, pack_filterbank


def _reference(x, bank, bn_p, bn_s):
    h = L.sinc_frontend(bank, x)
    h = jnp.abs(h)[:, None]
    h = nn.max_pool(h, (3, 3))
    h, _ = nn.batch_norm(bn_p, bn_s, h, axis=1, train=False)
    return jax.nn.selu(h)


@pytest.fixture
def bn():
    bn_p = {"weight": jnp.asarray([1.3]), "bias": jnp.asarray([-0.2])}
    bn_s = {"mean": jnp.asarray([0.13]), "var": jnp.asarray([1.7])}
    return bn_p, bn_s


@pytest.mark.parametrize("b,length", [(2, 4000), (3, 6400), (1, 2000)])
def test_matches_xla_path(b, length, bn, rng):
    bn_p, bn_s = bn
    x = jnp.asarray(rng.standard_normal((b, length)).astype(np.float32)
                    * 0.1)
    bank = jnp.asarray(L.sinc_filterbank(70, 128))
    ref = _reference(x, bank, bn_p, bn_s)
    got = fused_frontend(x, bank, bn_p, bn_s)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4)


def test_respects_freq_aug_mask(bn, rng):
    """A masked filterbank must flow through the packed weights."""
    bn_p, bn_s = bn
    x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    bank = jnp.asarray(L.sinc_filterbank(70, 128))
    masked = bank.at[10:20].set(0.0)
    ref = _reference(x, masked, bn_p, bn_s)
    got = fused_frontend(x, masked, bn_p, bn_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4)


def test_pack_filterbank_matches_traced_packing():
    from aasist_tpu.ops.fused_frontend import _pack_traced
    bank = L.sinc_filterbank(70, 128)
    np.testing.assert_allclose(pack_filterbank(bank),
                               np.asarray(_pack_traced(jnp.asarray(bank))),
                               atol=1e-6)


def test_model_flag_wires_kernel(rng):
    """use_fused_frontend=True must reproduce the default eval forward."""
    from aasist_tpu.registry import build_model

    conf = {
        "architecture": "AASIST",
        "first_conv": 128,
        "filts": [70, [1, 8], [8, 8], [8, 12], [12, 12]],
        "gat_dims": [12, 16],
        "pool_ratios": [0.5, 0.7, 0.5, 0.5],
        "temperatures": [2.0, 2.0, 100.0, 100.0],
    }
    m0 = build_model(conf)
    m1 = build_model({**conf, "use_fused_frontend": True})
    params, state = m0.init(jax.random.PRNGKey(0))
    x = rng.standard_normal((2, 16000)).astype(np.float32) * 0.05
    (_, ref), _ = m0.apply(params, state, x, train=False)
    (_, got), _ = m1.apply(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_model_flag_wires_kernel_rawgat(rng):
    """RawGAT-ST shares the frontend chain; the flag must be a no-op
    numerically there too (reference RawNetGatSpoofST.py:324-334)."""
    from aasist_tpu.registry import build_model

    conf = {
        "architecture": "RawNetGatSpoofST",
        "first_conv": 128,
        "filts": [70, [1, 8], [8, 8], [8, 12], [12, 12]],
    }
    m0 = build_model(conf)
    m1 = build_model({**conf, "use_fused_frontend": True})
    params, state = m0.init(jax.random.PRNGKey(0))
    # full eval length: RawGAT's proj_T/proj_S Linears are sized to the
    # 64,600-sample node counts (reference RawNetGatSpoofST.py:335-350)
    x = rng.standard_normal((1, 64600)).astype(np.float32) * 0.05
    (_, ref), _ = m0.apply(params, state, x, train=False)
    (_, got), _ = m1.apply(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_model_flag_wires_kernel_robust(rng):
    """AASIST-Robust's eval chain equals AASIST's frontend (noise and
    denoise branches are train-only) — flag must be a numeric no-op."""
    from aasist_tpu.registry import build_model

    conf = {
        "architecture": "AASIST_Robust",
        "first_conv": 128,
        "filts": [70, [1, 8], [8, 8], [8, 12], [12, 12]],
        "gat_dims": [12, 16],
        "pool_ratios": [0.4, 0.5, 0.7, 0.5],
        "temperatures": [2.0, 2.0, 100.0, 100.0],
    }
    m0 = build_model(conf)
    m1 = build_model({**conf, "use_fused_frontend": True})
    params, state = m0.init(jax.random.PRNGKey(0))
    x = rng.standard_normal((2, 16000)).astype(np.float32) * 0.05
    (_, ref), _ = m0.apply(params, state, x, train=False)
    (_, got), _ = m1.apply(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
