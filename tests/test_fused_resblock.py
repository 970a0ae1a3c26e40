"""Fused Pallas residual-block kernel vs the reference XLA path.

Runs through the Pallas interpreter on the CPU test backend; the compiled
kernel is exercised on TPU by bench.py and the fused eval path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aasist_tpu.models import layers as L
from aasist_tpu.ops.fused_resblock import (FusedBlockParams,
                                           fused_residual_block)


def _random_block(rng_key, c_in, c_out, first):
    p, s = L.residual_block_init(rng_key, c_in, c_out, first=first)
    rng = np.random.default_rng(int(rng_key[1]))
    s = dict(s)
    s["bn2"] = {"mean": jnp.asarray(rng.standard_normal(c_out) * 0.1,
                                    jnp.float32),
                "var": jnp.asarray(0.5 + rng.random(c_out), jnp.float32)}
    if not first:
        s["bn1"] = {"mean": jnp.zeros(c_in), "var": jnp.ones(c_in)}
    return p, s


@pytest.mark.parametrize("c_in,c_out,first,t", [
    (1, 32, True, 200),     # block0 geometry (C_in=1, downsample)
    (32, 32, False, 97),    # same-channel block, odd T (pool remainder)
    (32, 64, False, 96),    # channel growth, T divisible by 3
    (64, 64, False, 88),    # late-block geometry
])
def test_fused_matches_reference(c_in, c_out, first, t):
    p, s = _random_block(jax.random.PRNGKey(c_in + c_out), c_in, c_out,
                         first)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, c_in, 23, t)), jnp.float32)
    ref, _ = L.residual_block_apply(p, s, x, first=first, train=False)
    got = fused_residual_block(
        x, FusedBlockParams(p, s, c_in, c_out, dtype=jnp.float32))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_model_path_matches_eval():
    """Full AASIST with use_fused_encoder must match the XLA path."""
    from aasist_tpu.registry import build_model
    base = {
        "architecture": "AASIST", "first_conv": 128,
        "filts": [70, [1, 8], [8, 8], [8, 12], [12, 12]],
        "gat_dims": [12, 16],
        "pool_ratios": [0.5, 0.7, 0.5, 0.5],
        "temperatures": [2.0, 2.0, 100.0, 100.0],
    }
    m0 = build_model(base)
    m1 = build_model(dict(base, use_fused_encoder=True))
    params, state = m0.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).standard_normal((2, 16000)).astype(
        np.float32) * 0.05
    (_, l0), _ = m0.apply(params, state, x, train=False)
    (_, l1), _ = m1.apply(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               atol=1e-4, rtol=1e-4)
