"""Eval-path options of the PRODUCT models.

Round 5 retired the measured-dead variants (poly / aug / bn-fold /
stacked encoders) to tools/eval_variants.py with their parity tests
(tools/test_eval_variants.py); the product models keep exactly two eval
paths: standard XLA and the fused-frontend (+ b0_chunks) winner.  This
file covers the kept winner and the loud failure on retired flags.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aasist_tpu.registry import build_model

BASE = {
    "architecture": "AASIST",
    "first_conv": 128,
    "filts": [70, [1, 8], [8, 8], [8, 16], [16, 16]],
    "gat_dims": [12, 8],
    "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
}

L_IN = 12000


def _logits(conf, params, state, x):
    model = build_model(conf)
    (_, logits), _ = model.apply(params, state, x, train=False)
    return np.asarray(logits, np.float32)


@pytest.fixture(scope="module")
def setup():
    model = build_model(dict(BASE))
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, L_IN)), jnp.float32)
    ref = _logits(dict(BASE), params, state, x)
    return params, state, x, ref


def test_b0_chunks_match(setup):
    params, state, x, ref = setup
    conf = dict(BASE)
    conf["use_fused_frontend"] = True     # enables the chunked path
    conf["b0_chunks"] = 2
    got = _logits(conf, params, state, x)
    # fused frontend runs in the interpreter on CPU; bf16-free f32 path
    assert np.max(np.abs(got - ref)) < 2e-4 * max(1.0, np.abs(ref).max())


@pytest.mark.parametrize("flag", ["use_poly_blocks", "use_aug_blocks",
                                  "use_bn_fold"])
def test_retired_aasist_flags_fail_loudly(flag):
    with pytest.raises(ValueError, match="retired"):
        build_model({**BASE, flag: True})


@pytest.mark.parametrize("flag", ["use_stacked_encoders", "stacked_mode",
                                  "use_bn_fold"])
def test_retired_rawgat_flags_fail_loudly(flag):
    conf = {"architecture": "RawNetGatSpoofST", "nb_samp": 64600,
            "first_conv": 128,
            "filts": [70, [1, 8], [8, 8], [8, 16], [16, 16]],
            flag: "dense" if flag == "stacked_mode" else True}
    with pytest.raises(ValueError, match="retired"):
        build_model(conf)
