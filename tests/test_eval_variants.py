"""Eval-path variants produce the same logits as the standard path.

Covers the round-2 inference options: b0_chunks (lax.map batch-chunked
block 0 after the fused frontend) and use_poly_blocks (stride-3
polyphase conv2+pool for downsample blocks).
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


def test_poly_blocks_match(setup):
    params, state, x, ref = setup
    conf = dict(BASE)
    conf["use_poly_blocks"] = True
    got = _logits(conf, params, state, x)
    assert np.max(np.abs(got - ref)) < 2e-4 * max(1.0, np.abs(ref).max())


def test_aug_blocks_match(setup):
    params, state, x, ref = setup
    conf = dict(BASE)
    conf["use_aug_blocks"] = True
    got = _logits(conf, params, state, x)
    assert np.max(np.abs(got - ref)) < 2e-4 * max(1.0, np.abs(ref).max())


def test_aug_block_layer_exact():
    """Layer-level f32 parity of the augmented downsample block."""
    from aasist_tpu.models import layers as L

    rng = np.random.default_rng(7)
    for ci, co in ((1, 8), (2, 16)):
        p = {
            "conv1": {"weight": jnp.asarray(
                rng.standard_normal((co, ci, 2, 3)) * 0.3, jnp.float32),
                "bias": jnp.asarray(rng.standard_normal((co,)) * 0.1,
                                    jnp.float32)},
            "conv2": {"weight": jnp.asarray(
                rng.standard_normal((co, co, 2, 3)) * 0.2, jnp.float32),
                "bias": jnp.asarray(rng.standard_normal((co,)) * 0.1,
                                    jnp.float32)},
            "conv_downsample": {"weight": jnp.asarray(
                rng.standard_normal((co, ci, 1, 3)) * 0.3, jnp.float32),
                "bias": jnp.asarray(rng.standard_normal((co,)) * 0.1,
                                    jnp.float32)},
            "bn1": {"weight": jnp.ones((ci,)), "bias": jnp.zeros((ci,))},
            "bn2": {"weight": jnp.asarray(
                1 + 0.2 * rng.standard_normal((co,)), jnp.float32),
                "bias": jnp.asarray(0.1 * rng.standard_normal((co,)),
                                    jnp.float32)},
        }
        s = {
            "bn1": {"mean": jnp.zeros((ci,)), "var": jnp.ones((ci,))},
            "bn2": {"mean": jnp.asarray(
                0.1 * rng.standard_normal((co,)), jnp.float32),
                "var": jnp.asarray(
                    1.0 + np.abs(rng.standard_normal((co,))),
                    jnp.float32)},
        }
        x = jnp.asarray(rng.standard_normal((2, ci, 23, 96)), jnp.float32)
        ref, _ = L.residual_block_apply(p, s, x, first=False, train=False)
        got = L.residual_block_apply_aug(p, s, x, first=False)
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 1e-4, (ci, co, err)


def test_bn_fold_match(setup):
    params, state, x, ref = setup
    conf = dict(BASE)
    conf["use_bn_fold"] = True
    got = _logits(conf, params, state, x)
    assert np.max(np.abs(got - ref)) < 2e-4 * max(1.0, np.abs(ref).max())


def test_bn_fold_layer_exact():
    """Layer-level f32 parity of the bn2-into-conv1 fold, with and
    without a conv bias."""
    from aasist_tpu.models import layers as L

    rng = np.random.default_rng(11)
    for with_bias in (True, False):
        co = ci = 8  # same-channel block: identity add, no downsample
        conv1 = {"weight": jnp.asarray(
            rng.standard_normal((co, ci, 2, 3)) * 0.3, jnp.float32)}
        if with_bias:
            conv1["bias"] = jnp.asarray(rng.standard_normal((co,)) * 0.1,
                                        jnp.float32)
        p = {
            "conv1": conv1,
            "conv2": {"weight": jnp.asarray(
                rng.standard_normal((co, co, 2, 3)) * 0.2, jnp.float32)},
            "bn2": {"weight": jnp.asarray(
                1 + 0.2 * rng.standard_normal((co,)), jnp.float32),
                "bias": jnp.asarray(0.1 * rng.standard_normal((co,)),
                                    jnp.float32)},
        }
        s = {"bn2": {"mean": jnp.asarray(
            0.1 * rng.standard_normal((co,)), jnp.float32),
            "var": jnp.asarray(1.0 + np.abs(rng.standard_normal((co,))),
                               jnp.float32)}}
        x = jnp.asarray(rng.standard_normal((2, ci, 23, 96)), jnp.float32)
        ref, _ = L.residual_block_apply(p, s, x, first=True, train=False)
        got, _ = L.residual_block_apply(p, s, x, first=True, train=False,
                                        fold_bn=True)
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 1e-5, (with_bias, err)


def test_bn_fold_train_mode_ignores_flag():
    """fold_bn must be inert in train mode (BN batch stats are live)."""
    from aasist_tpu.models import layers as L

    rng = np.random.default_rng(12)
    co = ci = 4
    p = {
        "conv1": {"weight": jnp.asarray(
            rng.standard_normal((co, ci, 2, 3)) * 0.3, jnp.float32)},
        "conv2": {"weight": jnp.asarray(
            rng.standard_normal((co, co, 2, 3)) * 0.2, jnp.float32)},
        "bn2": {"weight": jnp.ones((co,)), "bias": jnp.zeros((co,))},
    }
    s = {"bn2": {"mean": jnp.zeros((co,)), "var": jnp.ones((co,))}}
    x = jnp.asarray(rng.standard_normal((2, ci, 23, 24)), jnp.float32)
    ref, s_ref = L.residual_block_apply(p, s, x, first=True, train=True)
    got, s_got = L.residual_block_apply(p, s, x, first=True, train=True,
                                        fold_bn=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(s_got["bn2"]["mean"]),
                                  np.asarray(s_ref["bn2"]["mean"]))


def test_b0_chunks_match(setup):
    params, state, x, ref = setup
    conf = dict(BASE)
    conf["use_fused_frontend"] = True     # enables the chunked path
    conf["b0_chunks"] = 2
    got = _logits(conf, params, state, x)
    # fused frontend runs in the interpreter on CPU; bf16-free f32 path
    assert np.max(np.abs(got - ref)) < 2e-4 * max(1.0, np.abs(ref).max())


# ------------------------------------------------- RawGAT-ST stacking
# RawGAT's pool/projection node counts are hardcoded for 64600-sample
# inputs, so end-to-end parity needs full length.  The stacking algebra
# itself is covered cheaply at the layer level across every combination;
# one full-length e2e test seals the wiring.
RAWGAT_BASE = {
    "architecture": "RawNetGatSpoofST",
    "nb_samp": 64600,
    "first_conv": 128,
    "filts": [70, [1, 8], [8, 8], [8, 16], [16, 16]],
}


def _rand_block(key, cin, cout, first):
    from aasist_tpu.models import layers as L
    p, s = L.residual_block_init(key, cin, cout, first=first)
    # non-trivial BN stats so the fold/stack actually exercises them
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 1 << 30)))
    for bn in ("bn1", "bn2"):
        if bn in s:
            s[bn] = {"mean": jnp.asarray(
                         rng.standard_normal(len(s[bn]["mean"])) * 0.1,
                         jnp.float32),
                     "var": jnp.asarray(
                         0.5 + rng.random(len(s[bn]["var"])),
                         jnp.float32)}
    return p, s


@pytest.mark.parametrize("cin,cout,shared", [
    (1, 8, True),     # first block: both branches read the same input
    (8, 8, False),    # same-channel block, stacked input
    (8, 16, False),   # channel-change block (downsample conv present)
])
@pytest.mark.parametrize("mode", ["dense", "grouped"])
@pytest.mark.parametrize("fold", [False, True])
def test_stacked2_block_matches_sequential(cin, cout, shared, mode, fold):
    """VERDICT round 3, next #2: one 2x-channel block == the two branch
    blocks run sequentially, for every conv-stacking mode."""
    from aasist_tpu.models import layers as L
    ka, kb = jax.random.split(jax.random.PRNGKey(7 * cin + cout))
    pa, sa = _rand_block(ka, cin, cout, first=shared)
    pb, sb = _rand_block(kb, cin, cout, first=shared)
    rng = np.random.default_rng(11)
    if shared:
        x = jnp.asarray(rng.standard_normal((2, cin, 23, 63)), jnp.float32)
        xa = xb = x
    else:
        x = jnp.asarray(rng.standard_normal((2, 2 * cin, 23, 63)),
                        jnp.float32)
        xa, xb = x[:, :cin], x[:, cin:]
    ya, _ = L.residual_block_apply(pa, sa, xa, first=shared, train=False)
    yb, _ = L.residual_block_apply(pb, sb, xb, first=shared, train=False)
    ref = np.concatenate([np.asarray(ya), np.asarray(yb)], axis=1)
    got = np.asarray(L.residual_block_apply_stacked2(
        pa, pb, sa, sb, x, first=shared, shared_input=shared,
        dense=(mode == "dense"), fold_bn=fold))
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 2e-5 * max(1.0, np.abs(ref).max()), \
        (cin, cout, shared, mode, fold)


@pytest.fixture(scope="module")
def rawgat_setup():
    model = build_model(dict(RAWGAT_BASE))
    params, state = model.init(jax.random.PRNGKey(2))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64600)), jnp.float32)
    ref = _logits(dict(RAWGAT_BASE), params, state, x)
    return params, state, x, ref


def test_rawgat_stacked_encoders_match_e2e(rawgat_setup):
    """Full-length end-to-end: the stacked dual encoder reproduces the
    sequential-encoder logits through the whole GAT/pool/fusion stack."""
    params, state, x, ref = rawgat_setup
    conf = dict(RAWGAT_BASE)
    conf["use_stacked_encoders"] = True
    conf["stacked_mode"] = "dense"
    got = _logits(conf, params, state, x)
    assert np.max(np.abs(got - ref)) < 2e-4 * max(1.0, np.abs(ref).max())


def test_rawgat_stacked_train_mode_falls_back(rawgat_setup):
    """Stacking is eval-only; train mode must take the standard path and
    keep updating per-encoder BN state."""
    params, state, x, _ = rawgat_setup
    conf = dict(RAWGAT_BASE)
    conf["use_stacked_encoders"] = True
    model = build_model(conf)
    (_, logits), new_state = model.apply(
        params, state, x, train=True, rng=jax.random.PRNGKey(0))
    assert logits.shape == (2, 2)
    before = np.asarray(state["encoder_T"][0]["bn2"]["mean"])
    after = np.asarray(new_state["encoder_T"][0]["bn2"]["mean"])
    assert not np.array_equal(before, after)
