"""Parity tests for the RETIRED eval-path variants (tools/eval_variants).

Moved out of the main suite with the variants themselves (round 5; see
eval_variants.py's module docstring for the on-chip A/B numbers that
retired them).  Run explicitly with:

    python -m pytest tools/test_eval_variants.py -q

Each variant must still reproduce the standard residual-block math — the
tests keep the retired code honest for future A/B probes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aasist_tpu.models import layers as L

import eval_variants as V


def _rand_block(key, cin, cout, first):
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


def test_aug_block_layer_exact():
    """Augmented-channel downsample block == standard block (f32)."""
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
        got = V.residual_block_apply_aug(p, s, x, first=False)
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 1e-4, (ci, co, err)


def test_poly_block_layer_exact():
    """Polyphase conv2+pool downsample block == standard block (f32)."""
    rng = np.random.default_rng(9)
    for ci, co in ((1, 8), (8, 16)):
        key = jax.random.PRNGKey(ci * 31 + co)
        p, s = _rand_block(key, ci, co, first=(ci == 1))
        x = jnp.asarray(rng.standard_normal((2, ci, 23, 96)), jnp.float32)
        ref, _ = L.residual_block_apply(p, s, x, first=(ci == 1),
                                        train=False)
        got = V.residual_block_apply_poly(p, s, x, first=(ci == 1))
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 1e-4 * max(1.0, float(jnp.abs(ref).max())), (ci, co, err)


def test_bn_fold_layer_exact():
    """bn2-into-conv1 fold == standard block, with and without bias."""
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
        got = V.residual_block_apply_folded(p, s, x, first=True)
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 1e-5, (with_bias, err)


def test_fold_encoder_bn_prefold():
    """Pre-folded params (conv1_folded) give the same result as the
    in-call fold."""
    key = jax.random.PRNGKey(3)
    p, s = _rand_block(key, 4, 4, first=True)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((2, 4, 23, 24)), jnp.float32)
    pre = V.fold_encoder_bn([p], [s])[0]
    assert "conv1_folded" in pre
    a = V.residual_block_apply_folded(p, s, x, first=True)
    b = V.residual_block_apply_folded(pre, s, x, first=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("cin,cout,shared", [
    (1, 8, True),     # first block: both branches read the same input
    (8, 8, False),    # same-channel block, stacked input
    (8, 16, False),   # channel-change block (downsample conv present)
])
@pytest.mark.parametrize("mode", ["dense", "grouped"])
@pytest.mark.parametrize("fold", [False, True])
def test_stacked2_block_matches_sequential(cin, cout, shared, mode, fold):
    """One 2x-channel block == the two branch blocks run sequentially,
    for every conv-stacking mode."""
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
    got = np.asarray(V.residual_block_apply_stacked2(
        pa, pb, sa, sb, x, first=shared, shared_input=shared,
        dense=(mode == "dense"), fold_bn=fold))
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 2e-5 * max(1.0, np.abs(ref).max()), \
        (cin, cout, shared, mode, fold)


def test_rawgat_stacked_encode_matches_sequential():
    """rawgat_encode_stacked == the model's two sequential encoders,
    through the raw encoder outputs."""
    from aasist_tpu.registry import build_model

    conf = {"architecture": "RawNetGatSpoofST", "nb_samp": 64600,
            "first_conv": 128,
            "filts": [70, [1, 8], [8, 8], [8, 16], [16, 16]]}
    model = build_model(conf)
    params, state = model.init(jax.random.PRNGKey(2))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64600)), jnp.float32)

    bank = jnp.asarray(model.filterbank, jnp.float32)
    h = L.sinc_frontend(bank, x)
    from aasist_tpu import nn
    h = nn.max_pool(jnp.abs(h)[:, None], (3, 3))
    h, _ = nn.batch_norm(params["first_bn"], state["first_bn"], h, axis=1,
                         train=False)
    h = jax.nn.selu(h)

    ref_t, _ = model._encode(params["encoder_T"], state["encoder_T"], h,
                             False)
    ref_s, _ = model._encode(params["encoder_S"], state["encoder_S"], h,
                             False)
    got_t, got_s = V.rawgat_encode_stacked(model, params, state, h)
    for got, ref in ((got_t, ref_t), (got_s, ref_s)):
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 2e-4 * max(1.0, float(jnp.abs(ref).max())), err
