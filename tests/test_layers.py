"""Layer-level behavioral tests (frontend, augmentation, pooling)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aasist_tpu.models import layers as L
from aasist_tpu.nn import RngStream


def test_sinc_filterbank_shape_and_determinism():
    b1 = L.sinc_filterbank(70, 128)
    b2 = L.sinc_filterbank(70, 128)
    assert b1.shape == (70, 129)  # even kernel size bumped to odd
    np.testing.assert_array_equal(b1, b2)
    # mel-spaced band-pass: higher filters carry higher-frequency content
    # (more zero crossings in the impulse response)
    zc = [(np.diff(np.signbit(b1[i])) != 0).sum() for i in (0, 35, 69)]
    assert zc[0] < zc[1] < zc[2]


def test_freq_mask_zeroes_contiguous_band():
    bank = jnp.ones((70, 129))
    masked = np.asarray(L.freq_mask_filterbank(jax.random.PRNGKey(3), bank))
    zero_rows = np.where((masked == 0).all(axis=1))[0]
    if len(zero_rows):  # width can be 0 (A ~ U[0,20) floor)
        assert (np.diff(zero_rows) == 1).all()  # contiguous
        assert len(zero_rows) < 20
    kept = np.setdiff1d(np.arange(70), zero_rows)
    assert (masked[kept] == 1).all()


def test_freq_mask_distribution():
    """Over many draws the band width stays in [0, 20)."""
    bank = jnp.ones((70, 129))
    widths = []
    for i in range(20):
        m = np.asarray(L.freq_mask_filterbank(jax.random.PRNGKey(i), bank))
        widths.append(int((m == 0).all(axis=1).sum()))
    assert max(widths) < 20
    assert any(w > 0 for w in widths)


def test_graph_pool_orders_by_descending_score():
    """GraphPool keeps top-k nodes in descending-score order (the torch
    topk+gather semantics the pretrained weights expect)."""
    rng = jax.random.PRNGKey(0)
    p = L.graph_pool_init(rng, 4)
    # force known scores: proj weight picks feature 0
    p["proj"]["weight"] = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    p["proj"]["bias"] = jnp.zeros(1)
    h = jnp.asarray([[[0.1, 9, 9, 9],
                      [0.9, 1, 1, 1],
                      [0.5, 2, 2, 2],
                      [0.7, 3, 3, 3]]], jnp.float32)
    out = np.asarray(L.graph_pool_apply(
        p, h, k=0.5, min_nodes=1, dropout_p=0.0, train=False,
        rngs=RngStream(None)))
    assert out.shape == (1, 2, 4)
    # kept nodes: score order 0.9 (node1) then 0.7 (node3), scaled by
    # sigmoid score
    import scipy.special as sp  # scipy is available via jax deps
    np.testing.assert_allclose(out[0, 0, 0],
                               0.9 * sp.expit(0.9), rtol=1e-5)
    np.testing.assert_allclose(out[0, 1, 0],
                               0.7 * sp.expit(0.7), rtol=1e-5)


def test_graph_pool_min_nodes():
    rng = jax.random.PRNGKey(0)
    p = L.graph_pool_init(rng, 4)
    h = jnp.ones((2, 3, 4))
    out = L.graph_pool_apply(p, h, k=0.1, min_nodes=2, dropout_p=0.0,
                             train=False, rngs=RngStream(None))
    assert out.shape[1] == 2  # RawGAT-ST floor (min 2 nodes)


def test_dropout_train_vs_eval():
    from aasist_tpu import nn
    x = jnp.ones((1000,))
    y_eval = nn.dropout(None, x, 0.5, train=False)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(x))
    y_train = np.asarray(nn.dropout(jax.random.PRNGKey(0), x, 0.5,
                                    train=True))
    # inverted dropout: surviving values scaled by 2, ~half dropped
    kept = y_train != 0
    assert 0.35 < kept.mean() < 0.65
    np.testing.assert_allclose(y_train[kept], 2.0)


def test_batch_norm_running_stats_update():
    from aasist_tpu import nn
    p, s = nn.bn_init(4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 4)) * 3 + 1, jnp.float32)
    _, s1 = nn.batch_norm(p, s, x, axis=1, train=True)
    # torch momentum-0.1 update toward batch stats
    np.testing.assert_allclose(np.asarray(s1["mean"]),
                               0.1 * np.asarray(x).mean(0), rtol=1e-4)
    y_eval, s2 = nn.batch_norm(p, s1, x, axis=1, train=False)
    assert s2 is s1  # eval does not touch state
