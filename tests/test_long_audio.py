"""Chunked long-audio inference tests."""

import numpy as np
import pytest

from aasist_tpu.ops import long_audio as LA


def test_window_count():
    assert LA.window_count(1000) == 1
    assert LA.window_count(64600) == 1
    assert LA.window_count(64601) == 2
    assert LA.window_count(64600 + 32300) == 2
    assert LA.window_count(64600 + 32301) == 3


def test_make_windows_short_tiles():
    x = np.arange(100, dtype=np.float32)
    w = LA.make_windows(x)
    assert w.shape == (1, 64600)
    assert (w[0, :100] == x).all() and (w[0, 100:200] == x).all()


def test_make_windows_long_covers_tail():
    n = 200000
    x = np.arange(n, dtype=np.float32)
    w = LA.make_windows(x)
    # every sample covered: first window starts at 0, last ends at n
    assert w[0, 0] == 0
    assert w[-1, -1] == n - 1
    # hop structure
    assert w[1, 0] == 32300


def test_score_long_audio_aggregation():
    # scorer: score = mean of the window (linear) so aggregation is checkable
    def scorer(batch):
        return batch.mean(axis=1)

    rng = np.random.default_rng(0)
    utts = [rng.standard_normal(50000), rng.standard_normal(150000) + 1.0]
    scores = LA.score_long_audio(utts, scorer, batch_size=4)
    assert len(scores) == 2
    assert scores[1] > scores[0]
    # mean aggregation over windows of a constant signal == the constant
    const = [np.full(180000, 0.5, np.float32)]
    s = LA.score_long_audio(const, scorer, batch_size=3)
    assert s[0] == pytest.approx(0.5, abs=1e-6)


def test_score_long_audio_with_model():
    """Through a real (tiny) AASIST forward."""
    import jax
    from aasist_tpu.registry import build_model
    conf = {
        "architecture": "AASIST", "first_conv": 128,
        "filts": [70, [1, 4], [4, 4], [4, 8], [8, 8]],
        "gat_dims": [8, 12], "pool_ratios": [0.5, 0.7, 0.5, 0.5],
        "temperatures": [2.0, 2.0, 100.0, 100.0],
    }
    model = build_model(conf)
    params, state = model.init(jax.random.PRNGKey(0))
    fwd = jax.jit(
        lambda x: model.apply(params, state, x, train=False)[0][1][:, 1])
    rng = np.random.default_rng(1)
    utts = [rng.standard_normal(30000) * 0.05,
            rng.standard_normal(120000) * 0.05]
    scores = LA.score_long_audio(utts, fwd, window=16000, hop=8000,
                                 batch_size=8)
    assert len(scores) == 2 and all(np.isfinite(scores))
