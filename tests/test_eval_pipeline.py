"""produce_scores pipelining: ordering and masking correctness."""

import numpy as np

from aasist_tpu.train.loop import produce_scores


class _FakeBatcher:
    """Yields (x, utts, n_real) like EvalBatcher, with a ragged tail."""

    def __init__(self, n_utts=11, batch=4):
        self.n = n_utts
        self.batch = batch

    def __iter__(self):
        i = 0
        while i < self.n:
            ids = [f"u{j:03d}" for j in range(i, min(i + self.batch, self.n))]
            rows = np.asarray(
                [[float(j)] * 8 for j in range(i, i + self.batch)],
                np.float32)  # padded rows repeat beyond n
            yield rows, ids, len(ids)
            i += self.batch


def test_produce_scores_order_and_tail():
    batcher = _FakeBatcher()

    def eval_step(params, state, x):
        # logits: col1 = row id (the "bonafide score")
        return np.stack([np.zeros(len(x)), x[:, 0]], axis=1)

    ids, scores = produce_scores(None, None, None, batcher,
                                 eval_step=eval_step, pipeline_depth=2)
    assert ids == [f"u{j:03d}" for j in range(11)]
    assert scores == [float(j) for j in range(11)]


def test_produce_scores_chained_matches_unchained():
    """chain=3 stacks batches into one dispatch; same ids/scores."""
    import jax
    import jax.numpy as jnp

    from aasist_tpu.registry import build_model

    conf = {
        "architecture": "AASIST",
        "first_conv": 128,
        "filts": [70, [1, 4], [4, 4], [4, 8], [8, 8]],
        "gat_dims": [12, 8],
        "pool_ratios": [0.5, 0.7, 0.5, 0.5],
        "temperatures": [2.0, 2.0, 100.0, 100.0],
    }
    model = build_model(conf)
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)

    class _WaveBatcher:
        def __iter__(self):
            r = np.random.default_rng(3)
            for i in range(4):                 # 4 batches -> 3+1 groups
                n_real = 2 if i == 3 else 3    # ragged tail
                x = r.standard_normal((3, 12000)).astype(np.float32)
                ids = [f"u{i}{k}" for k in range(n_real)]
                yield jnp.asarray(x), ids, n_real

    ref_ids, ref_scores = produce_scores(model, params, state,
                                         _WaveBatcher())
    got_ids, got_scores = produce_scores(model, params, state,
                                         _WaveBatcher(), chain=3)
    assert got_ids == ref_ids
    np.testing.assert_allclose(got_scores, ref_scores, rtol=2e-5,
                               atol=1e-5)


def test_produce_scores_depth_zero():
    batcher = _FakeBatcher(n_utts=5, batch=2)

    def eval_step(params, state, x):
        return np.stack([np.zeros(len(x)), x[:, 0]], axis=1)

    ids, scores = produce_scores(None, None, None, batcher,
                                 eval_step=eval_step, pipeline_depth=0)
    assert scores == [0.0, 1.0, 2.0, 3.0, 4.0]
