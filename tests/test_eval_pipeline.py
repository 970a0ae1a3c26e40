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


def test_produce_scores_depth_zero():
    batcher = _FakeBatcher(n_utts=5, batch=2)

    def eval_step(params, state, x):
        return np.stack([np.zeros(len(x)), x[:, 0]], axis=1)

    ids, scores = produce_scores(None, None, None, batcher,
                                 eval_step=eval_step, pipeline_depth=0)
    assert scores == [0.0, 1.0, 2.0, 3.0, 4.0]
