"""Stochastic weight averaging.

Reference uses torchcontrib SWA in "manual" mode (`main.py:124,206-208,
214-217`): snapshot the weights on every new best-dev epoch, average the
snapshots at the end, then re-estimate batch-norm statistics with a pass
over the training loader.  Implemented here as a pure running mean over
parameter pytrees + a jitted BN re-estimation step.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


class SWAState:
    """Running average of parameter pytrees (torchcontrib SWA semantics:
    avg_n+1 = (avg_n * n + w) / (n + 1))."""

    def __init__(self):
        self.n: int = 0
        self.avg: Optional[Any] = None

    def update(self, params: Any) -> None:
        if self.avg is None:
            # explicit copy: the caller's train step donates its param
            # buffers, so aliasing them here would leave the average
            # pointing at deleted memory one step later
            self.avg = jax.tree_util.tree_map(jnp.copy, params)
        else:
            n = self.n
            self.avg = jax.tree_util.tree_map(
                lambda a, w: (a * n + w) / (n + 1), self.avg, params)
        self.n += 1


def reestimate_bn_stats(model, params, state, batches, *,
                        max_batches: Optional[int] = None,
                        mixed_precision: bool = False):
    """Recompute BN running stats under ``params`` (SWA ``bn_update``).

    torchcontrib resets BN momentum so the pass computes a true average
    over loader batches; here we run the model in train mode with
    momentum=1/(i+1) cumulative averaging, which reproduces that behaviour
    for our two-leaf (mean, var) state trees.

    ``mixed_precision`` mirrors the train step's bf16 compute (round-4
    on-TPU protocol run: the f32 full-window forward at batch 24 needs
    17.5 GB HBM — the round-1 wall — while the bf16 graph the model
    actually trained under fits; re-estimating under the training
    precision is also the consistent choice).  Statistics aggregate in
    f32 either way.
    """
    from aasist_tpu.nn import BN_MOMENTUM

    if mixed_precision:
        from aasist_tpu.nn import with_compute_dtype
        model = with_compute_dtype(model, jnp.bfloat16)

    def batch_stats_step(p, s, x, rng):
        """Pure per-batch BN statistics, recovered from the running update:
        new = (1-m)*old + m*batch  =>  batch = (new - (1-m)*old) / m."""
        if mixed_precision:
            p = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, p)
        (_, _), new_s = model.apply(p, s, x, train=True, rng=rng)
        m = BN_MOMENTUM
        return jax.tree_util.tree_map(
            lambda new, old: ((new.astype(jnp.float32)
                               - (1 - m) * old.astype(jnp.float32)) / m),
            new_s, s)

    jit_step = jax.jit(batch_stats_step)
    agg = None
    count = 0
    rng = jax.random.PRNGKey(0)
    for i, batch in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        x = batch[0] if isinstance(batch, (tuple, list)) else batch
        rng, sub = jax.random.split(rng)
        batch_stats = jit_step(params, state, x, sub)
        if agg is None:
            agg = batch_stats
        else:
            agg = jax.tree_util.tree_map(
                lambda a, b: a + (b - a) / (count + 1), agg, batch_stats)
        count += 1
    return agg if agg is not None else state
