"""Batched inference serving API.

The reference has no serving layer (SURVEY.md §1: "no serving layer, no
RPC").  This module provides the production-facing entry point this
framework is deployed behind: a warm, fixed-shape, jitted scorer with
padding/masking for ragged batches and windowed scoring for long audio.

Usage::

    scorer = Scorer.from_config("configs/AASIST.conf")   # loads weights
    scores = scorer.score_waveforms([wav1, wav2, ...])   # bonafide scores
    label = "bonafide" if scores[0] > threshold else "spoof"
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from aasist_tpu.data.dataset import FIXED_EVAL_LEN, pad_to_fixed

# Measured-best serving batch per architecture on TPU v5e (docs/PERF.md
# zoo table).  The conv-pyramid models (AASIST family, RawGAT-ST) peak
# at 128 — above it the block0 temporaries push the program onto the
# HBM edge and XLA schedules remat/copies; RawNet2's 1-D trunk has no
# 2-D pyramid and prefers the bigger batch (5172 utt/s at 256 vs 4895
# at 128).  Keys are ``model_config["architecture"]`` registry names;
# unknown architectures fall back to 128.
SERVING_BATCH_DEFAULTS = {
    "AASIST": 128,
    "AASIST2": 128,
    "AASIST_Robust": 128,
    "RawNet2Spoof": 256,
    "RawNetGatSpoofST": 128,
}


class Scorer:
    """Warm batched scorer around a model + weights.

    One jit specialization (fixed batch x fixed window); ragged inputs are
    padded by row repetition and masked out.  ``bf16=True`` runs the conv
    trunk in bfloat16 (the TPU deployment default; EER-neutral, see
    docs/PERF.md).  ``batch_size=None`` picks the measured-best v5e
    batch for the model's architecture (``SERVING_BATCH_DEFAULTS``:
    128 for the conv-pyramid models, 256 for RawNet2); pass an explicit
    value to pin it.  ``mesh`` enables data-parallel
    serving: the batch shards over the mesh's data axis with replicated
    parameters (the training SPMD layout), scaling throughput across
    chips; ``batch_size`` must be divisible by the data-axis size.
    """

    def __init__(self, model, params, model_state, *,
                 batch_size: Optional[int] = None,
                 window: int = FIXED_EVAL_LEN, bf16: bool = True,
                 use_fused_frontend: Optional[bool] = None,
                 mesh=None):
        import copy

        import jax
        import jax.numpy as jnp

        from aasist_tpu.nn import with_compute_dtype

        if batch_size is None:
            arch = getattr(model, "config", {}).get("architecture")
            batch_size = SERVING_BATCH_DEFAULTS.get(arch, 128)
        self.batch_size = batch_size
        self.window = window
        # data-parallel serving: with a (data, model) mesh, the batch
        # dim shards across the data axis (params replicated) and XLA
        # runs every chip on its slice — same SPMD layout as training
        # (aasist_tpu/parallel).  batch_size must be divisible by the
        # data-axis size.
        self._mesh = mesh
        if mesh is not None:
            from aasist_tpu.parallel import (batch_sharding,
                                             replicated_sharding)
            self._x_sharding = batch_sharding(mesh)
            repl = replicated_sharding(mesh)
            params = jax.device_put(params, repl)
            model_state = jax.device_put(model_state, repl)
        # never mutate the caller's architecture object (it may back other
        # scorers/train steps): configure a private shallow copy instead
        if bf16:
            cast = lambda t: jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, t)
            params, model_state = cast(params), cast(model_state)
            model = with_compute_dtype(model, jnp.bfloat16)
        if use_fused_frontend is None:
            # the Pallas sinc frontend is the measured best serving
            # config on TPU (docs/PERF.md: 1840-1864 utt/s at batch 128
            # with unchunked block0, vs 1772 XLA-only); elsewhere it
            # would run in the slow interpreter.  Under a DP mesh the
            # kernel runs per-shard through shard_map
            # (ops/fused_frontend.fused_frontend_sharded) — GSPMD cannot
            # partition the custom call by itself, but the explicit
            # partitioning keeps the kernel on the serving path.
            use_fused_frontend = (bf16
                                  and jax.default_backend() == "tpu"
                                  and hasattr(model, "use_fused_frontend"))
        if hasattr(model, "use_fused_frontend"):
            was_on = model.use_fused_frontend
            model = copy.copy(model)
            model.use_fused_frontend = bool(use_fused_frontend)
            if use_fused_frontend and mesh is not None:
                model.spmd_mesh = mesh
            if use_fused_frontend and not was_on:
                # we are enabling it: the model's b0_chunks was computed
                # for the UNfused path (default 1).  Chunking only exists
                # to fit batch >= 256; below that unchunked is the
                # measured win.  A config-set value > 1 is respected.
                # Only the AASIST family has the knob — RawGAT-ST shares
                # the fused frontend but not block0 chunking (round-4
                # review: an unconditional read crashed its TPU path).
                if getattr(model, "b0_chunks", None) == 1 \
                        and batch_size >= 256:
                    model.b0_chunks = 2
        self.model = model
        self._params = params
        self._state = model_state

        def fwd(p, s, x):
            (_, logits), _ = model.apply(p, s, x, train=False)
            return logits[:, 1].astype(jnp.float32)

        self._jfwd = jax.jit(fwd)

        def run(p, s, x):
            if self._mesh is not None:
                x = jax.device_put(x, self._x_sharding)
            return self._jfwd(p, s, x)

        self._fwd = run

    @classmethod
    def from_config(cls, config_path, weights_path=None, **kwargs
                    ) -> "Scorer":
        from aasist_tpu.config import load_config
        from aasist_tpu.registry import build_model
        from aasist_tpu.cli import load_model_weights

        cfg = load_config(config_path)
        model = build_model(cfg.model_config)
        params, state = load_model_weights(
            model, weights_path or cfg.model_path)
        return cls(model, params, state, **kwargs)

    def warmup(self) -> None:
        x = np.zeros((self.batch_size, self.window), np.float32)
        np.asarray(self._fwd(self._params, self._state, x))

    def score_batch(self, batch: np.ndarray) -> np.ndarray:
        """Score (n, window) waveforms, n <= batch_size."""
        n = batch.shape[0]
        if n == 0:
            return np.zeros((0,), np.float32)
        if batch.shape[1] != self.window:
            raise ValueError(
                f"expected window {self.window}, got {batch.shape[1]}")
        if n < self.batch_size:
            batch = np.concatenate(
                [batch, np.tile(batch[-1:], (self.batch_size - n, 1))])
        out = np.asarray(self._fwd(self._params, self._state,
                                   batch.astype(np.float32)))
        return out[:n]

    def score_waveforms(self, waveforms: Sequence[np.ndarray],
                        long_audio: bool = False,
                        aggregate: str = "mean") -> List[float]:
        """Score variable-length waveforms.

        Default: reference eval semantics (crop-or-tile to the window —
        data_utils.py:45).  ``long_audio=True`` scores strided windows and
        aggregates, covering audio beyond the window instead of cropping.
        """
        if long_audio:
            from aasist_tpu.ops.long_audio import score_long_audio
            return score_long_audio(
                waveforms,
                lambda b: self._fwd(self._params, self._state, b),
                window=self.window, batch_size=self.batch_size,
                aggregate=aggregate)
        # dispatch pipelined 2 deep (utils/dispatch): fetching batch k's
        # scores overlaps device compute of batch k+1
        from aasist_tpu.utils.dispatch import pipelined

        scores: List[float] = []

        def dispatch(i):
            chunk = waveforms[i:i + self.batch_size]
            rows = np.stack([pad_to_fixed(np.asarray(w), self.window)
                             for w in chunk]).astype(np.float32)
            n = rows.shape[0]
            if n < self.batch_size:
                rows = np.concatenate(
                    [rows, np.tile(rows[-1:], (self.batch_size - n, 1))])
            return self._fwd(self._params, self._state, rows), n

        def drain(ticket):
            out, n = ticket
            scores.extend(np.asarray(out)[:n].tolist())

        pipelined(range(0, len(waveforms), self.batch_size),
                  dispatch, drain)
        return scores
