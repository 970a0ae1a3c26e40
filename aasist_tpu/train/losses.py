"""Training losses.

Reference equivalents:
  * weighted cross-entropy, class weights [0.1, 0.9]
    (`/root/reference/main.py:417-421`)
  * AM-Softmax with fixed or duration-adaptive margin (ALMFT)
    (`/root/reference/utils.py:163-217`, wired at `main.py:422-437`)

All functions are pure and jit-friendly; they take logits and integer
labels and return a scalar mean loss.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

CCE_CLASS_WEIGHTS = (0.1, 0.9)  # (spoof, bonafide) — main.py:419


def weighted_cce(logits: jnp.ndarray, labels: jnp.ndarray,
                 weights=CCE_CLASS_WEIGHTS,
                 sample_mask: Optional[jnp.ndarray] = None,
                 label_smoothing: float = 0.0) -> jnp.ndarray:
    """Class-weighted cross entropy, torch ``CrossEntropyLoss(weight=w)``
    semantics: mean over samples is weighted by the per-sample class weight
    (sum(w_i * nll_i) / sum(w_i)).  ``label_smoothing`` follows torch's
    definition (target = (1-s)*onehot + s/K)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    if label_smoothing > 0.0:
        k = logits.shape[-1]
        onehot = jax.nn.one_hot(labels, k, dtype=logits.dtype)
        target = (1.0 - label_smoothing) * onehot + label_smoothing / k
        nll = -jnp.sum(target * logp, axis=-1)
    else:
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    w = jnp.asarray(weights)[labels]
    if sample_mask is not None:
        w = w * sample_mask
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-12)


def am_softmax(logits: jnp.ndarray, labels: jnp.ndarray, *,
               scale: float = 15.0, margin: float = 0.2,
               durations: Optional[jnp.ndarray] = None,
               margin_a: float = 3 / 50, margin_b: float = 7 / 50,
               sample_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """AM-Softmax / ALMFT loss (utils.py:182-217).

    Subtracts a margin from the target-class logit then scales and applies
    CE.  With ``durations`` given, the margin is duration-adaptive:
    m = margin_a * duration + margin_b (the ALMFT rule from the AASIST2
    paper); otherwise the fixed ``margin`` is used.
    """
    if durations is not None:
        m = margin_a * durations + margin_b
    else:
        m = jnp.full(labels.shape, margin, logits.dtype)
    one_hot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
    adjusted = (logits - one_hot * m[:, None]) * scale
    logp = jax.nn.log_softmax(adjusted, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if sample_mask is not None:
        return jnp.sum(nll * sample_mask) / jnp.maximum(
            jnp.sum(sample_mask), 1e-12)
    return jnp.mean(nll)


def make_loss_fn(loss_name: str, cfg):
    """Build the configured loss closure from an ExperimentConfig."""
    smoothing = float(cfg.extras.get("label_smoothing", 0.0)) \
        if hasattr(cfg, "extras") else 0.0
    if loss_name == "CCE":
        def fn(logits, labels, durations=None, mask=None):
            return weighted_cce(logits, labels, sample_mask=mask,
                                label_smoothing=smoothing)
        return fn, False
    if loss_name == "AM_Softmax":
        adaptive = bool(cfg.adaptive_margin)

        def fn(logits, labels, durations=None, mask=None):
            return am_softmax(
                logits, labels, scale=cfg.am_softmax_scale,
                margin=cfg.margin,
                durations=durations if adaptive else None,
                margin_a=cfg.margin_a, margin_b=cfg.margin_b,
                sample_mask=mask)
        return fn, adaptive
    raise ValueError(f"Unknown loss type: {loss_name}")
