"""Optimizer and learning-rate schedule factory (optax).

Reference equivalents (`/root/reference/utils.py:36-135`):
  * Adam (betas, weight_decay, amsgrad) / SGD (momentum, nesterov)
  * schedules: per-step cosine annealing, keras_decay, multistep,
    SGDR warm restarts.  Cosine and keras_decay step per *batch*
    (main.py:479-480); multistep and sgdr step per epoch — here all
    schedules are expressed as functions of the global step with
    ``steps_per_epoch`` folding the per-epoch ones, which removes the
    reference's split stepping logic without changing the lr trajectory.

torch Adam's ``weight_decay`` is L2-added-to-gradient (not decoupled
AdamW), reproduced with ``optax.add_decayed_weights`` *before* the Adam
transform.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import optax

from aasist_tpu.config import OptimConfig


def cosine_annealing(step, total_steps, lr_max, lr_min):
    """utils.py:36-39."""
    return lr_min + (lr_max - lr_min) * 0.5 * (
        1 + np.cos(step / total_steps * np.pi))


def keras_decay(step, decay=1e-4):
    """utils.py:42-44."""
    return 1.0 / (1.0 + decay * step)


def make_schedule(cfg: OptimConfig) -> Callable:
    """Returns lr(step) for the configured scheduler."""
    base = cfg.base_lr
    name = cfg.scheduler
    if name == "cosine":
        total = max(1, cfg.epochs * cfg.steps_per_epoch)

        def sched(step):
            import jax.numpy as jnp
            return base * (cfg.lr_min / base + (1 - cfg.lr_min / base)
                           * 0.5 * (1 + jnp.cos(step / total * jnp.pi)))
        return sched
    if name == "keras_decay":
        def sched(step):
            return base / (1.0 + cfg.keras_decay * step)
        return sched
    if name == "multistep":
        spe = max(1, cfg.steps_per_epoch)
        bounds = {int(m) * spe: cfg.lr_decay for m in cfg.milestones}
        return optax.piecewise_constant_schedule(base, bounds)
    if name == "sgdr":
        spe = max(1, cfg.steps_per_epoch)
        # warm restarts: period T0 epochs, multiplied by Tmult each cycle
        schedules, boundaries = [], []
        t = cfg.T0
        epoch_acc = 0
        # build enough cycles to cover the run
        while epoch_acc < max(cfg.epochs, cfg.T0) * 2:
            schedules.append(optax.cosine_decay_schedule(
                base, t * spe, alpha=cfg.lr_min / base))
            epoch_acc += t
            boundaries.append(epoch_acc * spe)
            t *= max(1, cfg.Tmult)
        return optax.join_schedules(schedules, boundaries[:-1])
    if name in (None, "", "none"):
        return lambda step: base
    raise ValueError(f"unknown scheduler {name!r}")


def create_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    """Equivalent of utils.py:131-135 (optimizer + schedule fused)."""
    sched = make_schedule(cfg)
    if cfg.optimizer == "adam":
        opt = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_amsgrad(b1=cfg.betas[0], b2=cfg.betas[1])
            if cfg.amsgrad else
            optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1]),
            optax.scale_by_learning_rate(sched),
        )
        return opt
    if cfg.optimizer == "sgd":
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.trace(decay=cfg.momentum, nesterov=cfg.nesterov),
            optax.scale_by_learning_rate(sched),
        )
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
