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
        # torch MultiStepLR stepped once per epoch: during epoch e the lr
        # is base * lr_decay^|{m in milestones : m <= e}| (golden-pinned
        # by tests/test_train_differential.py).  Expressed on the global
        # step via epoch = step // steps_per_epoch — an exact staircase,
        # constant within each epoch like the reference's.
        spe = max(1, cfg.steps_per_epoch)
        ms = np.asarray(sorted(int(m) for m in cfg.milestones), np.int32)

        def sched(step):
            import jax.numpy as jnp
            epoch = jnp.asarray(step) // spe
            n = jnp.sum(jnp.asarray(ms) <= epoch)
            return base * cfg.lr_decay ** n
        return sched
    if name == "sgdr":
        # torch SGDRScheduler (utils.py:47-69) stepped once per epoch:
        # warm restarts of period T0 epochs, multiplied by Tmult each
        # cycle; within a cycle lr = lr_min + (base - lr_min) *
        # (1 + cos(pi * T_cur / Ti)) / 2.  Cycle-start epochs are
        # precomputed; the staircase is exact vs torch (golden-pinned).
        spe = max(1, cfg.steps_per_epoch)
        starts, tis = [0], [cfg.T0]
        while starts[-1] + tis[-1] < max(cfg.epochs, cfg.T0) * 2:
            starts.append(starts[-1] + tis[-1])
            tis.append(tis[-1] * max(1, cfg.Tmult))
        starts_a = np.asarray(starts, np.int32)
        tis_a = np.asarray(tis, np.float64)

        def sched(step):
            import jax.numpy as jnp
            e = jnp.asarray(step) // spe
            i = jnp.sum(jnp.asarray(starts_a) <= e) - 1
            t_cur = e - jnp.take(jnp.asarray(starts_a), i)
            ti = jnp.take(jnp.asarray(tis_a), i)
            return cfg.lr_min + (base - cfg.lr_min) * (
                1 + jnp.cos(jnp.pi * t_cur / ti)) / 2
        return sched
    if name in (None, "", "none"):
        return lambda step: base
    raise ValueError(f"unknown scheduler {name!r}")


def create_optimizer(cfg: OptimConfig,
                     grad_mask=None) -> optax.GradientTransformation:
    """Equivalent of utils.py:131-135 (optimizer + schedule fused).

    ``grad_mask`` (a bool pytree or a ``params -> bool pytree`` callable,
    typically ``model.grad_mask``) marks the params that ever receive
    gradients.  torch optimizers SKIP params whose ``.grad`` is None —
    no moments, no L2 weight decay; the reference models have such
    structurally-disconnected leaves (the discarded-bn1 quirk).  optax
    always sees dense zero grads, so without the mask
    ``add_decayed_weights`` + Adam would hand every disconnected leaf an
    lr-sized step per batch (caught by the round-5 train differential;
    see AasistModel.grad_mask).
    """
    sched = make_schedule(cfg)
    if cfg.optimizer == "adam":
        opt = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_amsgrad(b1=cfg.betas[0], b2=cfg.betas[1])
            if cfg.amsgrad else
            optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1]),
            optax.scale_by_learning_rate(sched),
        )
    elif cfg.optimizer == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.trace(decay=cfg.momentum, nesterov=cfg.nesterov),
            optax.scale_by_learning_rate(sched),
        )
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if grad_mask is not None:
        opt = optax.masked(opt, grad_mask)
    return opt
