"""Orbax-backed train-state checkpointing (optional backend).

The default checkpoint path (aasist_tpu/train/checkpoints.py) is a
self-contained atomic .npz writer.  This module offers the same
TrainCheckpoint surface backed by orbax-checkpoint for users who want its
ecosystem features (async saves, step-managed retention, cloud storage
drivers).  Selected via ``save_train_state(..., backend="orbax")`` or used
directly.
"""

from __future__ import annotations

from pathlib import Path
import jax
import numpy as np

from aasist_tpu.train.checkpoints import TrainCheckpoint


def _to_pytree(ckpt: TrainCheckpoint) -> dict:
    tree = {
        "params": ckpt.params,
        "model_state": ckpt.model_state,
        "opt_state": ckpt.opt_state,
        # explicit dtypes: StandardCheckpointer restores with the
        # template's dtype, so int-typed templates would truncate floats
        "scalars": {
            "step": np.asarray(ckpt.step, np.int64),
            "epoch": np.asarray(ckpt.epoch, np.int64),
            "best_dev_eer": np.asarray(ckpt.best_dev_eer, np.float64),
            "best_eval_eer": np.asarray(ckpt.best_eval_eer, np.float64),
            "best_eval_tdcf": np.asarray(ckpt.best_eval_tdcf, np.float64),
            "n_swa": np.asarray(ckpt.n_swa, np.int64),
        },
    }
    if ckpt.swa_avg is not None:
        tree["swa_avg"] = ckpt.swa_avg
    return tree


def save_train_state(directory, ckpt: TrainCheckpoint) -> None:
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(directory, _to_pytree(ckpt), force=True)


def load_train_state(directory, template: TrainCheckpoint
                     ) -> TrainCheckpoint:
    """Restore using a template checkpoint (for tree structure/dtypes)."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(directory, _to_pytree(template))
    sc = restored["scalars"]
    return TrainCheckpoint(
        params=restored["params"],
        model_state=restored["model_state"],
        opt_state=restored["opt_state"],
        step=int(sc["step"]), epoch=int(sc["epoch"]),
        best_dev_eer=float(sc["best_dev_eer"]),
        best_eval_eer=float(sc["best_eval_eer"]),
        best_eval_tdcf=float(sc["best_eval_tdcf"]),
        n_swa=int(sc["n_swa"]),
        swa_avg=restored.get("swa_avg"))
