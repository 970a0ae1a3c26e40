"""Checkpointing: full train-state save/restore + weight snapshots.

The reference saves bare ``state_dict`` weights at best-dev / best-eval /
SWA-final and cannot resume training (no optimizer/epoch state —
SURVEY.md §5 "Checkpoint / resume").  This framework saves:

  * lightweight weight snapshots (params + model state) as ``.npz`` via
    :mod:`aasist_tpu.utils.pytree_io` — the equivalent of the reference's
    ``.pth`` artifacts, loadable torch-free;
  * full train state (params, model state, optimizer state, step, epoch,
    best metrics) as a directory of ``.npz`` files with crash-safe
    save-then-swap semantics and true resume; an optional orbax backend
    lives in :mod:`aasist_tpu.train.orbax_compat`.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

from aasist_tpu.utils import pytree_io


@dataclasses.dataclass
class TrainCheckpoint:
    params: Any
    model_state: Any
    opt_state: Any
    step: int
    epoch: int
    best_dev_eer: float
    best_eval_eer: float
    best_eval_tdcf: float
    n_swa: int
    swa_avg: Optional[Any] = None


def save_weights(path, params, model_state) -> None:
    pytree_io.save_tree_npz(path, params, model_state)


def load_weights(path):
    params, state = pytree_io.load_tree_npz(path)
    return (pytree_io.tree_to_device(params),
            pytree_io.tree_to_device(state))


def _meta_of(ckpt: TrainCheckpoint) -> dict:
    return {
        "step": ckpt.step, "epoch": ckpt.epoch,
        "best_dev_eer": ckpt.best_dev_eer,
        "best_eval_eer": ckpt.best_eval_eer,
        "best_eval_tdcf": ckpt.best_eval_tdcf,
        "n_swa": ckpt.n_swa,
        "has_swa": ckpt.swa_avg is not None,
    }


def save_train_state(directory, ckpt: TrainCheckpoint) -> None:
    """Crash-safe full-state save.

    Write-to-tmp, then move the previous state aside (``.old``), swap the
    tmp dir into place, and only then delete the old state — at every
    instant at least one complete state exists on disk under a name
    ``load_train_state`` knows how to find (it falls back to ``.old``
    if a crash between the two renames left no primary directory).
    """
    directory = Path(directory)
    tmp = directory.with_name(directory.name + ".tmp")
    old = directory.with_name(directory.name + ".old")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    pytree_io.save_tree_npz(tmp / "weights.npz", ckpt.params,
                            ckpt.model_state)
    flat_opt = pytree_io.flatten_tree(_opt_state_to_tree(ckpt.opt_state))
    np.savez(tmp / "opt_state.npz", **flat_opt)
    if ckpt.swa_avg is not None:
        np.savez(tmp / "swa.npz",
                 **pytree_io.flatten_tree(ckpt.swa_avg))
    (tmp / "meta.json").write_text(json.dumps(_meta_of(ckpt)))
    # clear .old ONLY when a primary exists to take its place: in the
    # post-crash-recovery state (primary missing, .old holding the only
    # complete checkpoint) an early rmtree(old) would leave a window
    # with no loadable state at all
    if directory.exists():
        if old.exists():
            shutil.rmtree(old)
        os.replace(directory, old)
    os.replace(tmp, directory)
    if old.exists():
        shutil.rmtree(old)


def _opt_state_to_tree(opt_state):
    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    return {str(i): np.asarray(leaf) for i, leaf in enumerate(leaves)}


def _tree_to_opt_state(tree, template_opt_state):
    leaves, treedef = jax.tree_util.tree_flatten(template_opt_state)
    import jax.numpy as jnp
    new_leaves = [jnp.asarray(tree[str(i)]).astype(
        np.asarray(leaves[i]).dtype).reshape(np.asarray(leaves[i]).shape)
        for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_train_state(directory, template_opt_state) -> TrainCheckpoint:
    directory = Path(directory)
    if not directory.exists():
        # a crash between save_train_state's two renames leaves only the
        # ``.old`` copy — recover from it
        old = directory.with_name(directory.name + ".old")
        if old.exists():
            directory = old
    meta = json.loads((directory / "meta.json").read_text())
    params, model_state = load_weights(directory / "weights.npz")
    opt_flat = dict(np.load(directory / "opt_state.npz"))
    opt_state = _tree_to_opt_state(opt_flat, template_opt_state)
    swa_avg = None
    if meta.get("has_swa") and (directory / "swa.npz").exists():
        swa_avg = pytree_io.tree_to_device(pytree_io.unflatten_tree(
            dict(np.load(directory / "swa.npz"))))
    return TrainCheckpoint(
        params=params, model_state=model_state, opt_state=opt_state,
        step=meta["step"], epoch=meta["epoch"],
        best_dev_eer=meta["best_dev_eer"],
        best_eval_eer=meta["best_eval_eer"],
        best_eval_tdcf=meta["best_eval_tdcf"],
        n_swa=meta["n_swa"], swa_avg=swa_avg)
