"""PyTorch checkpoint conversion (``.pth`` state_dict -> JAX pytrees).

The reference ships two pretrained checkpoints (models/weights/AASIST.pth,
AASIST-L.pth; 229 tensors each, keyed to the original (2,3)-kernel residual
encoder — SURVEY.md §2 C20).  Because this framework keeps torch memory
layouts for all parameters (see aasist_tpu/nn.py), conversion is a
mechanical key-for-key copy:

  * ``running_mean`` / ``running_var``  -> state tree (``mean`` / ``var``)
  * ``num_batches_tracked``             -> dropped (never used in math)
  * ``encoder.{i}.0.*``                 -> ``encoder.{i}.*`` (the reference
    wraps each block in a redundant one-element nn.Sequential,
    models/AASIST.py:766-772)
  * everything else                     -> params tree, same path

torch is imported lazily: it is only needed when converting, never at
train/eval/bench time.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Sequence, Tuple

import numpy as np


def load_torch_state_dict(path) -> Dict[str, np.ndarray]:
    import torch  # lazy: conversion-time only
    sd = torch.load(path, map_location="cpu")
    return {k: v.detach().numpy() for k, v in sd.items()}


_SEQ_WRAPPER = re.compile(r"^(encoder(?:_[ST])?\.\d+|block\d+)\.0\.")
_STAT_NAMES = {"running_mean": "mean", "running_var": "var"}


def _navigate(tree: Any, tokens):
    node = tree
    for t in tokens:
        if isinstance(node, (list, tuple)):
            node = node[int(t)]
        else:
            node = node[t]
    return node


def _leaf_paths(tree: Any, prefix: Tuple[str, ...] = ()) -> list:
    """Enumerate dotted paths of every array leaf in a nested dict/list."""
    if isinstance(tree, dict):
        out = []
        for k, v in tree.items():
            out.extend(_leaf_paths(v, prefix + (str(k),)))
        return out
    if isinstance(tree, (list, tuple)):
        out = []
        for i, v in enumerate(tree):
            out.extend(_leaf_paths(v, prefix + (str(i),)))
        return out
    return [prefix]


def fill_from_state_dict(
    params: Any, state: Any, sd: Dict[str, np.ndarray],
    strict: bool = True,
    allow_unfilled: Sequence[str] = (),
) -> Tuple[Any, Any]:
    """Fill freshly-initialised (params, state) trees from a torch sd.

    Returns new trees (input trees are not mutated at the leaf level —
    containers are rebuilt via deep copy first).

    ``strict`` guards the ckpt→model direction (every checkpoint tensor
    must land somewhere).  The model→ckpt direction is always checked:
    any model leaf the checkpoint did not fill raises, so a silently
    random-initialised leaf cannot rot undetected.  Genuinely-new heads
    (e.g. fine-tuning a speaker-conditioning module absent from the
    reference .pth) are opted out per-prefix via ``allow_unfilled``
    (dotted-path prefixes, e.g. ``"spk_cond_gat"``).
    """
    import copy
    import jax.numpy as jnp

    params = copy.deepcopy(params)
    state = copy.deepcopy(state)
    filled = set()

    for key, value in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        key = _SEQ_WRAPPER.sub(r"\1.", key)
        tokens = key.split(".")
        leaf = tokens[-1]
        if leaf in _STAT_NAMES:
            target, leaf = state, _STAT_NAMES[leaf]
            tree_tag = "state"
        else:
            target = params
            tree_tag = "params"
        try:
            parent = _navigate(target, tokens[:-1])
        except (KeyError, IndexError, TypeError) as e:
            if strict:
                raise KeyError(
                    f"checkpoint key {key!r} has no home in the model tree"
                ) from e
            continue
        if strict and leaf not in parent:
            raise KeyError(f"checkpoint leaf {key!r} missing in model tree")
        expected = np.asarray(parent[leaf])
        if expected.shape != value.shape:
            raise ValueError(
                f"shape mismatch for {key!r}: model {expected.shape} "
                f"vs checkpoint {value.shape}")
        parent[leaf] = jnp.asarray(value)
        filled.add((tree_tag, tuple(tokens[:-1]) + (leaf,)))

    unfilled = []
    for tag, tree in (("params", params), ("state", state)):
        for path in _leaf_paths(tree):
            if (tag, path) in filled:
                continue
            dotted = ".".join(path)
            if any(dotted == a or dotted.startswith(a + ".")
                   for a in allow_unfilled):
                continue
            unfilled.append(f"{tag}:{dotted}")
    if unfilled:
        raise ValueError(
            "checkpoint left model leaves at their random initialisation "
            f"({len(unfilled)}): {sorted(unfilled)[:20]}"
            + (" ..." if len(unfilled) > 20 else "")
            + " — pass allow_unfilled=[...] for genuinely-new heads")
    return params, state


def convert_checkpoint(model, pth_path, npz_path=None):
    """Convert a reference ``.pth`` into this framework's (params, state).

    If ``npz_path`` is given the converted trees are also saved via
    ``pytree_io.save_tree_npz`` for torch-free loading later.
    """
    import jax

    sd = load_torch_state_dict(pth_path)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state = fill_from_state_dict(params, state, sd)
    if npz_path is not None:
        from aasist_tpu.utils.pytree_io import save_tree_npz
        save_tree_npz(npz_path, params, state)
    return params, state
