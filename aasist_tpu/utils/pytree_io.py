"""Flat serialization of parameter pytrees to .npz.

Used for the converted reference checkpoints committed with the repo and by
the orbax-independent light checkpoint path.  Paths are '/'-joined; list
indices are plain integers in the path.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np


def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_tree_npz(path, params: Any, state: Any) -> None:
    flat = {}
    flat.update({"params/" + k: v for k, v in flatten_tree(params).items()})
    flat.update({"state/" + k: v for k, v in flatten_tree(state).items()})
    np.savez(path, **flat)


def load_tree_npz(path) -> Tuple[Any, Any]:
    data = np.load(path)
    p_flat = {k[len("params/"):]: data[k] for k in data.files
              if k.startswith("params/")}
    s_flat = {k[len("state/"):]: data[k] for k in data.files
              if k.startswith("state/")}
    return unflatten_tree(p_flat), unflatten_tree(s_flat)


def tree_to_device(tree: Any):
    """Materialise numpy leaves as jnp arrays (float32 preserved)."""
    import jax.numpy as jnp
    return jax.tree_util.tree_map(jnp.asarray, tree)
