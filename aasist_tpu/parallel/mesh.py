"""Device mesh + sharding helpers (SPMD data parallelism).

The reference is strictly single-device (SURVEY.md §2 "Parallelism"
table: no DDP / torch.distributed anywhere; hard ``device="cuda"`` gate at
main.py:84-87).  This framework makes data parallelism first-class the
JAX way: a 1-D ``Mesh`` over all local devices with the batch axis of
every array sharded along it.  Gradients never need explicit collectives —
jit inserts the psum when the loss is a mean over the sharded batch.

The mesh axis layout reserves a ``model`` axis so tensor-parallel
``PartitionSpec``s can be introduced for larger variants without reshaping
the code (models here are <=18M params, so the model axis stays size 1 in
practice).  Multi-host runs extend the same mesh over DCN via
``jax.distributed.initialize`` before calling :func:`make_mesh`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = n_data * n_model
    grid = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (batch) across the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_specs(mesh: Mesh, n_arrays: int):
    """Convenience: per-array NamedShardings for a batch tuple."""
    return tuple(batch_sharding(mesh) for _ in range(n_arrays))


def pad_batch_to_multiple(x: np.ndarray, multiple: int):
    """Pad dim 0 by repeating the last row so it divides the mesh; returns
    (padded, n_real)."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = np.repeat(x[-1:], rem, axis=0)
    return np.concatenate([x, pad], axis=0), n
