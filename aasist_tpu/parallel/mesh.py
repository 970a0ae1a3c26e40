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
    if use < len(devices):
        # a mis-sized config would otherwise quietly run on fewer chips
        import warnings
        warnings.warn(
            f"make_mesh(n_data={n_data}, n_model={n_model}) uses only "
            f"{use} of {len(devices)} available devices; the remaining "
            f"{len(devices) - use} are idle", stacklevel=2)
    grid = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def initialize_multihost(coordinator_address: str, num_processes: int,
                         process_id: int) -> None:
    """Join a multi-host (DCN) run before building the global mesh.

    Call once per process before any other JAX API, then build the mesh
    with :func:`make_mesh` over ``jax.devices()`` (the GLOBAL device list)
    and feed per-host batch shards through :func:`global_batch`.  On CPU
    hosts collectives go through Gloo (used by the 2-process CI test,
    tests/test_multihost.py); on TPU pods the same code path rides
    ICI/DCN.  The reference has no multi-host story at all (SURVEY.md §2
    parallelism table).
    """
    # CPU cross-process collectives need an explicit implementation.
    # NB: must not touch jax.default_backend()/jax.devices() here — any
    # backend-initialising call before distributed.initialize is an error.
    platforms = str(jax.config.jax_platforms or "")
    if "cpu" in platforms or platforms == "":
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # older jax: option absent, gloo is the default
            pass
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_batch(sharding: NamedSharding, local_rows: np.ndarray,
                 global_shape: Sequence[int]):
    """Assemble a globally-sharded batch from this process's local rows.

    Each host passes only the rows it loaded; the result is one logical
    array of ``global_shape`` sharded over the mesh's data axis, usable
    directly in a pjit-ted train/eval step.
    """
    return jax.make_array_from_process_local_data(
        sharding, local_rows, tuple(global_shape))


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
