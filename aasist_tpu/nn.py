"""Minimal functional NN layer library for the framework.

Design: models are pure functions over nested-dict parameter pytrees, split
into ``params`` (trainable) and ``state`` (non-trainable, e.g. batch-norm
running statistics).  Parameter tensors keep the PyTorch reference's memory
layout (Linear ``weight`` is (out, in); Conv2d ``weight`` is (O, I, H, W))
so the ``.pth`` checkpoint converter is a mechanical key-for-key copy and
parity tests compare like with like; XLA's layout assignment makes the
on-device layout independent of the logical layout, so this costs nothing
on TPU.

Everything here is shape-static and jit-friendly: no data-dependent Python
control flow, no dynamic shapes.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, Any]
State = Dict[str, Any]

BN_EPS = 1e-5       # torch BatchNorm default
BN_MOMENTUM = 0.1   # torch BatchNorm default (new = (1-m)*old + m*batch)


# --------------------------------------------------------------- initialisers
def _uniform(rng, shape, bound):
    return jax.random.uniform(
        rng, shape, minval=-bound, maxval=bound, dtype=jnp.float32)


def linear_init(rng, in_dim: int, out_dim: int, bias: bool = True) -> Params:
    """Kaiming-uniform fan-in init, matching torch.nn.Linear defaults."""
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"weight": _uniform(k1, (out_dim, in_dim), bound)}
    if bias:
        p["bias"] = _uniform(k2, (out_dim,), bound)
    return p


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ W^T + b with torch-layout W (out, in). x: (..., in)."""
    y = jnp.einsum("...i,oi->...o", x, p["weight"])
    if "bias" in p:
        y = y + p["bias"]
    return y


def conv_init(rng, in_ch: int, out_ch: int, kernel: Sequence[int],
              bias: bool = True) -> Params:
    k1, k2 = jax.random.split(rng)
    fan_in = in_ch * int(np.prod(kernel))
    bound = 1.0 / math.sqrt(fan_in)
    p = {"weight": _uniform(k1, (out_ch, in_ch, *kernel), bound)}
    if bias:
        p["bias"] = _uniform(k2, (out_ch,), bound)
    return p


def conv2d(p: Params, x: jnp.ndarray,
           padding: Sequence[Tuple[int, int]] = ((0, 0), (0, 0)),
           stride: Sequence[int] = (1, 1)) -> jnp.ndarray:
    """2-D cross-correlation, NCHW/OIHW, explicit per-edge padding.

    torch's symmetric ``padding=(ph, pw)`` corresponds to
    ``padding=((ph, ph), (pw, pw))`` here; the reference's residual blocks
    need genuinely asymmetric time/freq padding (e.g. conv2 of the original
    ``Residual_block``: pad (0,1) with kernel (2,3) —
    /root/reference/models/RawNetGatSpoofST.py:240-244).
    """
    y = lax.conv_general_dilated(
        x, p["weight"], window_strides=tuple(stride),
        padding=tuple(tuple(q) for q in padding),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "bias" in p:
        y = y + p["bias"][None, :, None, None]
    return y


def conv1d(p: Params, x: jnp.ndarray, padding: Tuple[int, int] = (0, 0),
           stride: int = 1) -> jnp.ndarray:
    """1-D cross-correlation, NCL/OIL layouts. x: (B, C, L)."""
    y = lax.conv_general_dilated(
        x, p["weight"], window_strides=(stride,),
        padding=(tuple(padding),),
        dimension_numbers=("NCH", "OIH", "NCH"))
    if "bias" in p:
        y = y + p["bias"][None, :, None]
    return y


# ------------------------------------------------------------------ batchnorm
def bn_init(num_features: int) -> Tuple[Params, State]:
    p = {"weight": jnp.ones((num_features,), jnp.float32),
         "bias": jnp.zeros((num_features,), jnp.float32)}
    s = {"mean": jnp.zeros((num_features,), jnp.float32),
         "var": jnp.ones((num_features,), jnp.float32)}
    return p, s


def batch_norm(p: Params, s: State, x: jnp.ndarray, axis: int,
               train: bool, momentum: float = BN_MOMENTUM
               ) -> Tuple[jnp.ndarray, State]:
    """BatchNorm over the ``axis``-th dimension (the channel dim).

    Eval mode uses running statistics (torch semantics); train mode uses
    batch statistics and returns updated running stats with torch's
    unbiased-variance running update (``BatchNormNd`` docs).
    """
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    w = p["weight"].reshape(shape)
    b = p["bias"].reshape(shape)
    if not train:
        mean = s["mean"].reshape(shape)
        var = s["var"].reshape(shape)
        return (x - mean) * lax.rsqrt(var + BN_EPS) * w + b, s

    reduce_axes = tuple(i for i in range(x.ndim) if i != axis)
    mean = jnp.mean(x, axis=reduce_axes)
    var = jnp.var(x, axis=reduce_axes)
    n = x.size // x.shape[axis]
    unbiased = var * (n / max(n - 1, 1))
    new_s = {
        "mean": (1 - momentum) * s["mean"] + momentum * mean,
        "var": (1 - momentum) * s["var"] + momentum * unbiased,
    }
    y = ((x - mean.reshape(shape)) * lax.rsqrt(var.reshape(shape) + BN_EPS)
         * w + b)
    return y, new_s


# ------------------------------------------------------------------- dropout
def dropout(rng: Optional[jax.Array], x: jnp.ndarray, p: float,
            train: bool) -> jnp.ndarray:
    """Inverted dropout, identical scaling to torch (train: mask/(1-p))."""
    if not train or p == 0.0:
        return x
    if rng is None:
        raise ValueError("dropout in train mode needs an rng key")
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


# --------------------------------------------------------------- activations
selu = jax.nn.selu                      # same constants as torch SELU
sigmoid = jax.nn.sigmoid


def leaky_relu(x, negative_slope=0.3):
    return jnp.where(x >= 0, x, negative_slope * x)


# ------------------------------------------------------------------- pooling
def max_pool(x: jnp.ndarray, window: Sequence[int],
             stride: Optional[Sequence[int]] = None) -> jnp.ndarray:
    """Max pooling over trailing spatial dims of NCHW/NCL, VALID padding.

    ``window`` has one entry per spatial dim (x.ndim - 2 of them);
    default stride equals window (torch MaxPoolNd default).
    """
    # NB: a reshape-split + max formulation (free minor split, dense
    # backward) was tried in round 2 and measured SLOWER on TPU for both
    # forward and backward than reduce_window, and its (T/3, 3) minor
    # layout broke the full-model compile — keep reduce_window.
    stride = tuple(stride) if stride is not None else tuple(window)
    dims = (1, 1) + tuple(window)
    strides = (1, 1) + stride
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, strides, "VALID")


def avg_pool_full(x: jnp.ndarray, axes: Sequence[int]) -> jnp.ndarray:
    """Global average pool over the given axes (AdaptiveAvgPool*d(1))."""
    return jnp.mean(x, axis=tuple(axes))


# ------------------------------------------------------- model-object helpers
def with_compute_dtype(model, dtype):
    """Return a shallow copy of an architecture object with a different
    ``compute_dtype``.

    Architecture objects are static trace-time descriptions shared between
    scorers/train-steps; mutating them in place would couple unrelated
    users (two Scorers with different bf16 settings over one model object
    would interfere).  Copying is cheap — parameters live in external
    pytrees, the object holds only config + precomputed constants.
    """
    import copy

    m = copy.copy(model)
    m.compute_dtype = jnp.dtype(dtype)
    return m


# ----------------------------------------------------- optimizer grad masks
def all_true_mask(params: Params) -> Params:
    return jax.tree_util.tree_map(lambda _: True, params)


def false_like(subtree: Params) -> Params:
    return jax.tree_util.tree_map(lambda _: False, subtree)


# ------------------------------------------------------------- RNG utilities
class RngStream:
    """Deterministic stream of PRNG keys for layer-by-layer dropout.

    Splitting happens eagerly at trace time (a fixed number of times per
    forward), so the whole forward stays jit-compatible.

    ``dropout_enabled=False`` turns every ``stream_dropout`` drawn from
    this stream into the identity while leaving the key-consumption
    pattern unchanged — used by the train-mode numerical differentials
    (torch goldens are captured with all ``nn.Dropout`` modules set to
    p=0 while BatchNorm stays in train mode).
    """

    def __init__(self, key: Optional[jax.Array],
                 dropout_enabled: bool = True):
        self._key = key
        self.dropout_enabled = dropout_enabled

    def next(self) -> Optional[jax.Array]:
        if self._key is None:
            return None
        self._key, sub = jax.random.split(self._key)
        return sub


def stream_dropout(rngs: "RngStream", x: jnp.ndarray, p: float,
                   train: bool) -> jnp.ndarray:
    """Dropout drawing its key from a RngStream.

    Consumes a key from the stream whenever an enabled train-mode dropout
    *would* fire, so disabling dropout never shifts the keys seen by later
    layers (freq-aug and BN behaviour stay bit-identical either way).
    """
    if not train or p == 0.0:
        return x
    key = rngs.next()
    if not rngs.dropout_enabled:
        return x
    return dropout(key, x, p, True)
