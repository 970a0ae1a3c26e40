"""Probe: fold the downsample conv INTO conv2 as an extra input channel.

probe_conv1d_fold.py showed block0's conv2 dot runs at 90 TF/s standalone
— the conv lowering is fine; block0's 98 in-model ms are HBM traffic.
The one *unfusable* materialization in a channel-changing block is the
downsample path: ``y = conv2(z) + conv_ds(x)`` forces XLA to write and
re-read conv_ds's full-size output (8.1 GB at B=256) because two convs
cannot fuse into one elementwise add.

Reformulation (eval-only, channel-changing blocks):
  * conv1_aug: (1 -> 33) where channel 0 is the identity (a delta tap at
    kernel position (1,1) under pad ((1,1),(1,1)) reproduces x exactly,
    with a zero bottom row at h=23), channels 1..32 are conv1.
  * epilogue: selu(bn(.)) applied to channels 1..32 only (channel 0
    passes through raw) — elementwise, fuses.
  * conv2_aug: (33 -> 32) where input channel 0 carries the downsample
    weights in the kH=0 row (ds is kernel (1,3) on x[h]; z_aug channel 0
    at row h+0 is x[h]), channels 1..32 are conv2.  Bias = b2 + b_ds.
  Then add disappears and maxpool fuses into the single conv's consumer.
  Extra FLOPs: 33/32 input channels = +3%.

Measures standard vs aug block0 at B=256 bf16 (chained, DCE-proof) and
checks numerical parity.

Usage: python tools/probe_aug_channel.py [batch]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
H, W = 23, 21490
DN = ("NCHW", "OIHW", "NCHW")


def timed(fn, *args, iters=6):
    f = jax.jit(fn)
    float(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def chain_max(op, k):
    def fn(xx):
        def body(c, _):
            y = op(xx + c.astype(xx.dtype))
            return jnp.max(y.astype(jnp.float32)) * 1e-20, ()
        c, _ = lax.scan(body, jnp.float32(0.0), None, length=k)
        return c
    return fn


def rate(op, x, label, k2=5):
    t1 = timed(chain_max(op, 1), x)
    t2 = timed(chain_max(op, k2), x)
    per = (t2 - t1) / (k2 - 1)
    print(f"{label:8s}: {1e3 * per:8.2f} ms/op", flush=True)
    return per


def main():
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    w1 = jnp.asarray(rng.standard_normal((32, 1, 2, 3)) * 0.3, bf)
    b1 = jnp.asarray(rng.standard_normal((32,)) * 0.1, bf)
    w2 = jnp.asarray(rng.standard_normal((32, 32, 2, 3)) * 0.1, bf)
    b2 = jnp.asarray(rng.standard_normal((32,)) * 0.1, bf)
    wd = jnp.asarray(rng.standard_normal((32, 1, 1, 3)) * 0.3, bf)
    bd = jnp.asarray(rng.standard_normal((32,)) * 0.1, bf)
    # eval-mode bn as per-channel affine
    ga = jnp.asarray(1.0 + 0.1 * rng.standard_normal((32,)), bf)
    be = jnp.asarray(0.1 * rng.standard_normal((32,)), bf)

    x = jnp.asarray(rng.standard_normal((B, 1, H, W)) * 0.5, bf)

    def block0_std(x):
        z = lax.conv_general_dilated(x, w1, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=DN)
        z = z + b1[None, :, None, None]
        z = jax.nn.selu(ga[None, :, None, None] * z
                        + be[None, :, None, None])
        y = lax.conv_general_dilated(z, w2, (1, 1), ((0, 0), (1, 1)),
                                     dimension_numbers=DN)
        y = y + b2[None, :, None, None]
        d = lax.conv_general_dilated(x, wd, (1, 1), ((0, 0), (1, 1)),
                                     dimension_numbers=DN)
        y = y + d + bd[None, :, None, None]
        return lax.reduce_window(y, -jnp.inf, lax.max, (1, 1, 1, 3),
                                 (1, 1, 1, 3), "VALID")

    # augmented single-pipeline form
    w1a = jnp.zeros((33, 1, 2, 3), bf).at[1:].set(w1).at[0, 0, 1, 1].set(1)
    b1a = jnp.zeros((33,), bf).at[1:].set(b1)
    gaa = jnp.ones((33,), bf).at[1:].set(ga)
    bea = jnp.zeros((33,), bf).at[1:].set(be)
    w2a = jnp.zeros((32, 33, 2, 3), bf)
    w2a = w2a.at[:, 1:].set(w2).at[:, 0, 0:1, :].set(wd[:, 0])
    b2a = b2 + bd
    cmask = (jnp.arange(33) == 0)[None, :, None, None]

    def block0_aug(x):
        z = lax.conv_general_dilated(x, w1a, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=DN)
        z = z + b1a[None, :, None, None]
        za = gaa[None, :, None, None] * z + bea[None, :, None, None]
        z = jnp.where(cmask, z, jax.nn.selu(za))
        y = lax.conv_general_dilated(z, w2a, (1, 1), ((0, 0), (1, 1)),
                                     dimension_numbers=DN)
        y = y + b2a[None, :, None, None]
        return lax.reduce_window(y, -jnp.inf, lax.max, (1, 1, 1, 3),
                                 (1, 1, 1, 3), "VALID")

    ya = jax.jit(block0_std)(x[:2])
    yb = jax.jit(block0_aug)(x[:2])
    err = float(jnp.max(jnp.abs((ya - yb).astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(ya.astype(jnp.float32))))
    print(f"parity max|d|={err:.3e} (max|y|={ref:.3e})", flush=True)

    rate(block0_std, x, "b0-std")
    rate(block0_aug, x, "b0-aug")


if __name__ == "__main__":
    main()
