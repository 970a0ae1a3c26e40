"""Probe: does XLA lower rank-3 1-D convs better than the 2-D pyramid?

Motivation: RawNet2 (pure 1-D convs, C=20/128) runs at 5172 utt/s on
this chip while AASIST's 2-D (2,3)-kernel pyramid crawls (block0 = 98 of
161 ms).  tools/probe_kh_split.py showed that splitting kH=2 into two
kH=1 convs *while staying 4-D NCHW* is 67% slower — but that probe never
left the 2-D conv lowering path.  Here the H dim (23/24 rows) is folded
into the BATCH dim so the conv is a genuine rank-3 NCH conv1d, the exact
shape class RawNet2 lowers well.

Decomposition for conv2 (C32->32, kernel (2,3), pad ((0,0),(1,1))):
    y[:, :, h, :] = conv1d(x[:, :, h,   :], w[:, :, 0, :])
                  + conv1d(x[:, :, h+1, :], w[:, :, 1, :])
Fold h into batch: transpose (B,C,H,W)->(B,H,C,W), two overlapping
H-slices reshaped to (B*(H-1), C, W), one conv1d each, add, fold back.

Measured ops (chained-scan methodology, host-load-immune):
  c2-2d     the real block0 conv2 as conv_general_dilated 2-D
  c1d-eq    one rank-3 conv1d of the same channel geometry (half the
            2-D FLOPs; x2 of these + add replicate the 2-D conv)
  c1d-big   rank-3 conv1d at RawNet2-like C=128 geometry (sanity: does
            the fast lowering reproduce at all on synthetic shapes?)
  fold-full the complete fold round-trip (transpose + 2 conv1d + add +
            transpose back) vs c2-2d — the deployable candidate

Usage: python tools/probe_conv1d_fold.py [batch]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
H, W, C = 24, 21490, 32
DN1D = ("NCH", "OIH", "NCH")


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


def rate(op, x, label, flops, k2=7):
    t1 = timed(chain_max(op, 1), x)
    t2 = timed(chain_max(op, k2), x)
    per = (t2 - t1) / (k2 - 1)
    print(f"{label:10s}: {1e3 * per:8.2f} ms/op  -> "
          f"{flops / per / 1e12:6.1f} TF/s", flush=True)
    return per


def main():
    rng = np.random.default_rng(0)
    w2 = jnp.asarray(rng.standard_normal((C, C, 2, 3)), jnp.bfloat16)
    x4 = jnp.asarray(rng.standard_normal((B, C, H, W)) * 0.1, jnp.bfloat16)

    fl_2d = 2 * B * (H - 1) * W * C * (C * 6)

    def c2_2d(x):
        return lax.conv_general_dilated(
            x, w2, (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
    rate(c2_2d, x4, "c2-2d", fl_2d)

    # one rank-3 conv1d, same channel geometry, folded batch
    x3 = x4.transpose(0, 2, 1, 3).reshape(B * H, C, W)
    w1d = w2[:, :, 0, :]
    fl_1d = 2 * B * H * W * C * (C * 3)

    def c1d_eq(x):
        return lax.conv_general_dilated(
            x, w1d, (1,), ((1, 1),), dimension_numbers=DN1D)
    rate(c1d_eq, x3, "c1d-eq", fl_1d)

    # RawNet2-geometry sanity row: C=128, B*L comparable
    c_big, l_big, b_big = 128, 7178, 64
    xb = jnp.asarray(
        rng.standard_normal((b_big, c_big, l_big)) * 0.1, jnp.bfloat16)
    wb = jnp.asarray(
        rng.standard_normal((c_big, c_big, 3)), jnp.bfloat16)
    fl_big = 2 * b_big * l_big * c_big * (c_big * 3)

    def c1d_big(x):
        return lax.conv_general_dilated(
            x, wb, (1,), ((1, 1),), dimension_numbers=DN1D)
    rate(c1d_big, xb, "c1d-big", fl_big)

    # deployable fold: full round-trip, output == c2_2d numerically
    w0, w1 = w2[:, :, 0, :], w2[:, :, 1, :]

    def fold_full(x):
        xt = x.transpose(0, 2, 1, 3)                    # (B,H,C,W)
        r0 = xt[:, : H - 1].reshape((B * (H - 1), C, W))
        r1 = xt[:, 1:].reshape((B * (H - 1), C, W))
        y = (lax.conv_general_dilated(r0, w0, (1,), ((1, 1),),
                                      dimension_numbers=DN1D)
             + lax.conv_general_dilated(r1, w1, (1,), ((1, 1),),
                                        dimension_numbers=DN1D))
        return y.reshape(B, H - 1, C, W).transpose(0, 2, 1, 3)
    rate(fold_full, x4, "fold-full", fl_2d)

    # parity spot check (small slice, f32 on CPU of the same algebra)
    ya = jax.jit(c2_2d)(x4)[:2]
    yb = jax.jit(fold_full)(x4)[:2]
    err = float(jnp.max(jnp.abs((ya - yb).astype(jnp.float32))))
    print(f"fold parity max|d| = {err:.3e}")


if __name__ == "__main__":
    main()
