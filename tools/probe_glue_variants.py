"""Probe phase-deinterleave (glue) strategies for the fused frontend.

The (B, T, 3) -> (3, B, T) transpose XLA emits for the polyphase split
costs ~38 ms at B=256 — more than the conv work itself.  Variants:

  g0        current glue: reshape + transpose (2,0,1) + tile-stack
  g1        transpose (0,2,1) only -> (B, 3, T) + tile-stack
  g2        three stride-3 minor slices + stack axis=1
  g3        conv1d(x, I3, stride=3) -> (B, 3, T)
  g4        FULL XLA polyphase frontend: conv1d(x, bank210, stride 3)
            + phase-max + freq-pool + bn + selu  (no Pallas at all)
  xla       reference XLA frontend (stride-1 conv + maxpool(3,3))

g4 numerics are checked against xla.
Usage: python tools/probe_glue_variants.py [B]
"""

from __future__ import annotations

import collections
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
from aasist_tpu import nn  # noqa: E402
from aasist_tpu.models import layers as L  # noqa: E402
from aasist_tpu.models.layers import sinc_filterbank  # noqa: E402

KSIZE = 129


def ptime(fn, *args, iters=10, depth=3):
    for _ in range(2):
        float(fn(*args))
    pending = collections.deque()
    t0 = time.perf_counter()
    for _ in range(iters):
        pending.append(fn(*args))
        if len(pending) > depth:
            float(pending.popleft())
    while pending:
        float(pending.popleft())
    return (time.perf_counter() - t0) / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    bank = jnp.asarray(sinc_filterbank(70, 129, 16000), jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.standard_normal((B, 64600)).astype(np.float32)
    ).astype(jnp.bfloat16)
    L_in = 64600
    T = 21546            # padded phase length (>= ceil(64600/3))
    t_out = (L_in - KSIZE + 1) // 3     # 21490

    def g0(xx):
        xp = jnp.pad(xx, ((0, 0), (0, 3 * T - L_in)))
        xq = jnp.transpose(xp.reshape(B, T, 3), (2, 0, 1))
        return jnp.sum(xq.astype(jnp.float32))

    def g1(xx):
        xp = jnp.pad(xx, ((0, 0), (0, 3 * T - L_in)))
        xq = jnp.transpose(xp.reshape(B, T, 3), (0, 2, 1))
        return jnp.sum(xq.astype(jnp.float32))

    def g2(xx):
        xp = jnp.pad(xx, ((0, 0), (0, 3 * T - L_in)))
        xq = jnp.stack([xp[:, q::3] for q in range(3)], axis=1)
        return jnp.sum(xq.astype(jnp.float32))

    def g3(xx):
        xp = jnp.pad(xx, ((0, 0), (0, 3 * T - L_in)))[:, None]
        eye = jnp.eye(3, dtype=xx.dtype)[:, None, :]   # (3 out, 1 in, 3 k)
        xq = lax.conv_general_dilated(
            xp, eye, window_strides=(3,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"))
        return jnp.sum(xq.astype(jnp.float32))

    # full polyphase frontend in XLA: 210 filters = bank shifted by phase
    # p in a 131-tap window; stride-3 conv computes y_p[w] = conv(x)[3w+p]
    bank131 = np.zeros((210, 1, 131), np.float32)
    b_np = np.asarray(bank, np.float32)
    for p in range(3):
        bank131[p * 70:(p + 1) * 70, 0, p:p + 129] = b_np
    bank131 = jnp.asarray(bank131, jnp.bfloat16)

    def g4(xx):
        y = lax.conv_general_dilated(
            xx[:, None], bank131, window_strides=(3,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"))    # (B, 210, 21490)
        y = jnp.abs(y)
        yp = jnp.maximum(jnp.maximum(y[:, 0:70], y[:, 70:140]),
                         y[:, 140:210])                 # time pool
        yf = yp[:, :69].reshape(yp.shape[0], 23, 3, t_out)
        pooled = jnp.maximum(jnp.maximum(yf[:, :, 0], yf[:, :, 1]),
                             yf[:, :, 2])[:, None]      # (B,1,23,21490)
        z = pooled * 1.0 + 0.1
        return jax.nn.selu(z)

    # pool-only: cost of XLA maxpool(3,3) on the stride-1 conv output
    # (the g6 fallback: Pallas conv-only kernel + XLA pool)
    y_big = jax.device_put(jnp.zeros((B, 1, 70, 64472), jnp.bfloat16))

    def g5(yy):
        return jnp.sum(nn.max_pool(yy, (3, 3)).astype(jnp.float32))

    def xla_fe(xx):
        h = L.sinc_frontend(bank, xx)
        h = jnp.abs(h)[:, None]
        h = nn.max_pool(h, (3, 3))
        z = h * 1.0 + 0.1
        return jax.nn.selu(z)

    # numerics: g4 vs xla
    r = jax.jit(xla_fe)(x[:8])
    g = jax.jit(g4)(x[:8])
    err = np.max(np.abs(np.asarray(r, np.float32) - np.asarray(g, np.float32)))
    print(f"g4 vs xla: shapes {r.shape} {g.shape} max err {err:.3e}",
          flush=True)

    for name, f in [("g0", g0), ("g1", g1), ("g2", g2), ("g3", g3)]:
        try:
            dt = ptime(jax.jit(f), x)
            print(f"{name:6s}: {1e3 * dt:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:6s}: FAIL {str(e)[:150]}", flush=True)
    try:
        dt = ptime(jax.jit(g5), y_big)
        print(f"g5-pool: {1e3 * dt:7.2f} ms", flush=True)
    except Exception as e:
        print(f"g5-pool: FAIL {str(e)[:150]}", flush=True)
    for name, f in [("g4", g4), ("xla", xla_fe)]:
        try:
            jf = jax.jit(lambda xx, f=f: jnp.sum(f(xx).astype(jnp.float32)))
            dt = ptime(jf, x)
            print(f"{name:6s}: {1e3 * dt:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:6s}: FAIL {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
