"""Probe: maxpool(1,3) formulations on the block0 output shape.

docs/PERF.md: reduce_window reads at ~196 GB/s (gather-class), making
the pools ~40% of block0's cost.  This probe times every XLA-level
formulation of the stride-3 time pool on (B,32,23,21489) bf16, with the
chained-scan + full-reduction methodology (probe_calibration.py):

  rw        lax.reduce_window (current nn.max_pool)
  strided   max of 3 strided lane slices y[...,0::3] etc.
  shiftsel  full-bandwidth shifted max, then one strided slice
  reshape   (..., u, 3) reshape + max over minor axis
  rw-add    reduce_window(a + b): does XLA fuse the residual add?

Usage: python tools/probe_pool_variants.py [B]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
C, F, T = 32, 23, 21489
TO = T // 3


def timed(fn, *args, iters=5):
    f = jax.jit(fn)
    float(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def rate(op, args, label, nbytes, k2=9):
    def chain(k):
        def fn(*aa):
            def body(c, _):
                y = op(*aa, c)
                return jnp.max(y.astype(jnp.float32)) * 1e-20, ()
            c, _ = lax.scan(body, jnp.float32(0.0), None, length=k)
            return c
        return fn
    try:
        t1 = timed(chain(1), *args)
        t2 = timed(chain(k2), *args)
    except Exception as e:  # noqa: BLE001
        print(f"{label:9s}: FAIL {str(e)[:130]}", flush=True)
        return
    per = (t2 - t1) / (k2 - 1)
    print(f"{label:9s}: {1e3 * per:8.2f} ms/op  "
          f"-> {nbytes / per / 1e9:6.0f} GB/s(read)", flush=True)


def main():
    y = jax.device_put(jnp.zeros((B, C, F, T), jnp.bfloat16))
    b2 = jax.device_put(jnp.zeros((B, C, F, T), jnp.bfloat16))
    nbytes = y.size * 2

    def rw(v, c):
        v = v + c.astype(v.dtype)
        return lax.reduce_window(v, -jnp.inf, lax.max,
                                 (1, 1, 1, 3), (1, 1, 1, 3), "VALID")

    def strided(v, c):
        v = v + c.astype(v.dtype)
        return jnp.maximum(jnp.maximum(v[..., 0:3 * TO:3],
                                       v[..., 1:3 * TO:3]),
                           v[..., 2:3 * TO:3])

    def shiftsel(v, c):
        v = v + c.astype(v.dtype)
        m = jnp.maximum(jnp.maximum(v[..., 0:T - 2], v[..., 1:T - 1]),
                        v[..., 2:T])
        return m[..., 0:3 * TO - 2:3]

    def reshape3(v, c):
        v = v + c.astype(v.dtype)
        return jnp.max(v[..., :3 * TO].reshape(B, C, F, TO, 3), axis=-1)

    def rw_add(v, w, c):
        return lax.reduce_window(v + w + c.astype(v.dtype), -jnp.inf,
                                 lax.max, (1, 1, 1, 3), (1, 1, 1, 3),
                                 "VALID")

    rate(rw, (y,), "rw", nbytes)
    rate(strided, (y,), "strided", nbytes)
    rate(shiftsel, (y,), "shiftsel", nbytes)
    rate(reshape3, (y,), "reshape", nbytes)
    rate(rw_add, (y, b2), "rw-add", 2 * nbytes)


if __name__ == "__main__":
    main()
