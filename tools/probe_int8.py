"""Probe: int8 matmul/conv rates vs bf16 on the attached TPU.

TPU v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOP/s peak).
If XLA lowers int8 convolutions well, a quantized inference path for the
AASIST conv pyramid (which is ~93% of the forward, docs/PERF.md) could
roughly double throughput.  This probe answers, with the RPC-floor-proof
chained-scan methodology of probe_calibration.py:

  dot-bf16 / dot-int8    4096^2 matmul rate (establishes the 2x exists)
  conv-bf16 / conv-int8  block0 conv2 geometry: (B,32,22,21488) k=(2,3)
  b0c-bf16 / b0c-int8    conv2 + pool(1,3) chain (the block0 hot path)

Usage: python tools/probe_int8.py [B]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def timed(fn, *args, iters=5):
    f = jax.jit(fn)
    float(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def rate(op, x, label, flops, k2=9):
    def chain(k):
        def fn(xx):
            def body(c, _):
                y = op(xx, c)
                return jnp.max(y.astype(jnp.float32)) * 1e-20, ()
            c, _ = lax.scan(body, jnp.float32(0.0), None, length=k)
            return c
        return fn
    try:
        t1 = timed(chain(1), x)
        t2 = timed(chain(k2), x)
    except Exception as e:  # noqa: BLE001 — report lowering rejections
        print(f"{label:10s}: FAIL {str(e)[:140]}", flush=True)
        return None
    per = (t2 - t1) / (k2 - 1)
    print(f"{label:10s}: {1e3 * per:8.2f} ms/op  "
          f"-> {flops / per / 1e12:6.1f} TF/s", flush=True)
    return per


def main():
    which = set(sys.argv[2:]) or {"dot", "conv"}

    if "dot" in which:
        # NB: the loop-carry dependence must survive the int8 cast — a
        # tiny f32 carry added *after* casting rounds to int8 zero and
        # XLA hoists the now-invariant matmul out of the scan (first
        # version of this probe "measured" 623 TF/s, above the 394 TOP/s
        # v5e int8 peak).  A carry-indexed dynamic_slice defeats LICM.
        n = 4096
        a8 = jax.device_put(jnp.ones((n, n + 8), jnp.int8))
        ab = jax.device_put(jnp.ones((n, n + 8), jnp.bfloat16) * 1e-3)

        def dslice(m, c):
            off = (jnp.abs(c) * 1e22).astype(jnp.int32) % 4
            return lax.dynamic_slice(m, (0, off), (n, n))

        rate(lambda m, c: dslice(m, c) @ dslice(m, c + 1.0), ab,
             "dot-bf16", 2 * n**3)
        rate(lambda m, c: lax.dot_general(
                 dslice(m, c), dslice(m, c + 1.0),
                 (((1,), (0,)), ((), ())),
                 preferred_element_type=jnp.int32),
             a8, "dot-int8", 2 * n**3)

    if "conv" in which:
        # block0 conv2 geometry (docs/PERF.md: block0 = 60% of forward)
        cin, cout, f, t = 32, 32, 22, 21488
        kh, kw = 2, 3
        fo, to = f - kh + 1, t - kw + 1
        flops = 2 * B * cout * fo * to * cin * kh * kw
        xb = jax.device_put(jnp.zeros((B, cin, f, t), jnp.bfloat16))
        wb = jax.device_put(jnp.ones((cout, cin, kh, kw), jnp.bfloat16))
        x8 = jax.device_put(jnp.zeros((B, cin, f, t), jnp.int8))
        w8 = jax.device_put(jnp.ones((cout, cin, kh, kw), jnp.int8))

        def conv_b(xx, c):
            return lax.conv_general_dilated(
                xx + c.astype(xx.dtype), wb, (1, 1), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))

        def conv_8(xx, c):
            return lax.conv_general_dilated(
                xx + c.astype(jnp.int8), w8, (1, 1), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.int32)

        rate(conv_b, xb, "conv-bf16", flops)
        rate(conv_8, x8, "conv-int8", flops)

        def b0c_b(xx, c):
            y = conv_b(xx, c)
            return lax.reduce_window(
                y, -jnp.inf, lax.max, (1, 1, 1, 3), (1, 1, 1, 3), "VALID")

        def b0c_8(xx, c):
            y = conv_8(xx, c)
            return lax.reduce_window(
                y, jnp.iinfo(jnp.int32).min, lax.max,
                (1, 1, 1, 3), (1, 1, 1, 3), "VALID")

        rate(b0c_b, xb, "b0c-bf16", flops)
        rate(b0c_8, x8, "b0c-int8", flops)

        # realistic int8 epilogue: requantize the int32 accumulator to
        # bf16 BEFORE the pool, so the pool reads bf16 not 2x-wide int32
        def b0r_8(xx, c):
            y = conv_8(xx, c)
            y = (y.astype(jnp.float32) * 7.8e-3).astype(jnp.bfloat16)
            return lax.reduce_window(
                y, -jnp.inf, lax.max, (1, 1, 1, 3), (1, 1, 1, 3), "VALID")

        rate(b0r_8, x8, "b0r-int8", flops)


if __name__ == "__main__":
    main()
