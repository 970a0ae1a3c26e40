"""Measure Mosaic MXU throughput for the dot shapes the fused kernels use.

One pallas kernel per shape: operands resident in VMEM, an in-kernel
fori_loop of `n` chained dots (result feeds back at epsilon weight, so
nothing can be elided), one grid step.  TF/s = 2*K*M*N*n / t.

Shapes (K = contraction, M = result sublane rows, N = result lanes):
  k132_m210   v1 frontend dot
  k144_m630   v3 one-dot frontend (mod-9, all phases+filters)
  k192_m32    tap-stacked C=32 conv2 (old resblock kernel)
  k384_m96    shift-enumerated r-packed C=32 conv2 (dense, 50% useful)
  k384_m64    tap-stacked C=64 conv2
  k128_m128   MXU-native baseline
  k256_m256   bigger baseline
  k12_m192    block0 conv1+ds packed (1-channel, K-starved)

Usage: python tools/probe_mxu_shapes.py [n_inner] [shapes...]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_LANES = 2048

SHAPES = {
    "k132_m210": (132, 210),
    "k144_m630": (144, 630),
    "k192_m32": (192, 32),
    "k384_m96": (384, 96),
    "k384_m64": (384, 64),
    "k128_m128": (128, 128),
    "k256_m256": (256, 256),
    "k12_m192": (12, 192),
    "k96_m96": (96, 96),
    "k96_m192": (96, 192),
    "k192_m96": (192, 96),
    "k192_m64": (192, 64),
}


def _kernel(w, a, out_ref, a_scr, *, n: int, m: int):
    a_scr[...] = a[...]

    def body(i, z):
        # dependence through a_scr: each dot reads what the previous
        # iteration wrote, so the loop cannot be collapsed or hoisted
        y = lax.dot_general(w[...], a_scr[...], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        # full-tensor consumption, algebraically unfoldable: sum of y*y
        # cannot be rewritten into the dot (sum-of-y could: sum_m(W.A) ==
        # (sum_m W).A, which Mosaic exploited in the previous revision)
        s = jnp.sum(y * y, axis=0, keepdims=True) * 1e-30
        a_scr[0:1, :] = a_scr[0:1, :] + s.astype(a_scr.dtype)
        return z

    lax.fori_loop(0, n, body, 0)
    out_ref[...] = a_scr[0:8, 0:128].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(2, 3))
def run(w, a, n, m):
    kernel = functools.partial(_kernel, n=n, m=m)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((w.shape[0], N_LANES), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(w, a)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    names = sys.argv[2:] or list(SHAPES)
    for name in names:
        k, m = SHAPES[name]
        w = jnp.ones((k, m), jnp.bfloat16) * 1e-3
        a = jnp.ones((k, N_LANES), jnp.bfloat16)
        try:
            float(run(w, a, 2, m)[0, 0])
            f = lambda: float(run(w, a, n, m)[0, 0])
            f()
            ts = []
            for _ in range(7):
                t0 = time.perf_counter()
                f()
                ts.append(time.perf_counter() - t0)
            t = min(ts)
            # subtract the 2-iter warm call cost? measure n vs 2n instead
            t0s = []
            f2 = lambda: float(run(w, a, 2 * n, m)[0, 0])
            f2()
            for _ in range(7):
                t0 = time.perf_counter()
                f2()
                t0s.append(time.perf_counter() - t0)
            t2 = min(t0s)
            per = (t2 - t) / n
            fl = 2 * k * m * N_LANES
            print(f"{name:10s}: {1e6 * per:8.2f} us/dot  "
                  f"-> {fl / per / 1e12:6.1f} TF/s "
                  f"({100 * fl / per / 1e12 / 197:4.1f}% peak)", flush=True)
        except Exception as e:
            print(f"{name:10s}: FAIL {type(e).__name__}: {str(e)[:140]}",
                  flush=True)


if __name__ == "__main__":
    main()
