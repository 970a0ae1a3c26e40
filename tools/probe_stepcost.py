"""Mosaic grid-step cost diagnosis on the attached TPU.

Round-1/2 fused block0 kernels lose to XLA with a residual that looks
like ~130-260us of fixed cost per grid step (docs/PERF.md; probe_block0
v2).  This probe isolates WHERE that cost lives by timing three kernels
over the same grid/block geometry as the fused block:

  * nop    — kernel writes a constant; measures pure pipeline + output
             DMA cost per step
  * copy   — out tile = in tile; adds the input-block DMA
  * matmul — one dual-split-sized dot (K=3c, N=2c') per step from VMEM
             scratch; adds MXU work with no extra DMA

Sweeping (G, u) tells whether the cost is per-step-fixed (halves when the
step count halves), DMA-bandwidth (scales with bytes/step), or MXU-rate.

Usage: python tools/probe_stepcost.py [B]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C_IN, C_OUT, F = 32, 32, 23


def sync(v):
    return float(jnp.sum(v.astype(jnp.float32)))


def timeit(fn, *args, iters=6):
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
    return (time.perf_counter() - t0) / iters


def make_runner(mode: str, batch: int, t_total: int, g: int, u: int):
    n_tiles = t_total // u

    def kernel(x_ref, w_ref, o_ref, acc):
        if mode in ("nop", "nopF32", "nopblk"):
            o_ref[...] = jnp.full_like(o_ref, 1.0)
        elif mode == "copy":
            o_ref[...] = x_ref[:, :, :F, :u]
        elif mode == "matblk":
            a = jnp.concatenate(
                [x_ref[:, :, 0:F + 2, 0:u],
                 x_ref[:, :, 1:F + 3, 0:u],
                 x_ref[:, :, 2:F + 4, 0:u]], axis=0)
            d = lax.dot_general(
                w_ref[...], a, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y = (d[:C_OUT, :, 0:F + 1] + d[C_OUT:, :, 1:F + 2]
                 ).astype(o_ref.dtype)
            o_ref[0, 0] = jnp.pad(y[:, :, :F + 1],
                                  ((0, 0), (0, 0), (0, 32 - F - 1), (0, 0)))
        elif mode == "matmul":
            a = jnp.concatenate(
                [x_ref[:, :, 0:F + 2, 0:u],
                 x_ref[:, :, 1:F + 3, 0:u],
                 x_ref[:, :, 2:F + 4, 0:u]], axis=0
            ).reshape(3 * C_IN, g * (F + 2) * u)
            d = lax.dot_general(
                w_ref[...], a, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
            ).reshape(2 * C_OUT, g, F + 2, u)
            o_ref[...] = (d[:C_OUT, :, :F] + d[C_OUT:, :, 1:F + 1]
                          ).astype(o_ref.dtype)
        else:
            raise ValueError(mode)

    x_spec = pl.BlockSpec((C_IN, g, 32, u), lambda bb, jj: (0, bb, 0, jj),
                          memory_space=pltpu.VMEM)
    if mode == "nopF32":
        # full-sublane-tile output: F padded 23 -> 32
        o_spec = pl.BlockSpec((C_OUT, g, 32, u),
                              lambda bb, jj: (0, bb, 0, jj),
                              memory_space=pltpu.VMEM)
        o_shape = (C_OUT, batch, 32, t_total)
    elif mode in ("nopblk", "matblk"):
        # step-blocked output: each grid step writes ONE contiguous region
        o_spec = pl.BlockSpec((1, 1, C_OUT, g, 32, u),
                              lambda bb, jj: (bb, jj, 0, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        o_shape = (batch // g, n_tiles, C_OUT, g, 32, u)
    else:
        o_spec = pl.BlockSpec((C_OUT, g, F, u),
                              lambda bb, jj: (0, bb, 0, jj),
                              memory_space=pltpu.VMEM)
        o_shape = (C_OUT, batch, F, t_total)

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kernel,
            grid=(batch // g, n_tiles),
            in_specs=[x_spec, pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct(o_shape, jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x, w)

    return run


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    t_total = 7168  # ~block0 output width, multiple of 1024
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (C_IN, batch, 32, t_total),
                          jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(key, (3 * C_IN, 2 * C_OUT),
                          jnp.float32).astype(jnp.bfloat16)

    flops_tot = 2 * (3 * C_IN) * (2 * C_OUT) * batch * (F + 2) * t_total

    for g, u in ((8, 256), (16, 256), (8, 512), (16, 512), (32, 512),
                 (16, 1024), (32, 1024)):
        if batch % g or t_total % u:
            continue
        steps = (batch // g) * (t_total // u)
        line = f"G={g:3d} u={u:5d} steps={steps:5d}:"
        for mode in ("nop", "nopF32", "nopblk", "matblk"):
            try:
                run = make_runner(mode, batch, t_total, g, u)
                dt = timeit(run, x, w)
                line += f"  {mode}={1e3 * dt:7.1f}ms"
                if mode == "matmul":
                    line += f" ({flops_tot / dt / 1e12:5.1f} TF/s)"
            except Exception as e:
                line += f"  {mode}=FAIL({type(e).__name__})"
        print(line, flush=True)


if __name__ == "__main__":
    main()
