"""Ablate the block0 kernel stage by stage to find the 110 us/step cost.

Stages (cumulative): dma < fill < conv1 < epi < conv2 < full
Each variant consumes everything it computes (full-tensor sums into the
output) so Mosaic cannot slice work away.

Usage: python tools/probe_b0_ablate.py [stage ...]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from aasist_tpu.models.layers import sinc_filterbank  # noqa: E402
sys.path.insert(0, "/root/repo/tools")
import fused_stack as FS  # noqa: E402
from aasist_tpu.registry import build_model  # noqa: E402

STAGES = ["dma", "fill", "conv1", "epi", "conv2", "full"]  # conv2 = dense only


def _kernel(zt, w1, sb1, w0, wm1, wp1, b2, out_ref, a1_scr, a20_scr,
            a21_scr, am10_scr, am11_scr, ap10_scr, ap11_scr, ds_scr,
            s_scr, *, g, u, c, t_z, stage):
    lvl = STAGES.index(stage)
    uy = a1_scr.shape[3]

    if lvl == 0:                      # dma only
        for gg in range(g):
            out_ref[gg] = jnp.pad(
                zt[0, gg, 0:23, 0:u][None], ((0, c - 1), (0, 0), (0, 0))
            ).astype(out_ref.dtype)
        return

    if uy > u + 2:
        a1_scr[:, :, :, u + 2:uy] = jnp.zeros(
            (18, g, 32, uy - u - 2), a1_scr.dtype)
    for jz in range(3):
        for mzp in range(3):
            for df in range(2):
                row = (jz * 3 + mzp) * 2 + df
                a1_scr[row, :, :, 0:u + 2] = \
                    zt[0, :, jz * 32 + df:jz * 32 + df + 32,
                       mzp:mzp + u + 2]

    if lvl == 1:                      # + fill
        acc = jnp.sum(a1_scr[...].astype(jnp.float32), axis=0)
        for gg in range(g):
            out_ref[gg] = jnp.pad(
                acc[gg, 0:23, 0:u][None], ((0, c - 1), (0, 0), (0, 0))
            ).astype(out_ref.dtype)
        return

    y = lax.dot_general(w1[...], a1_scr[...], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    y = y + sb1[...]

    if lvl == 2:                      # + conv1 dot
        yy = jnp.sum(y.reshape(6, c, g, 32, uy), axis=0)
        for gg in range(g):
            out_ref[gg] = yy[:, gg, 0:23, 0:u].astype(out_ref.dtype)
        return

    j_tile = pl.program_id(1)
    col = lax.broadcasted_iota(jnp.int32, (1, 1, 1, uy), 3)
    jy = lax.broadcasted_iota(jnp.int32, (3, 1, 1, 1), 0)
    uu = j_tile * u - 1 + col
    valid = ((uu >= 0) & (3 * uu + jy < t_z) & (col < u + 2))
    y1 = FS._selu(y[:3 * c].reshape(3, c, g, 32, uy))
    y1 = y1 * valid[:, None].astype(y1.dtype)
    y1 = y1.reshape(3 * c, g, 32, uy).astype(a20_scr.dtype)
    a20_scr[...] = y1[:, :, 0:24, 1:1 + u]
    a21_scr[...] = y1[:, :, 1:25, 1:1 + u]
    am10_scr[...] = y1[2 * c:3 * c, :, 0:24, 0:u]
    am11_scr[...] = y1[2 * c:3 * c, :, 1:25, 0:u]
    ap10_scr[...] = y1[0:c, :, 0:24, 2:2 + u]
    ap11_scr[...] = y1[0:c, :, 1:25, 2:2 + u]
    ds_scr[...] = y[3 * c:, :, 0:24, 1:1 + u].astype(ds_scr.dtype)

    if lvl == 3:                      # + epilogue/scratch fills
        acc = (a20_scr[0:c].astype(jnp.float32)
               + a21_scr[0:c].astype(jnp.float32)
               + am10_scr[...].astype(jnp.float32)
               + ap11_scr[...].astype(jnp.float32)
               + ds_scr[0:c].astype(jnp.float32))
        for gg in range(g):
            out_ref[gg] = acc[:, gg, 0:23, :].astype(out_ref.dtype)
        return

    part0 = lax.dot_general(w0[0], a20_scr[...], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    part1 = lax.dot_general(w0[1], a21_scr[...], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s_scr[...] = part0 + part1
    if lvl >= 5:                      # full: small dots too
        pm = (lax.dot_general(wm1[0], am10_scr[...],
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
              + lax.dot_general(wm1[1], am11_scr[...],
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32))
        s_scr[0:c] = s_scr[0:c] + pm
        pp = (lax.dot_general(wp1[0], ap10_scr[...],
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
              + lax.dot_general(wp1[1], ap11_scr[...],
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32))
        s_scr[2 * c:3 * c] = s_scr[2 * c:3 * c] + pp

    m = None
    for r in range(3):
        term = (s_scr[r * c:(r + 1) * c]
                + ds_scr[r * c:(r + 1) * c].astype(jnp.float32))
        m = term if m is None else jnp.maximum(m, term)
    pooled = m + b2[0:c]

    for gg in range(g):
        out_ref[gg] = pooled[:, gg, 0:23, :].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11))
def run(zt, w1, sb1, w0, wm1, wp1, b2, g, u, c, t_z, stage):
    n_tiles, b = zt.shape[0], zt.shape[1]
    uy = u + 2 + (-(u + 2) % 128)
    kernel = functools.partial(_kernel, g=g, u=u, c=c, t_z=t_z,
                               stage=stage)
    return pl.pallas_call(
        kernel,
        grid=(b // g, n_tiles),
        in_specs=[pl.BlockSpec((1, g, 104, zt.shape[3]),
                               lambda bb, jj: (jj, bb, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((g, c, 23, u),
                               lambda bb, jj: (bb, 0, 0, jj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, 23, n_tiles * u), zt.dtype),
        scratch_shapes=[
            pltpu.VMEM((18, g, 32, uy), zt.dtype),
            pltpu.VMEM((3 * c, g, 24, u), zt.dtype),
            pltpu.VMEM((3 * c, g, 24, u), zt.dtype),
            pltpu.VMEM((c, g, 24, u), zt.dtype),
            pltpu.VMEM((c, g, 24, u), zt.dtype),
            pltpu.VMEM((c, g, 24, u), zt.dtype),
            pltpu.VMEM((c, g, 24, u), zt.dtype),
            pltpu.VMEM((3 * c, g, 24, u), zt.dtype),
            pltpu.VMEM((3 * c, g, 24, u), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(zt, w1, sb1, w0, wm1, wp1, b2)


def main():
    stages = sys.argv[1:] or STAGES
    model = build_model({
        "architecture": "AASIST", "first_conv": 128,
        "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
        "gat_dims": [64, 32], "pool_ratios": [0.5, 0.7, 0.5, 0.5],
        "temperatures": [2.0, 2.0, 100.0, 100.0], "dtype": "bfloat16"})
    params, state = model.init(jax.random.PRNGKey(0))
    bank = sinc_filterbank(70, 129, 16000).astype(np.float32)
    tonp = lambda t: jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32), t)
    fsp = FS.FusedStackParams(bank, tonp(params["first_bn"]),
                              tonp(state["first_bn"]),
                              tonp(params["encoder"][0]),
                              tonp(state["encoder"][0]))
    B, u, g, c = 256, 512, 1, 32
    t_z = (64600 - 129 + 1) // 3
    t_out = t_z // 3
    nt2 = -(-t_out // u)
    rng = np.random.default_rng(0)
    zt = jax.device_put(rng.standard_normal(
        (nt2, B, 104, u + 4)).astype(np.float32)).astype(jnp.bfloat16)

    for stage in stages:
        def op(z, c_, stage=stage):
            return run(z + c_.astype(z.dtype), fsp.w1, fsp.sb1, fsp.w0,
                       fsp.wm1, fsp.wp1, fsp.b2, g, u, c, t_z, stage)

        def chain(k, op=op):
            def fn(z):
                def body(cc, _):
                    y = op(z, cc)
                    return jnp.max(y.astype(jnp.float32)) * 1e-20, ()
                cc, _ = lax.scan(body, jnp.float32(0.0), None, length=k)
                return cc
            return jax.jit(fn)

        try:
            f1, f5 = chain(1), chain(5)
            float(f1(zt)); float(f5(zt))
            t1s, t5s = [], []
            for _ in range(5):
                t0 = time.perf_counter(); float(f1(zt))
                t1s.append(time.perf_counter() - t0)
            for _ in range(5):
                t0 = time.perf_counter(); float(f5(zt))
                t5s.append(time.perf_counter() - t0)
            per = (min(t5s) - min(t1s)) / 4
            print(f"{stage:6s}: {1e3 * per:7.1f} ms", flush=True)
        except Exception as e:
            print(f"{stage:6s}: FAIL {type(e).__name__}: {str(e)[:140]}",
                  flush=True)


if __name__ == "__main__":
    main()
