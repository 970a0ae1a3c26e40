"""Ablation of the (since-removed) fused fe+b0-head Pallas kernel.

HISTORICAL ROUND-3 PROBE — the kernel it ablates was deleted after these
measurements; the kernel body lives on as self-contained copies below.
Findings (B=128 bf16, docs/PERF.md round 3): base 25.77 / noselu 21.82 /
nodot 12.79 / u512 23.68 / u2048 25.54 ms; bf16 dot accumulation is
rejected by Mosaic ("matmul acc must be 32-bit").  The conv1 dot's f32
result materialization costs ~13 ms of VMEM traffic per batch — the
same wall that parked tools/fused_stack.py in round 2.

First on-chip run measured the kernel at 26.4 ms/batch (B=128) against a
~6 ms write-bound estimate — the same VMEM-bandwidth wall the round-2
fused_stack kernel hit (f32 conv1 intermediate, docs/PERF.md).  This
probe runs modified copies of the kernel body to attribute the cost:

  base     the full kernel (frontend + conv1 + bn2 + selu)
  noselu   conv1 dot, no selu epilogue (isolate the exp cost)
  bf16dot  conv1 dot with bf16 accumulation + bf16 selu
  nodot    no conv1 at all, z written as x0 broadcast (frontend + write
           floor for this tile/grid shape)
  u512     base kernel at u=512 (halved transients, doubled grid)

Usage (real chip): PROBE_SEL=... python tools/probe_feb0_ablate.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from aasist_tpu.nn import BN_EPS
    from aasist_tpu.ops.fused_frontend import (
        HALO, KSIZE, M_MAX, _pack_traced, _selu)
    from aasist_tpu.registry import build_model
    from aasist_tpu.train.checkpoints import load_weights

    batch, G = 128, 8

    conf = {"architecture": "AASIST", "first_conv": 128,
            "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
            "gat_dims": [64, 32], "pool_ratios": [0.5, 0.7, 0.5, 0.5],
            "temperatures": [2.0, 2.0, 100.0, 100.0]}
    model = build_model(conf)
    params, state = load_weights(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "checkpoints", "AASIST.npz"))
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t)
    params, state = cast(params), cast(state)
    p0, s0 = params["encoder"][0], state["encoder"][0]
    bank = jnp.asarray(model.filterbank, jnp.bfloat16)

    def make_variant(mode: str, u: int = 1024):
        def kernel(xt, w, w1s, sc, out_ref, a_scr, s_scr, *, g, c, co,
                   t_out):
            jj = pl.program_id(1)
            uh = u + 128
            for q in range(3):
                for m in range(M_MAX):
                    a_scr[q * M_MAX + m, :, :] = xt[0, q, :, m:m + uh]
            y = lax.dot_general(w[...], a_scr[...],
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            y = jnp.abs(y)
            yp = jnp.maximum(jnp.maximum(y[0:c], y[c:2 * c]), y[2 * c:])
            f_out = c // 3
            yr = yp[0:3 * f_out].reshape(f_out, 3, g, uh)
            pooled = jnp.maximum(jnp.maximum(yr[:, 0], yr[:, 1]), yr[:, 2])
            x0 = _selu(pooled * sc[0, 0] + sc[0, 1])
            idx = (lax.broadcasted_iota(jnp.int32, (1, 1, uh), 2)
                   + (jj * u - 1))
            x0 = jnp.where((idx >= 0) & (idx < t_out), x0, 0.0)
            x0 = x0.astype(out_ref.dtype)
            fr = f_out + 1
            zp = jnp.pad(x0, ((1, 1), (0, 0), (0, 0)))
            x0_fr = zp[1:fr + 1, :, 1:u + 1]

            if mode == "nodot":
                zz = jnp.broadcast_to(x0_fr[None], (co, fr, g, u))
                out_ref[0:co] = zz.astype(out_ref.dtype)
                out_ref[co] = x0_fr
                return

            for dh in range(2):
                for dw in range(3):
                    s_scr[dh * 3 + dw, :, :] = (
                        zp[dh:dh + fr, :, dw:dw + u].reshape(fr * g, u))
            s_scr[6, :, :] = jnp.ones((fr * g, u), s_scr.dtype)
            acc = (jnp.bfloat16 if mode == "bf16dot" else jnp.float32)
            y1 = lax.dot_general(w1s[...], s_scr[...],
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=acc)
            if mode == "noselu":
                z = y1.astype(out_ref.dtype)
            else:
                z = _selu(y1).astype(out_ref.dtype)
            out_ref[0:co] = z.reshape(co, fr, g, u)
            out_ref[co] = x0_fr

        def run(x):
            b, length = x.shape
            c = bank.shape[0]
            t_out = (length - KSIZE + 1) // 3
            n_tiles = -(-t_out // u)
            t_pad = n_tiles * u
            width = t_pad + 128 + HALO
            xp = jnp.pad(x, ((0, 0), (3, max(0, 3 * width - 3 - length))))
            xp = xp[:, :3 * width]
            xq = jnp.transpose(xp.reshape(b, width, 3), (2, 0, 1))
            xt = jnp.stack([xq[:, :, j * u:j * u + u + 128 + HALO]
                            for j in range(n_tiles)], axis=0)
            w = jnp.asarray(_pack_traced(bank), x.dtype)
            inv = lax.rsqrt(jnp.asarray(
                state["first_bn"]["var"], jnp.float32) + BN_EPS)
            scale = (jnp.asarray(
                params["first_bn"]["weight"], jnp.float32) * inv)[0]
            shift = (jnp.asarray(params["first_bn"]["bias"], jnp.float32)
                     - jnp.asarray(state["first_bn"]["mean"], jnp.float32)
                     * jnp.asarray(params["first_bn"]["weight"],
                                   jnp.float32) * inv)[0]
            sc = jnp.stack([scale, shift]).reshape(1, 2).astype(jnp.float32)
            w1 = jnp.asarray(p0["conv1"]["weight"], jnp.float32)
            co = w1.shape[0]
            b1 = jnp.asarray(p0["conv1"].get("bias", jnp.zeros((co,))),
                             jnp.float32)
            inv2 = lax.rsqrt(jnp.asarray(s0["bn2"]["var"], jnp.float32)
                             + BN_EPS)
            s2 = jnp.asarray(p0["bn2"]["weight"], jnp.float32) * inv2
            t2 = (jnp.asarray(p0["bn2"]["bias"], jnp.float32)
                  - s2 * jnp.asarray(s0["bn2"]["mean"], jnp.float32))
            taps = w1[:, 0].reshape(co, 6) * s2[:, None]
            w1s = jnp.concatenate(
                [taps, (s2 * b1 + t2)[:, None]], axis=1).T.astype(x.dtype)
            fr = c // 3 + 1
            kfn = functools.partial(kernel, g=G, c=c, co=co, t_out=t_out)
            return pl.pallas_call(
                kfn,
                grid=(b // G, n_tiles),
                in_specs=[
                    pl.BlockSpec((1, 3, G, xt.shape[3]),
                                 lambda bb, jj: (jj, 0, bb, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((co + 1, fr, G, u),
                                       lambda bb, jj: (0, 0, bb, jj),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(
                    (co + 1, fr, b, n_tiles * u), x.dtype),
                scratch_shapes=[
                    pltpu.VMEM((3 * M_MAX, G, u + 128), x.dtype),
                    pltpu.VMEM((7, fr * G, u), x.dtype),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=112 * 1024 * 1024),
            )(xt, w, w1s, sc)
        return run

    variants = {
        "base": make_variant("base"),
        "noselu": make_variant("noselu"),
        "bf16dot": make_variant("bf16dot"),
        "nodot": make_variant("nodot"),
        "u512": make_variant("base", u=512),
        "u2048": make_variant("base", u=2048),
    }
    sel = os.environ.get("PROBE_SEL")
    if sel:
        variants = {k: v for k, v in variants.items()
                    if k in sel.split(",")}

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((G, batch, 64600), dtype=np.float32) * 0.3,
        jnp.bfloat16))

    print(f"batch={batch} G={G} bf16", flush=True)
    for name, f in variants.items():
        def chained(xs, f=f):
            def body(c, xi):
                return c, jnp.sum(f(xi).astype(jnp.float32))
            _, out = jax.lax.scan(body, 0, xs)
            return jnp.sum(out)
        try:
            jf = jax.jit(chained)
            t0 = time.perf_counter()
            float(jf(x))
            tc = time.perf_counter() - t0
            float(jf(x))
            n = 4
            t0 = time.perf_counter()
            vals = [jf(x) for _ in range(n)]
            for v in vals:
                float(v)
            dt = (time.perf_counter() - t0) / (n * G)
            print(f"{name:8s} {dt * 1e3:8.2f} ms/batch (compile {tc:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name:8s} FAILED: {str(e)[:180]}", flush=True)


if __name__ == "__main__":
    main()
