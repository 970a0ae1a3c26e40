"""Isolate fused_frontend cost components on the TPU.

Variants:
  glue      — host-side phase-split/tile build only (no kernel)
  v1        — current kernel: a_scr (K, G, U), dot contracts outer dim
  v2        — per-g 2D dots: a_scr (G, K, U), contraction on sublanes
  v2_u4096  — v2 with U=4096
  v2_g16    — v2 with G=16

Each timed with pipelined dispatch + in-jit scalar reduction.
Usage: python tools/probe_frontend_variants.py [B] [variants...]
"""

from __future__ import annotations

import collections
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
from aasist_tpu.ops import fused_frontend as FF  # noqa: E402

KSIZE, M_MAX, HALO = FF.KSIZE, FF.M_MAX, FF.HALO


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


def make_xt(x, u):
    b, length = x.shape
    t_out = (length - KSIZE + 1) // 3
    n_tiles = -(-t_out // u)
    t_pad = n_tiles * u
    total = 3 * (t_pad + HALO)
    xp = jnp.pad(x, ((0, 0), (0, max(0, total - length))))[:, :total]
    xq = jnp.transpose(xp.reshape(b, t_pad + HALO, 3), (2, 0, 1))
    xt = jnp.stack([xq[:, :, j * u:j * u + u + HALO]
                    for j in range(n_tiles)], axis=0)
    return xt, t_out


def kernel_v2(xt, w, sc, out_ref, a_scr, *, g, u, c):
    """a_scr (G, 3*M_MAX, U): contraction dim on sublanes; per-g 2D dots."""
    for q in range(3):
        for m in range(M_MAX):
            a_scr[:, q * M_MAX + m, :] = xt[0, q, :, m:m + u]
    f_out = c // 3
    for gg in range(g):
        y = lax.dot_general(w[...], a_scr[gg], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        y = jnp.abs(y)
        yp = jnp.maximum(jnp.maximum(y[0:c], y[c:2 * c]), y[2 * c:3 * c])
        yr = yp[0:3 * f_out].reshape(f_out, 3, u)
        pooled = jnp.maximum(jnp.maximum(yr[:, 0], yr[:, 1]), yr[:, 2])
        z = pooled * sc[0, 0] + sc[0, 1]
        z = FF._selu(z).astype(out_ref.dtype)
        out_ref[:, gg, :] = jnp.pad(z, ((0, 24 - f_out), (0, 0)))


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def run_v2(xt, w, sc, g, u, c):
    n_tiles, b = xt.shape[0], xt.shape[2]
    kernel = functools.partial(kernel_v2, g=g, u=u, c=c)
    return pl.pallas_call(
        kernel,
        grid=(b // g, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 3, g, xt.shape[3]),
                         lambda bb, jj: (jj, 0, bb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((24, g, u), lambda bb, jj: (0, bb, jj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((24, b, xt.shape[0] * u), xt.dtype),
        scratch_shapes=[pltpu.VMEM((g, 3 * M_MAX, u), xt.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xt, w, sc)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    which = sys.argv[2:] or ["glue", "v1", "v2", "v2_u4096", "v2_g16"]
    bank = jnp.asarray(sinc_filterbank(70, 129, 16000), jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.standard_normal((B, 64600)).astype(np.float32)
    ).astype(jnp.bfloat16)
    w = jnp.asarray(FF.pack_filterbank(np.asarray(bank, np.float32)),
                    jnp.bfloat16)
    sc = jnp.asarray([[1.0, 0.1]], jnp.float32)
    c = 70

    ref = None
    for name in which:
        try:
            if name == "glue":
                f = jax.jit(lambda xx: jnp.sum(
                    make_xt(xx, 2048)[0].astype(jnp.float32)))
                dt = ptime(f, x)
            elif name == "v1":
                f = jax.jit(lambda xx: jnp.sum(
                    FF.fused_frontend(xx, bank,
                                      {"weight": jnp.ones((1,)),
                                       "bias": jnp.zeros((1,))},
                                      {"mean": jnp.zeros((1,)),
                                       "var": jnp.ones((1,))}
                                      ).astype(jnp.float32)))
                dt = ptime(f, x)
            else:
                u = 4096 if "u4096" in name else 2048
                g = 16 if "g16" in name else 8
                def f2(xx, u=u, g=g):
                    xt, t_out = make_xt(xx, u)
                    out = run_v2(xt, w, sc, g, u, c)
                    return jnp.sum(out[:23, :, :t_out].astype(jnp.float32))
                f = jax.jit(f2)
                dt = ptime(f, x)
                if ref is None and B <= 64:
                    pass
            print(f"{name:10s}: {1e3 * dt:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:10s}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
