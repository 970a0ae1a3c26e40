"""Find a fused_frontend formulation that coexists with XLA convs.

Variants (each = fused frontend + 1 encoder block + sum):
  barrier   v1 kernel + lax.optimization_barrier before the conv
  v2bm      per-g-dot kernel emitting batch-major (B-blocks, 24, U)
            directly -> no XLA transpose between kernel and conv
  v2bm_t    v2bm timed chained (K=1 vs 5) if it compiles

Usage: python tools/probe_fe_fix.py
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

sys.path.insert(0, "/root/repo")
from aasist_tpu.models import layers as L  # noqa: E402
from aasist_tpu.nn import BN_EPS  # noqa: E402
from aasist_tpu.ops import fused_frontend as FF  # noqa: E402
from aasist_tpu.registry import build_model  # noqa: E402

KSIZE, M_MAX, HALO = FF.KSIZE, FF.M_MAX, FF.HALO

CONF = {
    "architecture": "AASIST",
    "first_conv": 128,
    "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
    "gat_dims": [64, 32],
    "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
    "dtype": "bfloat16",
}


def kernel_v2bm(xt, w, sc, out_ref, a_scr, *, g, u, c):
    """Per-g 2D dots; batch-major output block (g, 24, U)."""
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
        out_ref[gg, :, :] = jnp.pad(z, ((0, 24 - f_out), (0, 0)))


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def run_v2bm(xt, w, sc, g, u, c):
    n_tiles, b = xt.shape[0], xt.shape[2]
    kernel = functools.partial(kernel_v2bm, g=g, u=u, c=c)
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
        out_specs=pl.BlockSpec((g, 24, u), lambda bb, jj: (bb, 0, jj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 24, xt.shape[0] * u), xt.dtype),
        scratch_shapes=[pltpu.VMEM((g, 3 * M_MAX, u), xt.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xt, w, sc)


def fe_v2bm(x, bank, bn_p, bn_s, g=8, u=2048):
    b, length = x.shape
    c = bank.shape[0]
    t_out = (length - KSIZE + 1) // 3
    while u > 128 and u > t_out:
        u //= 2
    n_tiles = -(-t_out // u)
    t_pad = n_tiles * u
    g = min(g, b)
    while b % g:
        g -= 1
    total = 3 * (t_pad + HALO)
    xp = jnp.pad(x, ((0, 0), (0, max(0, total - length))))[:, :total]
    xq = jnp.transpose(xp.reshape(b, t_pad + HALO, 3), (2, 0, 1))
    xt = jnp.stack([xq[:, :, j * u:j * u + u + HALO]
                    for j in range(n_tiles)], axis=0)
    w = jnp.asarray(FF._pack_traced(bank), x.dtype)
    inv = lax.rsqrt(jnp.asarray(bn_s["var"], jnp.float32) + BN_EPS)
    scale = (jnp.asarray(bn_p["weight"], jnp.float32) * inv)[0]
    shift = (jnp.asarray(bn_p["bias"], jnp.float32)
             - jnp.asarray(bn_s["mean"], jnp.float32)
             * jnp.asarray(bn_p["weight"], jnp.float32) * inv)[0]
    sc = jnp.stack([scale, shift]).reshape(1, 2).astype(jnp.float32)
    out = run_v2bm(xt, w, sc, g, u, c)          # (B, 24, t_pad)
    return out[:, None, :23, :t_out]


def main():
    model = build_model(CONF)
    params, state = model.init(jax.random.PRNGKey(0))
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t)
    params, state = cast(params), cast(state)
    x = jax.device_put(jnp.zeros((256, 64600), jnp.float32))
    bank = jnp.asarray(model.filterbank, jnp.bfloat16)

    def block1(p, s, h):
        h, _ = L.residual_block_apply(p["encoder"][0], s["encoder"][0], h,
                                      first=True, train=False)
        return jnp.sum(h.astype(jnp.float32))

    def f_barrier(p, s, xx):
        h = FF.fused_frontend(xx.astype(jnp.bfloat16), bank,
                              p["first_bn"], s["first_bn"])
        h = lax.optimization_barrier(h)
        return block1(p, s, h)

    def f_v2bm(p, s, xx):
        h = fe_v2bm(xx.astype(jnp.bfloat16), bank,
                    p["first_bn"], s["first_bn"])
        return block1(p, s, h)

    for name, f in [("barrier", f_barrier), ("v2bm", f_v2bm)]:
        try:
            v = float(jax.jit(f)(params, state, x))
            print(f"{name:8s}: OK ({v:.3e})", flush=True)
        except Exception as e:
            print(f"{name:8s}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    # numerics of v2bm vs XLA reference
    import numpy as np
    from aasist_tpu import nn
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((8, 64600)), jnp.float32)

    def xla_fe(p, s, xx):
        h = L.sinc_frontend(bank, xx.astype(jnp.bfloat16))
        h = jnp.abs(h)[:, None]
        h = nn.max_pool(h, (3, 3))
        h, _ = nn.batch_norm(p["first_bn"], s["first_bn"], h, axis=1,
                             train=False)
        return jax.nn.selu(h)

    try:
        a = np.asarray(jax.jit(xla_fe)(params, state, xs), np.float32)
        b = np.asarray(jax.jit(
            lambda p, s, xx: fe_v2bm(xx.astype(jnp.bfloat16), bank,
                                     p["first_bn"], s["first_bn"])
        )(params, state, xs), np.float32)
        print(f"v2bm err: {np.max(np.abs(a - b)):.3e}", flush=True)
    except Exception as e:
        print(f"v2bm err: FAIL {str(e)[:160]}", flush=True)

    # chained timing of v2bm standalone
    def chain(k):
        def fn(p, s, xx):
            def body(c, _):
                h = fe_v2bm((xx + c).astype(jnp.bfloat16), bank,
                            p["first_bn"], s["first_bn"])
                return jnp.max(h.astype(jnp.float32)) * 1e-20, ()
            c, _ = lax.scan(body, jnp.float32(0.0), None, length=k)
            return c
        return jax.jit(fn)

    try:
        f1, f5 = chain(1), chain(5)
        float(f1(params, state, x)); float(f5(params, state, x))
        ts = []
        for f in (f1, f5):
            t0 = time.perf_counter()
            for _ in range(4):
                float(f(params, state, x))
            ts.append((time.perf_counter() - t0) / 4)
        print(f"v2bm chained: {1e3 * (ts[1] - ts[0]) / 4:.2f} ms/op",
              flush=True)
    except Exception as e:
        print(f"v2bm chained: FAIL {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
