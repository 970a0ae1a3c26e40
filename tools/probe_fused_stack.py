"""Device probe: fused frontend+block0 stack — compile, numerics, speed.

Usage: python tools/probe_fused_stack.py [B]
"""

from __future__ import annotations

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
sys.path.insert(0, "/root/repo/tools")
import fused_stack as FS  # noqa: E402
from aasist_tpu.registry import build_model  # noqa: E402

CONF = {
    "architecture": "AASIST",
    "first_conv": 128,
    "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
    "gat_dims": [64, 32],
    "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
    "dtype": "bfloat16",
}


def timed(fn, *args, iters=6):
    f = jax.jit(fn)
    float(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    model = build_model(CONF)
    params, state = model.init(jax.random.PRNGKey(0))
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t)
    pc, sc = cast(params), cast(state)
    bank = sinc_filterbank(70, 129, 16000).astype(np.float32)
    bankj = jnp.asarray(bank, jnp.bfloat16)

    tonp = lambda t: jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32), t)
    fsp = FS.FusedStackParams(bank, tonp(params["first_bn"]),
                              tonp(state["first_bn"]),
                              tonp(params["encoder"][0]),
                              tonp(state["encoder"][0]))

    rng = np.random.default_rng(0)
    xs = jax.device_put(rng.standard_normal((8, 64600)).astype(np.float32))

    def xla_chain(p, s, xx):
        h = L.sinc_frontend(bankj, xx.astype(jnp.bfloat16))
        h = jnp.abs(h)[:, None]
        h = nn.max_pool(h, (3, 3))
        h, _ = nn.batch_norm(p["first_bn"], s["first_bn"], h, axis=1,
                             train=False)
        h = jax.nn.selu(h)
        out, _ = L.residual_block_apply(p["encoder"][0], s["encoder"][0],
                                        h, first=True, train=False)
        return out

    def fused(xx):
        return FS.fused_frontend_block0(xx.astype(jnp.bfloat16), fsp)

    # numerics
    try:
        got = np.asarray(jax.jit(fused)(xs), np.float32)
    except Exception as e:
        print(f"COMPILE FAIL: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return 1
    ref = np.asarray(jax.jit(xla_chain)(pc, sc, xs), np.float32)
    err = np.max(np.abs(got - ref))
    scale = np.max(np.abs(ref))
    print(f"shapes {got.shape} vs {ref.shape}; max err {err:.3e} "
          f"(rel {err / scale:.3e})", flush=True)

    # chained timing
    x = jax.device_put(rng.standard_normal((B, 64600)).astype(np.float32))

    def chain(op, k):
        def fn(xx):
            def body(c, _):
                y = op(xx + c.astype(xx.dtype))
                return jnp.max(y.astype(jnp.float32)) * 1e-20, ()
            c, _ = lax.scan(body, jnp.float32(0.0), None, length=k)
            return c
        return fn

    g_b0 = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    def fe_only(xx):
        h = xx.astype(jnp.bfloat16)
        b, length = h.shape
        t1 = length - FS.KSIZE + 1
        t_z = t1 // 3
        v_z = -(-t_z // 3)
        u = 512
        nt = -(-v_z // u)
        vtot = nt * u + FS.H9
        xp = jnp.pad(h, ((0, 0), (0, max(0, 9 * vtot - length))))
        xq = jnp.transpose(xp[:, :9 * vtot].reshape(b, vtot, 9), (2, 0, 1))
        xt = jnp.stack([xq[:, :, j * u:j * u + u + FS.H9]
                        for j in range(nt)], axis=0)
        return FS._fe_run(xt, fsp.w_fe, fsp.sc_fe, 8, u, 70, t_z)

    def fused_g(xx):
        return FS.fused_frontend_block0(xx.astype(jnp.bfloat16), fsp,
                                        g_b0=g_b0)

    for name, op in [("fe-only ", fe_only),
                     (f"fused g{g_b0}", fused_g),
                     ("xla     ", lambda xx: xla_chain(pc, sc, xx))]:
        try:
            t1 = timed(chain(op, 1), x)
            t2 = timed(chain(op, 5), x)
            per = (t2 - t1) / 4
            print(f"{name} fe+b0 B={B}: {1e3 * per:7.2f} ms/op",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
