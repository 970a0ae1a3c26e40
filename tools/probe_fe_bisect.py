"""Bisect: fused_frontend + k XLA encoder blocks — find what breaks the
remote Mosaic compile when the kernel is embedded in the full model.

Usage: python tools/probe_fe_bisect.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from aasist_tpu.models import layers as L  # noqa: E402
from aasist_tpu.ops.fused_frontend import fused_frontend  # noqa: E402
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


def main():
    model = build_model(CONF)
    params, state = model.init(jax.random.PRNGKey(0))
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t)
    params, state = cast(params), cast(state)
    x = jax.device_put(jnp.zeros((256, 64600), jnp.float32))
    bank = jnp.asarray(model.filterbank, jnp.bfloat16)

    for k in range(7):
        def f(p, s, xx, k=k):
            h = fused_frontend(xx.astype(jnp.bfloat16), bank,
                               p["first_bn"], s["first_bn"])
            for i in range(k):
                h, _ = L.residual_block_apply(
                    p["encoder"][i], s["encoder"][i], h,
                    first=(i == 0), train=False)
            return jnp.sum(h.astype(jnp.float32))

        try:
            v = float(jax.jit(f)(params, state, x))
            print(f"k={k}: OK ({v:.3e})", flush=True)
        except Exception as e:
            print(f"k={k}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            break

    # full model flag path for completeness
    conf2 = dict(CONF)
    conf2["use_fused_frontend"] = True
    m2 = build_model(conf2)

    def g(p, s, xx):
        (_, logits), _ = m2.apply(p, s, xx, train=False)
        return jnp.sum(logits.astype(jnp.float32))

    try:
        v = float(jax.jit(g)(params, state, x))
        print(f"full: OK ({v:.3e})", flush=True)
    except Exception as e:
        print(f"full: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
