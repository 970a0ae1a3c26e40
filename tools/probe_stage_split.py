"""Per-stage timing of the CURRENT best eval config (round 3).

Cumulative-cut stage split at batch 128 + fused Pallas frontend +
b0_chunks=1 + bf16 — the shipped bench configuration (round 2's split
was taken at batch 256 on the plain XLA path, PERF.md).  Methodology:
each cut chains G batches in one jit (scan over independent inputs),
consumes every output with a full-tensor sum, fetches ONE scalar; the
per-stage cost is the difference of successive cuts.

Cuts: fe -> +b0 -> +b1 -> +b2 -> +b3..5 -> full (graph+readout).

Usage (real chip):  python tools/probe_stage_split.py
Env: PROBE_BATCH (128), PROBE_G (8), PROBE_CUTS (comma list to filter).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXED_LEN = 64600


def main():
    import jax
    import jax.numpy as jnp

    from aasist_tpu.models import layers as L
    from aasist_tpu.registry import build_model
    from aasist_tpu.train.checkpoints import load_weights

    batch = int(os.environ.get("PROBE_BATCH", 128))
    G = int(os.environ.get("PROBE_G", 8))

    conf = {
        "architecture": "AASIST",
        "first_conv": 128,
        "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
        "gat_dims": [64, 32],
        "pool_ratios": [0.5, 0.7, 0.5, 0.5],
        "temperatures": [2.0, 2.0, 100.0, 100.0],
        "dtype": "bfloat16",
        "use_fused_frontend": True,
        "b0_chunks": 1 if batch < 256 else 2,
    }
    model = build_model(conf)
    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "checkpoints", "AASIST.npz")
    params, state = load_weights(ckpt)
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t)
    params, state = cast(params), cast(state)

    from aasist_tpu.ops.fused_frontend import fused_frontend

    def frontend(x):
        bank = jnp.asarray(model.filterbank, jnp.bfloat16)
        return fused_frontend(x.astype(jnp.bfloat16), bank,
                              params["first_bn"], state["first_bn"])

    def through_block(x, n_blocks):
        e = frontend(x)
        for i in range(n_blocks):
            e, _ = L.residual_block_apply(
                params["encoder"][i], state["encoder"][i], e,
                first=(i == 0), train=False)
        return e

    def full(x):
        (_, logits), _ = model.apply(params, state, x, train=False)
        return logits.astype(jnp.float32)

    cuts = {
        "fe": lambda x: frontend(x),
        "fe+b0": lambda x: through_block(x, 1),
        "fe+b0+b1": lambda x: through_block(x, 2),
        "fe+b0..b2": lambda x: through_block(x, 3),
        "fe+b0..b5": lambda x: through_block(x, 6),
        "full": full,
    }
    sel = os.environ.get("PROBE_CUTS")
    if sel:
        cuts = {k: v for k, v in cuts.items() if k in sel.split(",")}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((G, batch, FIXED_LEN)).astype(np.float32)
    x = jax.device_put(x)

    print(f"batch={batch} G={G} (fused fe, bf16, chunks="
          f"{conf['b0_chunks']})")
    results = {}
    for name, f in cuts.items():
        def chained(xs, f=f):
            def body(c, xi):
                return c, jnp.sum(f(xi).astype(jnp.float32))
            _, out = jax.lax.scan(body, 0, xs)
            return jnp.sum(out)
        try:
            jf = jax.jit(chained)
            t0 = time.perf_counter()
            float(jf(x))
            t_compile = time.perf_counter() - t0
            float(jf(x))
            n = max(3, int(4096 / (G * batch)))
            t0 = time.perf_counter()
            vals = [jf(x) for _ in range(n)]
            for v in vals:
                float(v)
            dt = (time.perf_counter() - t0) / (n * G)
            results[name] = dt * 1e3
            print(f"{name:12s}  {dt * 1e3:7.2f} ms/batch   "
                  f"(compile {t_compile:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name:12s}  FAILED: {str(e)[:160]}", flush=True)

    names = list(results)
    for a, b in zip(names, names[1:]):
        print(f"stage {b:12s} - {a:12s} = "
              f"{results[b] - results[a]:7.2f} ms")


if __name__ == "__main__":
    main()
