"""Probe: cross-batch overlap inside the jitted eval chain (round 3).

Hypothesis: the G-batch chain (bench.py, produce_scores eval_chain) is a
``lax.scan``, which executes iterations strictly sequentially — so batch
k+1's HBM traffic (conv temporaries) never overlaps batch k's MXU
compute.  The forward is ~half compute / ~half memory at batch 128
(docs/PERF.md round-2 accounting), so letting XLA's latency-hiding
scheduler interleave TWO iterations could recover real time.

Variants measured (same methodology as tools/probe_calibration.py:
chain-in-one-jit, full-tensor consumption, ONE scalar fetch):
  scan_u1   lax.scan, unroll=1 (the shipped configuration)
  scan_u2   lax.scan, unroll=2
  scan_u4   lax.scan, unroll=4
  pair      scan over G/2 steps, each step runs TWO independent
            half-batch forwards back to back (explicit scheduler freedom
            at half the working-set size)

Env: PROBE_BATCH (128), PROBE_G (16), PROBE_FUSED (1), PROBE_VARIANTS.

Usage (real chip):
    python tools/probe_overlap.py
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

    from aasist_tpu.registry import build_model
    from aasist_tpu.train.checkpoints import load_weights

    batch = int(os.environ.get("PROBE_BATCH", 128))
    G = int(os.environ.get("PROBE_G", 16))
    fused = os.environ.get("PROBE_FUSED", "1") != "0"

    conf = {
        "architecture": "AASIST",
        "first_conv": 128,
        "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
        "gat_dims": [64, 32],
        "pool_ratios": [0.5, 0.7, 0.5, 0.5],
        "temperatures": [2.0, 2.0, 100.0, 100.0],
        "dtype": "bfloat16",
    }
    if fused:
        conf["use_fused_frontend"] = True
        conf["b0_chunks"] = 1 if batch < 256 else 2
    model = build_model(conf)

    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "checkpoints", "AASIST.npz")
    params, state = load_weights(ckpt)
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t)
    params, state = cast(params), cast(state)

    def fwd_one(p, s, x):
        (_, logits), _ = model.apply(p, s, x, train=False)
        return logits.astype(jnp.float32)

    def make_scan(unroll):
        def f(p, s, xs):                      # xs: (G, B, L)
            def body(c, x):
                return c, fwd_one(p, s, x)
            _, out = jax.lax.scan(body, 0, xs, unroll=unroll)
            return jnp.sum(out)
        return f

    def pair(p, s, xs):                       # xs: (G, B, L) -> pairs
        h = batch // 2
        xs2 = xs.reshape(G // 2, 2, 2, h, FIXED_LEN)  # (G/2, 2seq, 2par,...)

        def body(c, x4):
            # two independent half-batch forwards per sequence step, twice
            outs = [fwd_one(p, s, x4[i, j]) for i in range(2)
                    for j in range(2)]
            return c, sum(jnp.sum(o) for o in outs)
        _, out = jax.lax.scan(body, 0, xs2)
        return jnp.sum(out)

    variants = {
        "scan_u1": make_scan(1),
        "scan_u2": make_scan(2),
        "scan_u4": make_scan(4),
        "pair": pair,
    }
    sel = os.environ.get("PROBE_VARIANTS")
    if sel:
        variants = {k: v for k, v in variants.items()
                    if k in sel.split(",")}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((G, batch, FIXED_LEN)).astype(np.float32)
    x = jax.device_put(x)

    print(f"batch={batch} G={G} fused={fused}")
    for name, f in variants.items():
        try:
            jf = jax.jit(f)
            t0 = time.perf_counter()
            float(jf(params, state, x))
            t_compile = time.perf_counter() - t0
            float(jf(params, state, x))      # warm
            n = max(2, int(6144 / (G * batch)))
            t0 = time.perf_counter()
            import collections
            pend = collections.deque()
            for _ in range(n):
                pend.append(jf(params, state, x))
                if len(pend) > 2:
                    float(pend.popleft())
            while pend:
                float(pend.popleft())
            dt = time.perf_counter() - t0
            rate = G * batch * n / dt
            print(f"{name:10s}  {rate:8.1f} utt/s   "
                  f"({dt / n * 1e3:7.1f} ms/call, compile {t_compile:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name:10s}  FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
