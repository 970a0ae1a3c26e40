"""Full-model throughput A/B for kernel flags on the real TPU.

Times the flagship AASIST bf16 forward at a given batch with each flag
combination, pipelined dispatch + in-jit reduction (pure device time).

Usage: python tools/bench_variants.py [B] [flags...]
  flags: comma-separated config overrides per variant, e.g.
    python tools/bench_variants.py 256 none use_fused_frontend
  (round 5 retired use_aug_blocks/use_bn_fold/use_poly_blocks from the
  product model — those now raise at build; see tools/eval_variants.py)
"""

from __future__ import annotations

import collections
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from aasist_tpu.registry import build_model  # noqa: E402

BASE = {
    "architecture": "AASIST",
    "first_conv": 128,
    "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
    "gat_dims": [64, 32],
    "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
    "dtype": "bfloat16",
}


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


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    variants = sys.argv[2:] or ["none", "use_fused_frontend"]
    x = jax.device_put(jax.random.normal(
        jax.random.PRNGKey(1), (B, 64600), jnp.float32))
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t)

    results = {}
    for var in variants:
        conf = dict(BASE)
        if var != "none":
            for f in var.split(","):
                f = f.strip()
                if "=" in f:
                    k, v = f.split("=")
                    conf[k] = int(v)
                else:
                    conf[f] = True
        model = build_model(conf)
        params, state = model.init(jax.random.PRNGKey(0))
        params, state = cast(params), cast(state)

        def fwd(p, s, xx):
            (_, logits), _ = model.apply(p, s, xx, train=False)
            return jnp.sum(logits.astype(jnp.float32))

        jf = jax.jit(fwd)
        try:
            dt = ptime(jf, params, state, x)
            results[var] = dt
            print(f"{var:50s}: {1e3 * dt:7.1f} ms  "
                  f"{B / dt:8.1f} utt/s/chip", flush=True)
        except Exception as e:
            print(f"{var:50s}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    if "none" in results:
        base = results["none"]
        for k, v in results.items():
            if k != "none":
                print(f"speedup {k}: {base / v:.3f}x", flush=True)


if __name__ == "__main__":
    main()
