"""Locate the training-step cost on device (VERDICT round-2 item #3).

Times, with chained in-jit repetition (RPC-floor-proof):
  fwd          forward loss only (train=True semantics, B=24)
  grad-full    full value_and_grad step
  grad-sgk     value_and_grad with stop_gradient inserted after encoder
               block k (k = 0, 2, 4, 6) — the deltas localise which
               block's backward dominates
  grad-bf16    full grad with bf16 compute

Usage: python tools/probe_train_stages.py [B]
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
from aasist_tpu.registry import build_model  # noqa: E402

CONF = {
    "architecture": "AASIST",
    "first_conv": 128,
    "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
    "gat_dims": [64, 32],
    "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
}


def timed(fn, *args, iters=4):
    # reduce to ONE scalar inside the jit: fetching/blocking on a pytree
    # of ~200 grad arrays costs ~27 ms of tunnel RPC per array
    def scalar_fn(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    f = jax.jit(scalar_fn)
    float(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    model = build_model(dict(CONF))
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((B, 64600)).astype(np.float32))
    yl = jax.device_put((np.arange(B) % 2).astype(np.int32))
    key = jax.random.PRNGKey(1)

    def loss_fn(p, sg_depth=None):
        # replicate the model's train forward but with optional
        # stop_gradient after encoder block sg_depth
        h = x.astype(jnp.float32)
        bank = jnp.asarray(model.filterbank, jnp.float32)
        h = L.sinc_frontend(bank, h)
        h = jnp.abs(h)[:, None]
        h = nn.max_pool(h, (3, 3))
        h, _ = nn.batch_norm(p["first_bn"], state["first_bn"], h, axis=1,
                             train=True)
        h = jax.nn.selu(h)
        for i, bp in enumerate(p["encoder"]):
            h, _ = L.residual_block_apply(bp, state["encoder"][i], h,
                                          first=(i == 0), train=True)
            if sg_depth is not None and i == sg_depth:
                h = lax.stop_gradient(h)
        # cheap head: mean-pool + linear-ish readout so the encoder
        # backward dominates the measurement
        feat = jnp.mean(h, axis=(2, 3))
        logits = feat @ jnp.ones((feat.shape[1], 2), h.dtype)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(logp[jnp.arange(B), yl])

    t = timed(lambda p: loss_fn(p), params)
    print(f"fwd       B={B}: {1e3 * t:7.1f} ms", flush=True)

    t = timed(lambda p: jax.grad(loss_fn)(p), params)
    print(f"grad-full B={B}: {1e3 * t:7.1f} ms", flush=True)

    for k in (0, 2, 4):
        t = timed(lambda p, k=k: jax.grad(
            lambda q: loss_fn(q, sg_depth=k))(p), params)
        print(f"grad-sg{k}  B={B}: {1e3 * t:7.1f} ms "
              f"(blocks 0..{k} fwd-only)", flush=True)


if __name__ == "__main__":
    main()
