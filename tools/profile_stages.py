"""Clean per-stage TPU timing for the AASIST forward (pretrained geometry).

Methodology matters on the tunneled axon backend: an eager ``jnp.sum`` +
scalar fetch per iteration adds TWO ~27 ms RPC round trips, which round-1
probes partially misattributed to kernel cost ("per-grid-step overhead").
Here every timed function jits the scalar reduction INSIDE the call and
dispatch is pipelined 3 deep, so steady-state per-call time is pure device
time (RPC latency hidden, as in bench.py / produce_scores).

Reports cumulative cuts of the forward (frontend, +block0..5, +graph) and
standalone block timings, bf16, batch from argv (default 256).

Usage: python tools/profile_stages.py [B]
"""

from __future__ import annotations

import collections
import sys
import time

import jax
import jax.numpy as jnp

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
    "dtype": "bfloat16",
}


def ptime(fn, *args, iters=10, depth=3):
    """Steady-state per-call seconds with pipelined dispatch; fn must
    return a scalar (reduction inside the jit)."""
    for _ in range(2):
        float(fn(*args))                      # compile + warm
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
    model = build_model(CONF)
    params, state = model.init(jax.random.PRNGKey(0))
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t)
    params, state = cast(params), cast(state)
    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (B, 64600), jnp.float32))

    def cut(upto: int, with_graph: bool):
        """Forward through `upto` encoder blocks (graph stack optional)."""

        def f(p, s, xx):
            h = xx.astype(jnp.bfloat16)
            bank = jnp.asarray(model.filterbank, jnp.bfloat16)
            h = L.sinc_frontend(bank, h)
            h = jnp.abs(h)[:, None]
            h = nn.max_pool(h, (3, 3))
            h, _ = nn.batch_norm(p["first_bn"], s["first_bn"], h, axis=1,
                                 train=False)
            h = jax.nn.selu(h)
            for i in range(upto):
                h, _ = L.residual_block_apply(
                    p["encoder"][i], s["encoder"][i], h,
                    first=(i == 0), train=False)
            return jnp.sum(h.astype(jnp.float32))

        def g(p, s, xx):
            (_, logits), _ = model.apply(p, s, xx, train=False)
            return jnp.sum(logits.astype(jnp.float32))

        return jax.jit(g if with_graph else f)

    prev = 0.0
    names = ["frontend", "block0", "block1", "block2", "block3", "block4",
             "block5"]
    for i in range(7):
        dt = ptime(cut(i, False), params, state, x)
        print(f"cum {names[i]:9s}: {1e3 * dt:7.1f} ms  "
              f"(stage {1e3 * (dt - prev):+7.1f} ms)", flush=True)
        prev = dt
    dt = ptime(cut(7, True), params, state, x)
    print(f"cum full     : {1e3 * dt:7.1f} ms  "
          f"(graph stack {1e3 * (dt - prev):+7.1f} ms)", flush=True)
    print(f"throughput   : {B / dt:8.1f} utt/s/chip (device-time)",
          flush=True)


if __name__ == "__main__":
    main()
