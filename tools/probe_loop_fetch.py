"""Measure the training-LOOP overhead of per-step metric fetches.

The jitted bf16 train step is ~238 ms on-device (docs/PERF.md), but the
round-1 epoch loop fetched loss+corr synchronously after every step —
two scalar RPCs through the tunnel per step, and a pipeline stall: the
host cannot dispatch step k+1 until it has blocked on step k's loss.
run_training now defers the fetches to the 50-step progress prints.

This probe times N real train steps (B=24, bf16 recipe) both ways.

Usage: python tools/probe_loop_fetch.py [n_steps]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, "/root/repo")
from aasist_tpu.registry import build_model  # noqa: E402
from aasist_tpu.train.loop import make_train_step  # noqa: E402
from aasist_tpu.train.losses import weighted_cce  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
B, L = 24, 64600

conf = {
    "architecture": "AASIST",
    "first_conv": 128,
    "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
    "gat_dims": [64, 32],
    "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
}
model = build_model(conf)
params, state = model.init(jax.random.PRNGKey(0))
optimizer = optax.adam(1e-4)
opt_state = optimizer.init(params)
loss_fn = lambda logits, labels, durations=None, mask=None: weighted_cce(
    logits, labels, sample_mask=mask)
step = make_train_step(model, loss_fn, optimizer, freq_aug=False,
                       use_duration=False, mixed_precision=True)

rng = np.random.default_rng(0)
x = jax.device_put(rng.standard_normal((B, L)).astype(np.float32))
y = jax.device_put((np.arange(B) % 2).astype(np.int32))
dur = jax.device_put(np.full((B,), 4.0, np.float32))
key = jax.random.PRNGKey(1)


def run(n, fetch_every):
    global params, state, opt_state, key
    pend = []
    t0 = time.perf_counter()
    for i in range(n):
        key, sub = jax.random.split(key)
        out = step(params, state, opt_state, x, y, dur, sub)
        params, state, opt_state, loss, corr = out
        pend.append((loss, corr))
        if (i + 1) % fetch_every == 0:
            for dl, dc in pend:
                float(dl), int(dc)
            pend.clear()
    for dl, dc in pend:
        float(dl), int(dc)
    return time.perf_counter() - t0


# compile + warmup
run(2, 1)
t_sync = run(N, 1)
t_defer = run(N, 50)
print(f"per-step fetch : {1e3 * t_sync / N:7.1f} ms/step "
      f"({B * N / t_sync:6.1f} utt/s)", flush=True)
print(f"deferred fetch : {1e3 * t_defer / N:7.1f} ms/step "
      f"({B * N / t_defer:6.1f} utt/s)", flush=True)

# chained: K optimizer steps per dispatch (run_training train_chain)
from aasist_tpu.train.loop import make_chained_train_step  # noqa: E402

K = 8
chained = make_chained_train_step(model, loss_fn, optimizer, chain=K,
                                  freq_aug=False, use_duration=False,
                                  mixed_precision=True)
xs = jnp.stack([x] * K)
ys = jnp.stack([y] * K)
ds = jnp.stack([dur] * K)


def run_chained(groups):
    global params, state, opt_state, key
    t0 = time.perf_counter()
    pend = []
    for _ in range(groups):
        gkey = key
        for _ in range(K):
            key, _ = jax.random.split(key)
        params, state, opt_state, losses, corrs = chained(
            params, state, opt_state, xs, ys, ds, gkey)
        pend.append((losses, corrs))
    for dl, dc in pend:
        np.asarray(dl), np.asarray(dc)
    return time.perf_counter() - t0


run_chained(1)            # compile + warmup
groups = max(2, N // K)
t_chain = run_chained(groups)
n = groups * K
print(f"chained (K={K}) : {1e3 * t_chain / n:7.1f} ms/step "
      f"({B * n / t_chain:6.1f} utt/s)", flush=True)
