"""Training-recipe timing at the shipped hyperparameters (round 3).

VERDICT r2 item 5: the measured-faster recipes (B=48 single-graph,
B=96 + grad_accum=2) were never promoted.  This probe times the real
jitted train step (weighted CCE, adam, donated buffers, bf16 mixed
precision) for the candidate recipes — optionally under the round-3
scoped-vmem libtpu flag, which reshapes fusion scheduling and may move
the ranking (set LIBTPU_INIT_ARGS in the environment; see docs/PERF.md).

Recipes (per docs/PERF.md round-2 table):
  b24        B=24, single graph, no remat   (shipped default, 101 utt/s)
  b48        B=48, single graph, remat      (123 utt/s)
  b96a2      B=96, grad_accum=2, remat      (128 utt/s)
  b48_nr     B=48, single graph, no remat   (untried round 2)

Usage (real chip):
    python tools/probe_train_recipes.py
    LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
        python tools/probe_train_recipes.py
Env: PROBE_SEL (comma filter), PROBE_STEPS (default 30).
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

    import optax

    from aasist_tpu.registry import build_model
    from aasist_tpu.train.loop import make_train_step
    from aasist_tpu.train.losses import weighted_cce

    recipes = {
        "b24": dict(batch=24, accum=1, remat=False),
        "b48": dict(batch=48, accum=1, remat=True),
        "b96a2": dict(batch=96, accum=2, remat=True),
        "b48_nr": dict(batch=48, accum=1, remat=False),
    }
    sel = os.environ.get("PROBE_SEL")
    if sel:
        recipes = {k: v for k, v in recipes.items() if k in sel.split(",")}
    n_steps = int(os.environ.get("PROBE_STEPS", 30))

    flag = os.environ.get("LIBTPU_INIT_ARGS", "")
    print(f"steps={n_steps} LIBTPU_INIT_ARGS={flag!r}", flush=True)

    rng = np.random.default_rng(0)
    for name, r in recipes.items():
        try:
            conf = {
                "architecture": "AASIST", "first_conv": 128,
                "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
                "gat_dims": [64, 32], "pool_ratios": [0.5, 0.7, 0.5, 0.5],
                "temperatures": [2.0, 2.0, 100.0, 100.0],
                "remat": r["remat"],
            }
            model = build_model(conf)
            params, state = model.init(jax.random.PRNGKey(0))
            optimizer = optax.adam(1e-4)
            opt_state = optimizer.init(params)
            loss_fn = (lambda logits, labels, durations=None, mask=None:
                       weighted_cce(logits, labels, sample_mask=mask))
            step = make_train_step(
                model, loss_fn, optimizer, freq_aug=True,
                use_duration=False, mixed_precision=True,
                grad_accum_steps=r["accum"])
            b = r["batch"]
            x = jax.device_put(rng.standard_normal(
                (b, FIXED_LEN), dtype=np.float32))
            y = jax.device_put((np.arange(b) % 2).astype(np.int64))
            dur = jax.device_put(np.full((b,), 4.0, np.float32))
            key = jax.random.PRNGKey(1)

            p, s2, o = params, state, opt_state
            t0 = time.perf_counter()
            p, s2, o, loss, corr = step(p, s2, o, x, y, dur, key)
            float(loss)
            t_compile = time.perf_counter() - t0
            # steady state: defer fetches (the round-2 loop lesson)
            t0 = time.perf_counter()
            last = None
            for i in range(n_steps):
                key, sub = jax.random.split(key)
                p, s2, o, loss, corr = step(p, s2, o, x, y, dur, sub)
                last = loss
            float(last)
            dt = (time.perf_counter() - t0) / n_steps
            print(f"{name:8s} {dt * 1e3:7.1f} ms/step  "
                  f"{b / dt:6.1f} utt/s  (compile {t_compile:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name:8s} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
