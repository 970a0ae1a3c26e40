"""RawGAT-ST dual-encoder stacking A/B on the real TPU.

The round-4 stacking commit was parity-tested but never timed on-chip;
the official bench then regressed to B=32 (dense stacking doubles the
peak activation memory, so B=128 no longer compiles/fits).  This probe
times every (batch, mode) cell so the shipping default is a measured
choice, not a guess.

Usage: python tools/probe_rawgat_stacked.py [batches] [modes]
  batches: comma list, default 32,64,128
  modes:   comma list of off|dense|grouped, default all
"""

from __future__ import annotations

import collections
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from aasist_tpu.registry import build_model  # noqa: E402

CONF = {
    "architecture": "RawNetGatSpoofST",
    "nb_samp": 64600, "first_conv": 128,
    "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
    "dtype": "bfloat16",
}


def ptime(fn, *args, iters=8, depth=3):
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
    batches = [int(b) for b in
               (sys.argv[1].split(",") if len(sys.argv) > 1
                else ["32", "64", "128"])]
    modes = (sys.argv[2].split(",") if len(sys.argv) > 2
             else ["off", "dense", "grouped"])

    for mode in modes:
        # round 5 retired use_stacked_encoders from the product model
        # (this probe's numbers did the retiring); the stacked path now
        # lives in tools/eval_variants — graft it onto a plain model by
        # intercepting _encode: model.apply calls it for encoder_T then
        # encoder_S in a fixed order, so the first call computes BOTH
        # halves via the stacked pyramid and caches the S half.
        model = build_model(dict(CONF))
        if mode != "off":
            import os as _os
            sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
            import eval_variants as EV

            def make_stacked_encode(m, dense):
                pending = []

                def _encode(blocks_p, blocks_s, x, train):
                    if pending:
                        return pending.pop(), blocks_s
                    # first (encoder_T) call: trace both halves at once
                    params = {"encoder_T": blocks_p,
                              "encoder_S": _encode.params["encoder_S"]}
                    state = {"encoder_T": blocks_s,
                             "encoder_S": _encode.state["encoder_S"]}
                    e_t, e_s = EV.rawgat_encode_stacked(
                        m, params, state, x, dense=dense)
                    pending.append(e_s)
                    return e_t, blocks_s
                return _encode

            enc = make_stacked_encode(model, mode == "dense")
            model._encode = enc
        params, state = model.init(jax.random.PRNGKey(0))
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, t)
        p, s = cast(params), cast(state)
        if mode != "off":
            enc.params, enc.state = p, s

        @jax.jit
        def step(p, s, x):
            (_, logits), _ = model.apply(p, s, x, train=False)
            return logits[:, 1].sum()

        for B in batches:
            x = jax.device_put(jax.random.normal(
                jax.random.PRNGKey(1), (B, 64600), jnp.float32))
            try:
                dt = ptime(step, p, s, x)
                print(f"mode={mode:8s} B={B:4d}  {dt*1e3:8.2f} ms "
                      f"{B/dt:9.1f} utt/s", flush=True)
            except Exception as e:  # noqa: BLE001 - probe records failures
                print(f"mode={mode:8s} B={B:4d}  FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
