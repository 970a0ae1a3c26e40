"""In-model A/B: reshape-split (1,k) max pool vs reduce_window.

probe_pool_variants.py measured the reshape-split formulation of the
stride-3 time pool at 703 GB/s vs 55 GB/s for reduce_window on the
block0 output shape — but an earlier in-model attempt was recorded as
slower and compile-breaking (docs/PERF.md round-2 item 4).  This probe
settles it: time the FULL AASIST forward at batch 256 bf16 (the bench
configuration, fused frontend on) with nn.max_pool patched to the
reshape formulation for (1, k) windows only, vs unpatched.

Full-forward calls are >100 ms, so per-call timing is trustworthy
(docs/PERF.md methodology).

Usage: python tools/probe_pool_inmodel.py [batch]
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
from aasist_tpu.registry import build_model  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def max_pool_reshape(x, window, stride=None):
    stride = tuple(stride) if stride is not None else tuple(window)
    if (len(window) == 2 and window[0] == 1 and stride[0] == 1
            and window[1] == stride[1] and window[1] > 1):
        k = window[1]
        to = x.shape[-1] // k
        shp = x.shape[:-1] + (to, k)
        return jnp.max(x[..., :to * k].reshape(shp), axis=-1)
    dims = (1, 1) + tuple(window)
    strides = (1, 1) + stride
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, strides, "VALID")


def build(use_fused):
    conf = {"architecture": "AASIST", "first_conv": 128,
            "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
            "gat_dims": [64, 32], "pool_ratios": [0.5, 0.7, 0.5, 0.5],
            "temperatures": [2.0, 2.0, 100.0, 100.0], "dtype": "bfloat16"}
    if use_fused:
        conf["use_fused_frontend"] = True
    return build_model(conf)


def run(label, model, params, state, x):
    def forward(p, s, xx):
        (_, logits), _ = model.apply(p, s, xx, train=False)
        return jnp.sum(logits.astype(jnp.float32))

    fwd = jax.jit(forward)
    try:
        float(fwd(params, state, x))
    except Exception as e:  # noqa: BLE001
        print(f"{label:22s}: COMPILE FAIL {str(e)[:120]}", flush=True)
        return
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(fwd(params, state, x))
        ts.append(time.perf_counter() - t0)
    ms = 1e3 * sorted(ts)[len(ts) // 2]
    print(f"{label:22s}: {ms:7.1f} ms  -> {B / (ms / 1e3):7.0f} utt/s",
          flush=True)


def main():
    model = build(use_fused=True)
    params, state = model.init(jax.random.PRNGKey(0))
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t)
    params, state = cast(params), cast(state)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.standard_normal((B, 64600)).astype(np.float32))

    orig = nn.max_pool
    run("baseline rw-pool", model, params, state, x)
    nn.max_pool = max_pool_reshape
    try:
        run("reshape (1,k) pool", model, params, state, x)
    finally:
        nn.max_pool = orig


if __name__ == "__main__":
    main()
