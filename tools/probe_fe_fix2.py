"""Narrow the pallas+conv remote-compile crash.

Variants (all: fused_frontend -> X -> sum):
  conv_b32     the failing conv, but batch 32 (resource hypothesis)
  matmul       (B*23, T) @ (T, 64) big matmul consumer
  im2col       block0 conv1 expressed as XLA im2col matmul
  fused_b0     fused_resblock block0 (pallas) consumer
  conv_after2  conv in a SECOND jit (two-dispatch split), timed chained

Usage: python tools/probe_fe_fix2.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from aasist_tpu import nn  # noqa: E402
from aasist_tpu.models import layers as L  # noqa: E402
from aasist_tpu.ops import fused_frontend as FF  # noqa: E402
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
    bank = jnp.asarray(model.filterbank, jnp.bfloat16)

    def fe(p, s, xx):
        return FF.fused_frontend(xx.astype(jnp.bfloat16), bank,
                                 p["first_bn"], s["first_bn"])

    x256 = jax.device_put(jnp.zeros((256, 64600), jnp.float32))
    x32 = jax.device_put(jnp.zeros((32, 64600), jnp.float32))

    def try_(name, f, *args):
        try:
            v = float(jax.jit(f)(*args))
            print(f"{name:12s}: OK ({v:.3e})", flush=True)
            return True
        except Exception as e:
            print(f"{name:12s}: FAIL {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            return False

    # conv at batch 32
    def f_conv(p, s, xx):
        h = fe(p, s, xx)
        h, _ = L.residual_block_apply(p["encoder"][0], s["encoder"][0], h,
                                      first=True, train=False)
        return jnp.sum(h.astype(jnp.float32))

    try_("conv_b32", f_conv, params, state, x32)

    # matmul consumer
    def f_mm(p, s, xx):
        h = fe(p, s, xx)                       # (B, 1, 23, T)
        b, _, f_, t = h.shape
        w = jnp.ones((t, 64), jnp.bfloat16) * 1e-3
        y = h.reshape(b * f_, t) @ w
        return jnp.sum(y.astype(jnp.float32))

    try_("matmul", f_mm, params, state, x256)

    # conv1 as im2col matmul (freq-taps via 2 shifted adds, time-taps in K)
    def f_im2col(p, s, xx):
        h = fe(p, s, xx)[:, 0]                 # (B, 23, T)
        b, f_, t = h.shape
        hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1)))   # pad f and t by 1
        w1 = p["encoder"][0]["conv1"]["weight"]     # (32, 1, 2, 3)
        pieces = []
        for df in range(2):
            for dt in range(3):
                pieces.append(hp[:, df:df + 24, dt:dt + t])
        a = jnp.stack(pieces, axis=-1)          # (B, 24, T, 6)
        wk = w1[:, 0].reshape(32, 6)            # (32, 6)
        y = jnp.einsum("bftk,ok->boft", a, wk)  # (B, 32, 24, T)
        return jnp.sum(y.astype(jnp.float32))

    try_("im2col", f_im2col, params, state, x256)

    # fused pallas block0 consumer
    def f_fb0(p, s, xx):
        from aasist_tpu.ops import fused_resblock as FR
        h = fe(p, s, xx)
        fp = FR.FusedBlockParams(p["encoder"][0], s["encoder"][0], 1, 32)
        y = FR.fused_residual_block(h[:, 0][:, None] * 1.0, fp)
        return jnp.sum(y.astype(jnp.float32))

    try_("fused_b0", f_fb0, params, state, x256)

    # two-dispatch split: fe jit, conv jit — chained timing
    fe_j = jax.jit(fe)
    def rest(p, s, h):
        h, _ = L.residual_block_apply(p["encoder"][0], s["encoder"][0], h,
                                      first=True, train=False)
        return jnp.sum(h.astype(jnp.float32))
    rest_j = jax.jit(rest)
    try:
        h = fe_j(params, state, x256)
        v = float(rest_j(params, state, h))
        print(f"split2      : OK ({v:.3e})", flush=True)
        # pipelined timing of the pair
        import collections
        pending = collections.deque()
        for _ in range(2):
            float(rest_j(params, state, fe_j(params, state, x256)))
        t0 = time.perf_counter()
        for _ in range(8):
            pending.append(rest_j(params, state, fe_j(params, state, x256)))
            if len(pending) > 3:
                float(pending.popleft())
        while pending:
            float(pending.popleft())
        dt = (time.perf_counter() - t0) / 8
        print(f"split2 time : {1e3 * dt:.1f} ms/pair (pipelined)",
              flush=True)
    except Exception as e:
        print(f"split2      : FAIL {type(e).__name__}: {str(e)[:140]}",
              flush=True)


if __name__ == "__main__":
    main()
