"""Sub-op split + formulation variants of block0 at the shipped config.

Round-3 stage split (tools/probe_stage_split.py, B=128 fused fe bf16):
block0 = 43.75 ms of the 68.25 ms forward.  This probe cuts INSIDE
block0 and times alternative formulations, all on the block's real
input geometry (B, 1, 23, 21490) with checkpoint weights.

Cuts (cumulative):
  conv1        conv2d k(2,3) pad(1,1): 1 -> 32 channels
  +bnselu      bn2 + selu
  +conv2       conv2d k(2,3) pad(0,1)
  +pool        maxpool(1,3)  (no identity: measures pool fusion)
  full         + downsample conv + add (the shipped block)

Variants (full-block alternatives):
  aug          layers.residual_block_apply_aug (ds folded into conv2)
  poly         layers.residual_block_apply_poly (stride-3 conv2+pool)
  stream4      lax.map over 4 time windows (halo 2) — VERDICT r2 item 2b
  ds_concat    ds computed as extra output channels of conv1's conv

Usage (real chip): python tools/probe_b0_sub.py
Env: PROBE_BATCH (128), PROBE_G (8), PROBE_SEL (comma filter).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

F_IN, T_IN = 23, 21490


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from aasist_tpu import nn
    from aasist_tpu.models import layers as L
    from aasist_tpu.train.checkpoints import load_weights
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import eval_variants as EV  # round-5 retired variants live there

    batch = int(os.environ.get("PROBE_BATCH", 128))
    G = int(os.environ.get("PROBE_G", 8))

    params, state = load_weights(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "checkpoints", "AASIST.npz"))
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t)
    p0 = cast(params["encoder"][0])
    s0 = cast(state["encoder"][0])

    def conv1(x):
        return nn.conv2d(p0["conv1"], x, padding=((1, 1), (1, 1)))

    def bnselu(x):
        y, _ = nn.batch_norm(p0["bn2"], s0["bn2"], x, axis=1, train=False)
        return jax.nn.selu(y)

    def conv2(x):
        return nn.conv2d(p0["conv2"], x, padding=((0, 0), (1, 1)))

    def full(x):
        out, _ = L.residual_block_apply(p0, s0, x, first=True, train=False)
        return out

    def stream4(x):
        # time-streamed block0: lax.map over 4 windows with halo 2 on the
        # input (conv1 pad 1 + conv2 pad 1), outputs pooled then stitched
        n_w = 4
        w = T_IN // n_w                       # 4*5372 — last 2 cols dropped
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (2, 2)),
                     constant_values=0.0)     # halo zeros (= conv pads)

        def one(i):
            seg = lax.dynamic_slice_in_dim(xp, i * w, w + 4, axis=3)
            # interior windows: conv pads come from the halo, not zeros
            c1 = nn.conv2d(p0["conv1"], seg,
                           padding=((1, 1), (0, 0)))    # (B,32,24,w+2)
            z = bnselu(c1)
            c2 = nn.conv2d(p0["conv2"], z,
                           padding=((0, 0), (0, 0)))    # (B,32,23,w)
            idn = nn.conv2d(p0["conv_downsample"], seg[..., 2:-2],
                            padding=((0, 0), (1, 1)))
            return nn.max_pool(c2 + idn, (1, 3))

        outs = lax.map(one, jnp.arange(n_w))            # (n_w,B,32,23,w/3)
        return outs

    def ds_concat(x):
        # one conv produces conv1 AND ds: ds k(1,3) rides as a k(2,3)
        # kernel with a zeroed top row; its valid rows are 1..23 of the
        # pad-(1,1) output.  Removes one full read of x (tiny) and one
        # kernel launch; the POINT is whether XLA then fuses better.
        w1 = p0["conv1"]["weight"]                      # (32,1,2,3)
        wd = p0["conv_downsample"]["weight"]            # (32,1,1,3)
        wd2 = jnp.concatenate([jnp.zeros_like(wd), wd], axis=2)
        wcat = jnp.concatenate([w1, wd2], axis=0)       # (64,1,2,3)
        bcat = jnp.concatenate([p0["conv1"]["bias"],
                                p0["conv_downsample"]["bias"]])
        y = nn.conv2d({"weight": wcat, "bias": bcat}, x,
                      padding=((1, 1), (1, 1)))         # (B,64,24,T)
        c1, idn = y[:, :32], y[:, 32:, 1:24]
        z = bnselu(c1)
        c2 = nn.conv2d(p0["conv2"], z, padding=((0, 0), (1, 1)))
        return nn.max_pool(c2 + idn, (1, 3))

    def ds(x):
        return nn.conv2d(p0["conv_downsample"], x, padding=((0, 0), (1, 1)))

    def rmax(y):
        # reshape-split pool: 703 GB/s standalone vs reduce_window's 55
        # (PERF.md 4c) — re-tested here at the block level, B=128
        b, c, f, t = y.shape
        tp = (t // 3) * 3
        return y[..., :tp].reshape(b, c, f, t // 3, 3).max(-1)

    def full_rmax(x):
        c2 = conv2(bnselu(conv1(x)))
        return rmax(c2 + ds(x))

    def aug_rmax(x):
        # aug kills the ds materialization; rmax kills the slow pool —
        # ideal remaining traffic: conv1a w 4.3 + selu rw + conv2a r/w +
        # pool r 4.05 w 1.35 GB.  (Inlined aug body minus its pool.)
        w1 = p0["conv1"]["weight"]
        w2 = p0["conv2"]["weight"]
        wd = p0["conv_downsample"]["weight"]
        ci, co1, co2 = w1.shape[1], w1.shape[0], w2.shape[0]
        dt = w1.dtype
        naug = ci + co1
        w1a = jnp.zeros((naug, ci, 2, 3), dt)
        idx = jnp.arange(ci)
        w1a = w1a.at[idx, idx, 1, 1].set(jnp.asarray(1, dt))
        w1a = w1a.at[ci:].set(w1)
        z = lax.conv_general_dilated(
            x, w1a, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        b1 = p0["conv1"]["bias"]
        b1a = jnp.concatenate([jnp.zeros((ci,), dt), b1.astype(dt)])
        bn, bs = p0["bn2"], s0["bn2"]
        scale = (bn["weight"] * lax.rsqrt(bs["var"] + nn.BN_EPS)).astype(dt)
        offset = (bn["bias"] - bn["weight"]
                  * lax.rsqrt(bs["var"] + nn.BN_EPS)
                  * bs["mean"]).astype(dt)
        sa = jnp.concatenate([jnp.ones((ci,), dt), scale])
        oa = jnp.concatenate([jnp.zeros((ci,), dt), offset])
        zb = z + b1a[None, :, None, None]
        za = sa[None, :, None, None] * zb + oa[None, :, None, None]
        cmask = (jnp.arange(naug) < ci)[None, :, None, None]
        z = jnp.where(cmask, zb, jax.nn.selu(za))
        w2a = jnp.zeros((co2, naug, 2, 3), dt)
        w2a = w2a.at[:, :ci, 0:1, :].set(wd)
        w2a = w2a.at[:, ci:].set(w2)
        y = lax.conv_general_dilated(
            z, w2a, (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        b2a = (p0["conv2"]["bias"].astype(dt)
               + p0["conv_downsample"]["bias"].astype(dt))
        return rmax(y + b2a[None, :, None, None])

    def full_slice3(x):
        y = conv2(bnselu(conv1(x))) + ds(x)
        tp = (y.shape[-1] // 3) * 3
        y = y[..., :tp]
        return jnp.maximum(jnp.maximum(y[..., 0::3], y[..., 1::3]),
                           y[..., 2::3])

    cuts = {
        "conv1": conv1,
        "+bnselu": lambda x: bnselu(conv1(x)),
        "+conv2": lambda x: conv2(bnselu(conv1(x))),
        "+pool": lambda x: nn.max_pool(conv2(bnselu(conv1(x))), (1, 3)),
        "full": full,
        "full_rmax": full_rmax,
        "aug_rmax": aug_rmax,
        "full_slice3": full_slice3,
        "aug": lambda x: EV.residual_block_apply_aug(p0, s0, x, first=True),
        "poly": lambda x: EV.residual_block_apply_poly(
            p0, s0, x, first=True),
        "stream4": stream4,
        "ds_concat": ds_concat,
    }
    sel = os.environ.get("PROBE_SEL")
    if sel:
        cuts = {k: v for k, v in cuts.items() if k in sel.split(",")}

    rng = np.random.default_rng(0)
    x = (rng.standard_normal((G, batch, 1, F_IN, T_IN)) * 0.3).astype(
        np.float32)
    x = jax.device_put(jnp.asarray(x, jnp.bfloat16))

    print(f"batch={batch} G={G} bf16 block0 geometry ({F_IN}x{T_IN})")
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
            print(f"{name:10s}  {dt * 1e3:7.2f} ms/batch  "
                  f"(compile {t_compile:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name:10s}  FAILED: {str(e)[:160]}", flush=True)

    order = [k for k in ("conv1", "+bnselu", "+conv2", "+pool", "full")
             if k in results]
    for a, b in zip(order, order[1:]):
        print(f"delta {b:8s} - {a:8s} = {results[b] - results[a]:7.2f} ms")


if __name__ == "__main__":
    main()
