"""XLA-level lowering variants for the encoder's hot block0/block1.

Measures, on the real TPU, whether plain-XLA reformulations close the
block0 gap without Pallas:

  v_ref    — current residual_block_apply (NCHW conv_general)
  v_nhwc   — same math, NHWC layout ('NHWC','HWIO','NHWC' dim numbers)
  v_dot    — conv1+conv2 as dual-split dot_generals (K=3*Cin, N=2*Cout)
             over shifted time slices, everything else fused elementwise
  v_time   — full block with time folded into batch (B*tiles, C, F, u+halo)
             so each conv works on shorter, wider-batched tiles

Usage: python tools/probe_xla_variants.py [B]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from aasist_tpu.models import layers as L  # noqa: E402
from aasist_tpu.nn import BN_EPS  # noqa: E402


def timeit(fn, *args, iters=8, depth=3):
    """fn is wrapped so the reduction happens INSIDE the jit and dispatch
    is pipelined — per-call time is device time (RPC latency hidden)."""
    import collections

    jf = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    for _ in range(2):
        float(jf(*args))
    pending = collections.deque()
    t0 = time.perf_counter()
    for _ in range(iters):
        pending.append(jf(*args))
        if len(pending) > depth:
            float(pending.popleft())
    while pending:
        float(pending.popleft())
    return (time.perf_counter() - t0) / iters


def fold_bn(p, s):
    inv = lax.rsqrt(jnp.asarray(s["var"], jnp.float32) + BN_EPS)
    sc = jnp.asarray(p["weight"], jnp.float32) * inv
    sh = (jnp.asarray(p["bias"], jnp.float32)
          - jnp.asarray(s["mean"], jnp.float32) * sc)
    return sc, sh


def dual_split_conv(x, w, b):
    """(B, C, F, T) x (O, I, 2, 3) -> (B, O, F-1... same-F via pad) conv
    with freq pad (1,1)->(0,1) semantics folded by caller; here x is
    already freq-padded to F+1 rows and time-padded by 1 on both sides.
    Returns (B, O, F_out, T) with F_out = x.F - 1.
    """
    B, C, Fp, Tp = x.shape
    T = Tp - 2
    # K = (dt, c); A = stacked shifted slices
    a = jnp.concatenate([x[:, :, :, 0:T], x[:, :, :, 1:T + 1],
                         x[:, :, :, 2:T + 2]], axis=1)  # (B, 3C, Fp, T)
    # W' : (3C, 2O) — dt-major K, df-major N
    wt = jnp.concatenate([
        jnp.concatenate([w[:, :, 0, dt].T, w[:, :, 1, dt].T], axis=1)
        for dt in range(3)], axis=0).astype(x.dtype)
    u = lax.dot_general(a, wt, (((1,), (0,)), ((), ())))  # (B,Fp,T,2O)
    O = w.shape[0]
    y = u[:, 0:Fp - 1, :, :O] + u[:, 1:Fp, :, O:]
    y = jnp.transpose(y, (0, 3, 1, 2)) + b[None, :, None, None]
    return y


def make_block_dot(p, s, first):
    sc2, sh2 = fold_bn(p["bn2"], s["bn2"])
    w1 = jnp.asarray(p["conv1"]["weight"], jnp.float32)
    w1b = jnp.asarray(p["conv1"].get("bias", 0.0), jnp.float32)
    w1f = w1 * sc2[:, None, None, None]
    b1f = sh2 + w1b * sc2
    w2 = jnp.asarray(p["conv2"]["weight"], jnp.float32)
    b2 = jnp.asarray(p["conv2"].get("bias",
                                    jnp.zeros(w2.shape[0])), jnp.float32)
    wd = p.get("conv_downsample", {}).get("weight")
    bd = p.get("conv_downsample", {}).get("bias")

    def apply(x):
        dt = x.dtype
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
        y1 = dual_split_conv(xp, w1f.astype(dt), b1f)
        y1 = jax.nn.selu(y1.astype(dt))
        # conv2 has NO freq padding (reference pad ((0,0),(1,1)))
        y1p = jnp.pad(y1, ((0, 0), (0, 0), (0, 0), (1, 1)))
        y2 = dual_split_conv(y1p, w2.astype(dt), b2)
        if wd is not None:
            idp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1)))
            a = jnp.concatenate([idp[:, :, :, 0:-2], idp[:, :, :, 1:-1],
                                 idp[:, :, :, 2:]], axis=1)
            wdt = jnp.concatenate([wd[:, :, 0, t].T for t in range(3)],
                                  axis=0).astype(dt)
            ident = lax.dot_general(a, wdt, (((1,), (0,)), ((), ())))
            ident = (jnp.transpose(ident, (0, 3, 1, 2))
                     + jnp.asarray(bd, jnp.float32)[None, :, None, None])
        else:
            ident = x
        out = y2.astype(dt) + ident.astype(dt)
        B, C, F, T = out.shape
        out = out[:, :, :, :T - T % 3]
        return jnp.max(out.reshape(B, C, F, -1, 3), axis=4)

    return apply


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    T = 21490
    key = jax.random.PRNGKey(0)
    p, st = L.residual_block_init(key, 1, 32, first=True)
    x = jax.random.normal(key, (B, 1, 23, T), jnp.float32).astype(
        jnp.bfloat16)
    cast = lambda t_: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), t_)
    pb, sb = cast(p), cast(st)

    ref = jax.jit(lambda pp, ss, xx: L.residual_block_apply(
        pp, ss, xx, first=True, train=False)[0])
    t_ref = timeit(ref, pb, sb, x)
    print(f"block0 XLA ref     : {1e3 * t_ref:7.1f} ms", flush=True)

    blk = make_block_dot(p, st, True)
    dot = jax.jit(blk)
    try:
        t_dot = timeit(dot, x)
        print(f"block0 XLA dualdot : {1e3 * t_dot:7.1f} ms", flush=True)
        err = float(jnp.max(jnp.abs(
            dot(x).astype(jnp.float32) - ref(pb, sb, x).astype(jnp.float32))))
        print(f"  max err vs ref: {err:.3e}", flush=True)
    except Exception as e:
        print(f"dualdot FAILED: {type(e).__name__}: {str(e)[:300]}")

    # block1 (32->32) comparison
    p1, st1 = L.residual_block_init(key, 32, 32, first=False)
    x1 = jax.random.normal(key, (B, 32, 23, 7163), jnp.float32).astype(
        jnp.bfloat16)
    pb1, sb1 = cast(p1), cast(st1)
    ref1 = jax.jit(lambda pp, ss, xx: L.residual_block_apply(
        pp, ss, xx, first=False, train=False)[0])
    t_ref1 = timeit(ref1, pb1, sb1, x1)
    print(f"block1 XLA ref     : {1e3 * t_ref1:7.1f} ms", flush=True)
    blk1 = make_block_dot(p1, st1, False)
    dot1 = jax.jit(blk1)
    try:
        t_dot1 = timeit(dot1, x1)
        print(f"block1 XLA dualdot : {1e3 * t_dot1:7.1f} ms", flush=True)
        err = float(jnp.max(jnp.abs(
            dot1(x1).astype(jnp.float32)
            - ref1(pb1, sb1, x1).astype(jnp.float32))))
        print(f"  max err vs ref: {err:.3e}", flush=True)
    except Exception as e:
        print(f"dualdot1 FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
