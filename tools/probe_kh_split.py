"""A/B probe: decompose every kH=2 conv into two kH=1 convs.

Hypothesis: the encoder pyramid's (2,3) convs are where the forward's
time goes (block0 ~98 ms of 161, docs/PERF.md), while RawNet2's 1-D
convs reach 5172 utt/s on the same chip — maybe XLA's TPU conv emitter
handles the kH=2 coupling over the tiny H=23 spatial dim badly, and a
sum of two kH=1 convs (H offsets expressed through padding arithmetic,
negative pads trim) lowers like the fast 1-D case.

For kernel kH=2 with H padding (pt, pb):
    y[ho] = W0 . xpad[ho] + W1 . xpad[ho+1]
  = conv(x, W0, padH=(pt, pb-1)) + conv(x, W1, padH=(pt-1, pb))

Full-forward timing via the chained-scan methodology (scalar carry
data-dependence between repeats), so a loaded host cannot distort it.

Usage: python tools/probe_kh_split.py [batch]
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
_ORIG_CONV2D = nn.conv2d


def conv2d_khsplit(p, x, padding=((0, 0), (0, 0)), stride=(1, 1)):
    w = p["weight"]
    if w.shape[2] == 2 and tuple(stride) == (1, 1):
        (pt, pb), pw = padding
        dn = ("NCHW", "OIHW", "NCHW")
        y = lax.conv_general_dilated(
            x, w[:, :, 0:1, :], (1, 1), ((pt, pb - 1), tuple(pw)),
            dimension_numbers=dn)
        y = y + lax.conv_general_dilated(
            x, w[:, :, 1:2, :], (1, 1), ((pt - 1, pb), tuple(pw)),
            dimension_numbers=dn)
        if "bias" in p:
            y = y + p["bias"][None, :, None, None]
        return y
    return _ORIG_CONV2D(p, x, padding, stride)


def build():
    conf = {"architecture": "AASIST", "first_conv": 128,
            "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
            "gat_dims": [64, 32], "pool_ratios": [0.5, 0.7, 0.5, 0.5],
            "temperatures": [2.0, 2.0, 100.0, 100.0], "dtype": "bfloat16",
            "use_fused_frontend": True}
    return build_model(conf)


def parity_check(model, params, state):
    """kh-split must be the same conv math (new accumulation order)."""
    x = np.random.default_rng(0).standard_normal((2, 16000)) \
        .astype(np.float32) * 0.05
    nn.conv2d = _ORIG_CONV2D
    (_, ref), _ = jax.jit(
        lambda p, s, xx: model.apply(p, s, xx, train=False)
    )(params, state, x)
    nn.conv2d = conv2d_khsplit
    (_, got), _ = jax.jit(
        lambda p, s, xx: model.apply(p, s, xx, train=False)
    )(params, state, x)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"parity max|dlogits| = {err:.3e}  (bf16 rounding class)",
          flush=True)
    assert err < 0.15, "kh-split changed the math"


def timed_chain(model, params, state, x, k):
    def fn(p, s, xx):
        def body(c, _):
            (_, logits), _ = model.apply(p, s, xx + c, train=False)
            return jnp.sum(logits.astype(jnp.float32)) * 1e-30, ()
        c, _ = lax.scan(body, jnp.float32(0.0), None, length=k)
        return c

    f = jax.jit(fn)
    float(f(params, state, x))          # compile + warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(params, state, x))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def run(label, model, params, state, x):
    try:
        t1 = timed_chain(model, params, state, x, 1)
        t4 = timed_chain(model, params, state, x, 4)
    except Exception as e:  # noqa: BLE001
        print(f"{label:12s}: FAIL {str(e)[:140]}", flush=True)
        return
    per = (t4 - t1) / 3
    print(f"{label:12s}: {1e3 * per:7.1f} ms/fwd  -> "
          f"{B / per:7.0f} utt/s  (t1={1e3 * t1:.1f} t4={1e3 * t4:.1f})",
          flush=True)


def main():
    model = build()
    params, state = model.init(jax.random.PRNGKey(0))
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t)
    params, state = cast(params), cast(state)
    parity_check(model, params, state)

    x = jax.device_put(np.random.default_rng(1)
                       .standard_normal((B, 64600)).astype(np.float32))
    nn.conv2d = _ORIG_CONV2D
    run("base", model, params, state, x)
    nn.conv2d = conv2d_khsplit
    run("kh-split", model, params, state, x)
    nn.conv2d = _ORIG_CONV2D


if __name__ == "__main__":
    main()
