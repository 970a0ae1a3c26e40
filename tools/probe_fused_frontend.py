"""Device probe: fused_frontend Pallas kernel vs XLA frontend path.

Compile-checks the kernel on the attached TPU, verifies numerics against
the XLA sinc+abs+pool+bn+selu chain, and times both (pipelined dispatch,
in-jit reduction => pure device time).

Usage: python tools/probe_fused_frontend.py [B]
"""

from __future__ import annotations

import collections
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from aasist_tpu import nn  # noqa: E402
from aasist_tpu.models import layers as L  # noqa: E402
from aasist_tpu.models.layers import sinc_filterbank  # noqa: E402
from aasist_tpu.ops.fused_frontend import fused_frontend  # noqa: E402


def ptime(fn, *args, iters=10, depth=3):
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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    bank = jnp.asarray(sinc_filterbank(70, 129, 16000), jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.standard_normal((B, 64600)).astype(np.float32))

    bn_p = {"weight": jnp.ones((1,), jnp.float32),
            "bias": jnp.zeros((1,), jnp.float32) + 0.1}
    bn_s = {"mean": jnp.zeros((1,), jnp.float32) + 0.05,
            "var": jnp.ones((1,), jnp.float32) * 1.3}

    def xla_fe(xx):
        h = xx.astype(jnp.bfloat16)
        h = L.sinc_frontend(bank, h)
        h = jnp.abs(h)[:, None]
        h = nn.max_pool(h, (3, 3))
        h, _ = nn.batch_norm(bn_p, bn_s, h, axis=1, train=False)
        return jax.nn.selu(h)

    def fused_fe(xx):
        return fused_frontend(xx.astype(jnp.bfloat16), bank, bn_p, bn_s)

    # -- compile + numerics ------------------------------------------
    ref = jax.jit(xla_fe)(x[:8])
    try:
        got = jax.jit(fused_fe)(x[:8])
    except Exception as e:
        print(f"FUSED COMPILE FAIL: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return 1
    ref32 = np.asarray(ref, np.float32)
    got32 = np.asarray(got, np.float32)
    print(f"shapes ref={ref32.shape} got={got32.shape}", flush=True)
    err = np.max(np.abs(ref32 - got32))
    rel = err / max(1e-6, np.max(np.abs(ref32)))
    print(f"max abs err: {err:.3e}  (rel {rel:.3e})", flush=True)

    # -- timing -------------------------------------------------------
    jx = jax.jit(lambda xx: jnp.sum(xla_fe(xx).astype(jnp.float32)))
    jf = jax.jit(lambda xx: jnp.sum(fused_fe(xx).astype(jnp.float32)))
    tx = ptime(jx, x)
    tf = ptime(jf, x)
    print(f"XLA   frontend B={B}: {1e3 * tx:7.2f} ms", flush=True)
    print(f"fused frontend B={B}: {1e3 * tf:7.2f} ms  "
          f"({tx / tf:.2f}x)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
