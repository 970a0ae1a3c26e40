"""Device calibration with in-jit op chaining (axon RPC-floor-proof).

The axon tunnel imposes a ~30-40 ms per-dispatch floor that pipelined
dispatch does NOT hide for cheap programs — any op measured per-call at
<40 ms is really measuring the tunnel.  Here every op is chained K times
inside ONE jit with a data dependence between steps, and the per-op time
is (t_K - t_1)/(K - 1).

DCE pitfall (first version of this probe): consuming the op's output via
a sliced reduction lets XLA compute only the slice — e.g. (m @ m)[:, :1]
becomes a matvec and "measures" negative time.  Every op here is consumed
by a FULL-tensor reduction (jnp.max / jnp.sum over everything), or chains
the whole tensor as the scan carry.

Reports (measured K=1 vs K=9 chained):
  hbm-rw     y <- y*a+b elementwise, 2.3 GB bf16 carry   -> GB/s (r+w)
  hbm-read   full-tensor sum of 2.3 GB                   -> GB/s (read)
  mxu-4k     chained 4096^2 bf16 matmul, max-consumed    -> TFLOP/s
  pool-rw    nn.max_pool (reduce_window), max-consumed
  pool-rs    reshape+max pool, max-consumed
  sinc-xla   stride-1 sinc conv (B,1,L)->(B,70,64472), max-consumed
  xla-fe     full XLA frontend (conv+abs+pool+bn+selu), max-consumed
  fe-pallas  fused_frontend Pallas kernel (incl. glue), max-consumed

Usage: python tools/probe_calibration.py [ops...]
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
from aasist_tpu.models.layers import sinc_filterbank  # noqa: E402

B = 256


def timed(fn, *args, iters=6):
    f = jax.jit(fn)
    float(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def chain_max(op, x, k):
    """op consumed by full-tensor max; scalar carry serializes steps."""
    def fn(xx):
        def body(c, _):
            y = op(xx, c)
            return jnp.max(y.astype(jnp.float32)) * 1e-20, ()
        c, _ = lax.scan(body, jnp.float32(0.0), None, length=k)
        return c
    return fn


def rate_max(op, x, label="", unit_bytes=None, unit_flops=None,
             k2=9):
    t1 = timed(chain_max(op, x, 1), x)
    t2 = timed(chain_max(op, x, k2), x)
    per = (t2 - t1) / (k2 - 1)
    msg = f"{label:10s}: {1e3 * per:8.2f} ms/op"
    if unit_bytes:
        msg += f"  -> {unit_bytes / per / 1e9:6.0f} GB/s"
    if unit_flops:
        msg += f"  -> {unit_flops / per / 1e12:6.1f} TF/s"
    print(msg, flush=True)
    return per


def pool_reshape(y):
    b, c, f, t = y.shape
    fo, to = f // 3, t // 3
    y = y[:, :, :fo * 3, :to * 3].reshape(b, c, fo * 3, to, 3)
    y = jnp.max(y, axis=-1)
    y = y.reshape(b, c, fo, 3, to)
    return jnp.max(y, axis=-2)


def main():
    which = set(sys.argv[1:]) or {
        "hbm", "mxu", "pool", "sinc", "xlafe", "fe"}
    big = jax.device_put(jnp.zeros((256, 70, 64472), jnp.bfloat16))
    nbytes = big.size * 2

    if "hbm" in which:
        # full-tensor carry: each step reads + writes the whole tensor
        def rw_chain(k):
            def fn(xx):
                def body(y, _):
                    return y * jnp.bfloat16(1.0001) + jnp.bfloat16(1e-6), ()
                y, _ = lax.scan(body, xx, None, length=k)
                return jnp.max(y.astype(jnp.float32))
            return fn
        t1 = timed(rw_chain(1), big)
        t2 = timed(rw_chain(9), big)
        per = (t2 - t1) / 8
        print(f"hbm-rw    : {1e3 * per:8.2f} ms/op  "
              f"-> {2 * nbytes / per / 1e9:6.0f} GB/s", flush=True)
        rate_max(lambda x, c: jnp.sum(x.astype(jnp.float32)) + c, big,
                 label="hbm-read", unit_bytes=nbytes)

    if "mxu" in which:
        a = jax.device_put(jnp.ones((4096, 4096), jnp.bfloat16) * 1e-3)
        rate_max(lambda m, c: (m + c.astype(jnp.bfloat16)) @ m, a,
                 label="mxu-4k", unit_flops=2 * 4096**3)

    if "pool" in which:
        y = jax.device_put(jnp.zeros((256, 1, 70, 64472), jnp.bfloat16))
        rate_max(lambda v, c: nn.max_pool(v + c.astype(v.dtype), (3, 3)),
                 y, label="pool-rw", unit_bytes=y.size * 2)
        rate_max(lambda v, c: pool_reshape(v + c.astype(v.dtype)), y,
                 label="pool-rs", unit_bytes=y.size * 2)

    bank = jnp.asarray(sinc_filterbank(70, 129, 16000), jnp.bfloat16)
    x = jax.device_put(jnp.zeros((B, 64600), jnp.bfloat16))
    sinc_flops = 2 * 70 * 129 * 64472 * B

    if "sinc" in which:
        rate_max(lambda xx, c: L.sinc_frontend(bank, xx + c.astype(xx.dtype)),
                 x, label="sinc-xla", unit_flops=sinc_flops)

    if "xlafe" in which:
        def xla_fe(xx, c):
            h = L.sinc_frontend(bank, xx + c.astype(xx.dtype))
            h = jnp.abs(h)[:, None]
            h = nn.max_pool(h, (3, 3))
            return jax.nn.selu(h * 1.0 + 0.1)
        rate_max(xla_fe, x, label="xla-fe", unit_flops=sinc_flops)

    if "fe" in which:
        from aasist_tpu.ops.fused_frontend import fused_frontend
        bn_p = {"weight": jnp.ones((1,)), "bias": jnp.zeros((1,))}
        bn_s = {"mean": jnp.zeros((1,)), "var": jnp.ones((1,))}
        rate_max(lambda xx, c: fused_frontend(xx + c.astype(xx.dtype),
                                              bank, bn_p, bn_s),
                 x, label="fe-pallas", unit_flops=sinc_flops)


if __name__ == "__main__":
    main()
