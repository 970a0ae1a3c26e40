"""Round-3 feasibility probes for the block0 head/tail Pallas kernels.

Block0's remaining cost after the round-3 sub-split (docs/PERF.md) is
epilogue-dominated: pool 11.9 ms + ds/add 12.0 ms + unfused bn/selu
6.0 ms against a ~7 ms dataflow floor.  Closing it needs Pallas kernels,
and their viability hangs on a few Mosaic/XLA lowering questions this
probe answers empirically on scaled-down block0 geometry (B=64,
T=4608 — the ops are memory-streaming, so GB/s transfers to full size):

  pool_reshape   in-kernel (..., 3V) -> (..., V, 3) lane-split + max
  pool_strided   in-kernel max of three stride-3 lane slices
  pool_sublane   time-in-sublanes layout (B,32,T,23): sublane-split + max
  geg_write      in-kernel per-g sublane extraction: (32,24,G,U) compute
                 layout -> (G,32,24,U) natural-NCHW output tile
  conv2_nchw     XLA conv2 baseline (B,32,24,T) -> (B,32,23,T)
  conv2_chnw_in  XLA conv2 consuming kernel-native (32,24,B,T) input
  conv2_ncwh_out XLA conv2 emitting time-major (B,32,T,23) output
  xpose_wh       XLA transpose (B,32,23,T) -> (B,32,T,23) reference cost

Methodology: per-iteration cost is the SLOPE between a K=2 and K=12
in-jit chain over independent input slices (full-tensor consumption,
one scalar fetch) — the ~30-40 ms dispatch floor cancels in the
difference (docs/PERF.md round-2 methodology notes).

Usage (real chip): python tools/probe_tail_constructs.py
Env: PROBE_SEL (comma filter).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 64
F_Y = 23
V = 512                       # pooled columns per tile
NT = 3                        # tiles
T3 = NT * 3 * V               # 4608 (pre-pool time extent)
G = 8
K_LO, K_HI = 2, 12


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    # ---------------- Pallas pool variants ----------------
    def pool_reshape_kernel(y_ref, o_ref):
        y = y_ref[...]                       # (g, 32, 23, 3V)
        yr = y.reshape(y.shape[0], y.shape[1], y.shape[2], V, 3)
        o_ref[...] = jnp.max(yr, axis=-1)

    def pool_strided_kernel(y_ref, o_ref):
        y = y_ref[...]
        o_ref[...] = jnp.maximum(
            jnp.maximum(y[..., 0::3], y[..., 1::3]), y[..., 2::3])

    def pool_sublane_kernel(y_ref, o_ref):
        y = y_ref[...]                       # (g, 32, 3V, 23)
        yr = y.reshape(y.shape[0], y.shape[1], V, 3, y.shape[3])
        o_ref[...] = jnp.max(yr, axis=3)

    def mk_pool(body, time_major: bool):
        in2 = (3 * V, F_Y) if time_major else (F_Y, 3 * V)
        out2 = (V, F_Y) if time_major else (F_Y, V)
        if time_major:
            imap = lambda bb, jj: (bb, 0, jj, 0)
            omap = lambda bb, jj: (bb, 0, jj, 0)
        else:
            imap = lambda bb, jj: (bb, 0, 0, jj)
            omap = lambda bb, jj: (bb, 0, 0, jj)

        def run(y):
            b = y.shape[0]
            return pl.pallas_call(
                body,
                grid=(b // G, NT),
                in_specs=[pl.BlockSpec((G, 32) + in2, imap,
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((G, 32) + out2, omap,
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(
                    (b, 32) + tuple(V if s == 3 * V else s for s in in2),
                    y.dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(y)
        return run

    # ---------------- per-g write layout change ----------------
    U = 512
    NT_U = T3 // U

    def _selu(x):
        # exp-based selu (expm1 is not lowerable in Pallas TC)
        zero = jnp.zeros((), x.dtype)
        return (1.0507009873554805 * jnp.maximum(x, zero)
                + (1.0507009873554805 * 1.6732632423543772)
                * (jnp.exp(jnp.minimum(x, zero)) - 1.0))

    def geg_kernel(z_ref, o_ref):
        z = z_ref[...]                       # (32, 24, g, U)
        z = _selu(z.astype(jnp.float32)).astype(o_ref.dtype)
        for gi in range(G):
            o_ref[gi] = z[:, :, gi, :]

    def geg_write(z):                         # z: (32, 24, B, T3)
        b = z.shape[2]
        return pl.pallas_call(
            geg_kernel,
            grid=(b // G, NT_U),
            in_specs=[pl.BlockSpec((32, 24, G, U),
                                   lambda bb, jj: (0, 0, bb, jj),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((G, 32, 24, U),
                                   lambda bb, jj: (bb, 0, 0, jj),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 32, 24, T3), z.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(z)

    # ---------------- XLA conv2 layout variants ----------------
    w2 = jnp.asarray(rng.standard_normal((32, 32, 2, 3)) * 0.05,
                     jnp.bfloat16)

    def conv2_nchw(z):                        # (B,32,24,T) -> (B,32,23,T)
        return lax.conv_general_dilated(
            z, w2, (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    def conv2_chnw_in(z):                     # (32,24,B,T) -> (B,32,23,T)
        return lax.conv_general_dilated(
            z, w2, (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=("CHNW", "OIHW", "NCHW"))

    def conv2_ncwh_out(z):                    # (B,32,24,T) -> (B,32,T,23)
        return lax.conv_general_dilated(
            z, w2, (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCWH"))

    def xpose_wh(y):                          # (B,32,23,T) -> (B,32,T,23)
        return jnp.swapaxes(y, 2, 3)

    cases = {
        "pool_reshape": (mk_pool(pool_reshape_kernel, False),
                         (BATCH, 32, F_Y, T3)),
        "pool_strided": (mk_pool(pool_strided_kernel, False),
                         (BATCH, 32, F_Y, T3)),
        "pool_sublane": (mk_pool(pool_sublane_kernel, True),
                         (BATCH, 32, T3, F_Y)),
        "geg_write": (geg_write, (32, 24, BATCH, T3)),
        "conv2_nchw": (conv2_nchw, (BATCH, 32, 24, T3)),
        "conv2_chnw_in": (conv2_chnw_in, (32, 24, BATCH, T3)),
        "conv2_ncwh_out": (conv2_ncwh_out, (BATCH, 32, 24, T3)),
        "xpose_wh": (xpose_wh, (BATCH, 32, F_Y, T3)),
    }
    sel = os.environ.get("PROBE_SEL")
    if sel:
        cases = {k: v for k, v in cases.items() if k in sel.split(",")}

    print(f"batch={BATCH} g={G} V={V} T={T3} bf16 slope K={K_LO}->{K_HI}",
          flush=True)
    for name, (f, shape) in cases.items():
        try:
            x1 = jax.device_put(
                rng.standard_normal(shape, dtype=np.float32) * 0.3)
            # build the K independent slices on-device (host f64 gen +
            # tunnel transfer of the full stack is minutes-slow)
            xs = jax.jit(lambda a: jnp.stack(
                [(a * (1.0 + 1e-3 * i)).astype(jnp.bfloat16)
                 for i in range(K_HI)]))(x1)
            del x1

            def chained(xs_in, f=f):
                def body(c, xi):
                    return c, jnp.sum(f(xi).astype(jnp.float32))
                _, out = jax.lax.scan(body, 0, xs_in)
                return jnp.sum(out)

            jf = jax.jit(chained)
            ts = {}
            for k in (K_LO, K_HI):
                xk = xs[:k]
                t0 = time.perf_counter()
                float(jf(xk))
                tc = time.perf_counter() - t0
                vals = []
                t0 = time.perf_counter()
                for _ in range(5):
                    vals.append(float(jf(xk)))
                ts[k] = (time.perf_counter() - t0) / 5
            dt = (ts[K_HI] - ts[K_LO]) / (K_HI - K_LO)
            gb = float(np.prod(shape)) * 2 / 1e9
            print(f"{name:15s} {dt * 1e3:8.3f} ms/iter   "
                  f"{gb / max(dt, 1e-9):6.0f} GB/s in-rate   "
                  f"(calls {ts[K_LO]*1e3:.0f}/{ts[K_HI]*1e3:.0f} ms, "
                  f"compile {tc:.0f}s)", flush=True)
            del xs
        except Exception as e:
            print(f"{name:15s} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
