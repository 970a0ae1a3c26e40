"""Round-2 kernel probe: block0 fused kernel v2 (BlockSpec-pipelined).

Round-1 verdict (docs/PERF.md): the v1 fused block kernel is correct but
~2x SLOWER than XLA on block0 (226 vs 94-116 ms at B=256), with ~130-250us
of fixed cost per grid step against ~45us of MXU work.  v1 hand-rolls its
phase-slab fetches with pltpu.make_async_copy + revolving buffers; the
measured probes showed prefetching made it *worse*, consistent with the
manual DMA waits acting as drains rather than overlapped completions.

v2 hypothesis: let pallas_call's own BlockSpec pipeline do ALL data
movement (it double-buffers in/out blocks with library-managed semaphores)
and handle the conv halo with a ring-carry held in VMEM scratch across
grid steps:

  * main input blocks are NON-overlapping (3, c_in, G, 32, u) tiles at
    256-col offset; the first 256 cols arrive via a second BlockSpec view
    of the same array (block index 0, refetch skipped while unchanged);
  * per step: scratch[:256] <- carry (prev step's cols [u:u+256]) or the
    head block at jj==0; scratch[256:256+u] <- new block; then v1's exact
    polyphase compute body on the scratch window.

Usage:
  python tools/probe_block0.py cpu    # interpreter correctness check
  python tools/probe_block0.py tpu    # timing vs the XLA path
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from aasist_tpu.ops.fused_resblock import (  # noqa: E402
    FusedBlockParams, _selu, to_encoder_major, from_encoder_major)
from aasist_tpu.models import layers as L  # noqa: E402
from aasist_tpu import nn  # noqa: E402


def _kernel_v2(x_main, x_head, w1, sb1, w2, b2, wd, bd, out_ref, xs,
               *, c_in: int, c_out: int, f_in: int, g: int, u: int,
               t_global: int, has_down: bool, acc_dtype):
    """One (batch-group, output-time-tile) grid step, BlockSpec-fed.

    x_main: (3, c_in, g, 32, u) new columns for this step
    x_head: (3, c_in, g, 32, 256) cols [0,256) of this bg's padded input
    xs:     (3, c_in, g, 32, u + 256) ring scratch; col w of phase q holds
            padded[3*(j*u + w) + q - 6] by the time compute runs
    """
    j = pl.program_id(1)
    f1 = f_in + 1
    u_y = u + 128

    # ---- ring carry: establish cols [0, 256) --------------------------
    @pl.when(j == 0)
    def _load_head():
        xs[:, :, :, :, 0:256] = x_head[...]

    @pl.when(j != 0)
    def _carry():
        xs[:, :, :, :, 0:256] = xs[:, :, :, :, u:u + 256]

    # ---- new columns [256, 256 + u) -----------------------------------
    xs[:, :, :, :, 256:256 + u] = x_main[...]

    def xph(d: int, f_lo: int, f_hi: int, width: int):
        q = d % 3
        m = 2 + (d - q) // 3
        return xs[q, :, :, f_lo:f_hi, m:m + width]

    def tap_dot(w_tap, piece):
        return lax.dot_general(
            w_tap, piece, (((0,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)

    taps6 = [(df, dt) for df in range(2) for dt in range(3)]

    # ---- conv1 + folded bn + selu, three phases ------------------------
    y1ph = []
    for q in range(3):
        if c_in == 1:
            patches = jnp.concatenate(
                [xph(q - 4 + dt, df, df + f1, u_y)
                 for df, dt in taps6], axis=0)
            w6 = jnp.concatenate([w1[df, dt] for df, dt in taps6], axis=0)
            acc = tap_dot(w6, patches)
        else:
            acc = None
            for df, dt in taps6:
                piece = xph(q - 4 + dt, df, df + f1, u_y)
                contrib = tap_dot(w1[df, dt], piece)
                acc = contrib if acc is None else acc + contrib
        acc = (acc + sb1[...].astype(acc_dtype)).astype(xs.dtype)
        acc = _selu(acc)
        col = lax.broadcasted_iota(jnp.int32, (1, 1, 1, u_y), 3)
        gidx = 3 * (j * u + col) + q - 3
        mask = ((gidx >= 0) & (gidx < t_global)).astype(acc.dtype)
        y1ph.append(acc * mask)

    # ---- conv2 (tap-stacked) + identity + pool -------------------------
    w2all = jnp.concatenate([w2[df, dt] for df, dt in taps6], axis=0)
    pooled = None
    for p in range(3):
        pieces = []
        for df, dt in taps6:
            e = p + 2 + dt
            q = e % 3
            o = (e - q) // 3
            pieces.append(y1ph[q][:, :, df:df + f_in, o:o + u])
        acc = tap_dot(w2all, jnp.concatenate(pieces, axis=0))
        acc = acc + b2[...].astype(acc_dtype)
        if has_down:
            patches = jnp.concatenate(
                [xph(p - 1 + dt, 1, 1 + f_in, u) for dt in range(3)],
                axis=0)
            w3 = jnp.concatenate([wd[dt] for dt in range(3)], axis=0)
            ident = tap_dot(w3, patches) + bd[...].astype(acc_dtype)
        else:
            ident = xph(p, 1, 1 + f_in, u).astype(acc_dtype)
        s = acc + ident
        pooled = s if pooled is None else jnp.maximum(pooled, s)

    out_ref[...] = pooled.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8))
def _run_v2(x_view, packed, c_in, c_out, f_in, g, u, t_global, interpret):
    w1, sb1, w2, b2, wd, bd = packed
    has_down = wd is not None
    if wd is None:
        wd = jnp.zeros((3, c_in, c_out), x_view.dtype)
        bd = jnp.zeros((c_out, 1, 1, 1), jnp.float32)
    batch = x_view.shape[2]
    n_tiles = (x_view.shape[4] - 256) // u

    kernel = functools.partial(
        _kernel_v2, c_in=c_in, c_out=c_out, f_in=f_in, g=g, u=u,
        t_global=t_global, has_down=has_down, acc_dtype=jnp.float32)

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(batch // g, n_tiles),
        in_specs=[
            # main: non-overlapping u-col tiles, offset by one u-block
            # (cols [0, 256) arrive via the head spec; u must be 256 so
            # the head block is exactly one block of the same array)
            pl.BlockSpec((3, c_in, g, 32, u),
                         lambda bb, jj: (0, 0, bb, 0, jj + 1),
                         memory_space=pltpu.VMEM),
            # head: cols [0, 256), same array, block 0 (u == 256 only)
            pl.BlockSpec((3, c_in, g, 32, 256),
                         lambda bb, jj: (0, 0, bb, 0, 0),
                         memory_space=pltpu.VMEM),
            vmem(), vmem(), vmem(), vmem(), vmem(), vmem(),
        ],
        out_specs=pl.BlockSpec((c_out, g, f_in, u),
                               lambda bb, jj: (0, bb, 0, jj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (c_out, batch, f_in, n_tiles * u), x_view.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, c_in, g, 32, u + 256), x_view.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x_view, x_view, w1, sb1, w2, b2, wd, bd)
    return out


def fused_block_v2(x_em, fp: FusedBlockParams, g: int = 8, u: int = 256,
                   interpret: bool = False):
    c_in, b, f_in, t = x_em.shape
    t_out_total = t // 3
    n_tiles = -(-t_out_total // u)
    t_out_pad = n_tiles * u
    total = 3 * (t_out_pad + 256)
    x_padded = jnp.pad(x_em, ((0, 0), (0, 0), (1, 32 - f_in - 1),
                              (6, total - 6 - t)))
    x_view = jnp.transpose(
        x_padded.reshape(c_in, b, 32, total // 3, 3), (4, 0, 1, 2, 3))
    out = _run_v2(x_view, fp.packed(), c_in, fp.c_out, f_in, g, u, t,
                  interpret)
    return out[:, :, :, :t_out_total]


# ------------------------------------------------------------------ driver
def make_block(c_in, c_out, key):
    p, s = L.residual_block_init(key, c_in, c_out, first=(c_in == 1))
    # non-trivial BN stats so folding is exercised
    if "bn2" in s:
        s["bn2"]["mean"] = 0.1 * jnp.arange(c_out, dtype=jnp.float32)
        s["bn2"]["var"] = 1.0 + 0.05 * jnp.arange(c_out, dtype=jnp.float32)
    return p, s


def check_cpu():
    key = jax.random.PRNGKey(0)
    for (c_in, c_out, b, t) in ((1, 32, 4, 3 * 999), (1, 32, 2, 3 * 512)):
        p, s = make_block(c_in, c_out, key)
        x = jax.random.normal(key, (b, c_in, 23, t), jnp.float32)
        ref, _ = L.residual_block_apply(p, s, x, first=(c_in == 1),
                                        train=False)
        fp = FusedBlockParams(p, s, c_in, c_out, dtype=jnp.float32)
        got = from_encoder_major(
            fused_block_v2(to_encoder_major(x), fp, g=2, u=256,
                           interpret=True))
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"c_in={c_in} t={t}: max err {err:.2e} "
              f"shapes {got.shape} vs {ref.shape}")
        assert got.shape == ref.shape
        assert err < 2e-4, err
    print("CPU interpreter check OK")


def time_tpu():
    import os
    B, T = int(os.environ.get("PROBE_B", 128)), 21490
    key = jax.random.PRNGKey(0)
    p, s = make_block(1, 32, key)
    x = (jax.random.normal(key, (B, 1, 23, T), jnp.float32)
         .astype(jnp.bfloat16))

    def sync(v):
        return float(jnp.sum(v.astype(jnp.float32)))

    # XLA path
    cast = lambda t_: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), t_)
    pb, sb = cast(p), cast(s)
    xla = jax.jit(lambda pp, ss, xx: L.residual_block_apply(
        pp, ss, xx, first=True, train=False)[0])
    r = xla(pb, sb, x)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(6):
        sync(xla(pb, sb, x))
    t_xla = (time.perf_counter() - t0) / 6
    print(f"XLA block0: {1e3 * t_xla:.1f} ms/call (incl ~27ms RPC)")

    fp = FusedBlockParams(p, s, 1, 32, dtype=jnp.bfloat16)
    for g in (8, 16):
        try:
            em = jax.jit(lambda xx: fused_block_v2(
                to_encoder_major(xx), fp, g=g, u=256))
            r2 = em(x)
            sync(r2)
            t0 = time.perf_counter()
            for _ in range(6):
                sync(em(x))
            t_v2 = (time.perf_counter() - t0) / 6
            print(f"v2 fused block0 (G={g}): {1e3 * t_v2:.1f} ms/call")
        except Exception as e:
            print(f"v2 G={g} FAILED: {type(e).__name__}: "
                  f"{str(e)[:400]}")

    # numerical check on-device (bf16 tolerance)
    ref = xla(pb, sb, x)
    got = from_encoder_major(jax.jit(lambda xx: fused_block_v2(
        to_encoder_major(xx), fp, g=8, u=256))(x))
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"on-device max err vs XLA: {err:.3e}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    if mode == "cpu":
        check_cpu()
    else:
        time_tpu()
