"""Fused frontend + first residual block as a Pallas kernel pair.

Covers the AASIST inference prefix (reference models/AASIST.py:823-838,
RawNetGatSpoofST.py:258-278 block geometry):

    sinc-conv(70x129) -> |.| -> maxpool(3,3) -> BN -> SELU       (frontend)
    -> conv1(1->C,(2,3)) -> BN -> SELU -> conv2(C->C,(2,3))
       + downsample(1->C,(1,3)) -> maxpool(1,3)                  (block 0)

at batch 256 this prefix is ~66% of the whole XLA forward (block0 alone
~60%), with 8+ GB of HBM intermediates.  STATUS: numerically correct on
device (bf16-rounding parity) but measured at 136 ms vs ~106 ms for
XLA's fe+b0 — the kernel is VMEM-bandwidth-bound on its f32 epilogue
and scratch re-buffering, and Mosaic rejects the bf16 epilogue that
would halve that traffic; OFF by default, kept as the documented
measurement trail (docs/PERF.md round 2).  Design notes (every choice
pinned by a measured number):

  * MOD-9 POLYPHASE INPUT.  Every maxpool(stride 3) forces stride-3 data
    access *somewhere*; Mosaic cannot lower lane strides and XLA does it
    at gather speed.  Solution: deinterleave the RAW waveform once, mod
    3^2 (35 MB — cheap), and keep every downstream access contiguous:
    the frontend consumes x mod-9 planes and emits its pooled output
    already split into mod-3 phase planes, exactly what block0's pooled
    convolutions need.  The cascade stops there: block0 writes standard
    (B, C, 23, T/3) stride-1 output for the XLA encoder tail.
  * ONE-DOT FRONTEND: all 3 output phases x 3 pool candidates x 70
    filters in a single K=144, M=630 contraction (measured 98 TF/s vs
    63 TF/s for the per-phase K=132/M=210 form).  Time pool = max over
    pool-candidate row blocks; freq pool = leading-dim row-triple max;
    BN folds to two scalars (SMEM).
  * R-PACKED conv2: output pool phases r ride in the result rows
    (M = 3C), so the trailing maxpool(1,3) is a row-block max.  The
    (off, df) tap structure is decomposed into one dense K=3C dot plus
    two small K=C dots per freq-tap, whose operands are zero-copy
    SLICES of the in-VMEM y1 phase planes (measured: K=96/M=96 runs at
    81 TF/s; enumerating taps in K (K=384) is faster per-FLOP but needs
    a 4x VMEM im2col copy that costs more than it saves).
  * conv1 and downsample share one K=18 dot (both read the same z
    planes; ds taps are the df=1 column subset), M = 2*(3C) packed.
  * Halo columns beyond a phase plane's true extent are masked to zero
    (conv1's folded BN shift makes them selu(shift) != 0 otherwise —
    the reference zero-pads, so unmasked halos corrupt tile edges).

Training keeps the XLA path (no VJP); eval opts in via
``use_fused_stack`` in model_config.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aasist_tpu.nn import BN_EPS

_SELU_L = 1.0507009873554805
_SELU_A = 1.6732632423543772

KSIZE = 129                 # sinc taps
M9 = (3 * 2 + 2 + KSIZE - 1) // 9       # 15: max mod-9 offset
KF = 9 * (M9 + 1)           # 144: frontend contraction (j, m')
H9 = M9 + 1                 # x9 tile halo columns


def _selu(x):
    zero = jnp.zeros((), x.dtype)
    return (_SELU_L * jnp.maximum(x, zero)
            + (_SELU_L * _SELU_A) * (jnp.exp(jnp.minimum(x, zero)) - 1.0))


# =====================================================================
# weight packing (host-side numpy; all shapes tiny)
# =====================================================================
def pack_w_frontend(bank: np.ndarray) -> np.ndarray:
    """(C,129) filterbank -> (KF, 3*3*C) phase-packed weights.

    W[(j*? ...)]: rows (j, m') with x9[j][v+m'] = x[9(v+m') + j]; cols
    (q', p, f): y_sample = 9v + 3q' + p + k  =>  k = 9m' + j - 3q' - p.
    """
    c, k = bank.shape
    assert k == KSIZE
    w = np.zeros((KF, 9 * c), bank.dtype)
    for j in range(9):
        for mp in range(M9 + 1):
            row = j * (M9 + 1) + mp
            for qp in range(3):
                for p in range(3):
                    kk = 9 * mp + j - 3 * qp - p
                    if 0 <= kk < KSIZE:
                        col = (qp * 3 + p) * c
                        w[row, col:col + c] += bank[:, kk]
    return w


def _fold_bn(bn_p, bn_s, conv_bias):
    f32 = np.float32
    inv = 1.0 / np.sqrt(np.asarray(bn_s["var"], f32) + BN_EPS)
    s = np.asarray(bn_p["weight"], f32) * inv
    t = (np.asarray(bn_p["bias"], f32)
         - np.asarray(bn_s["mean"], f32) * s
         + np.asarray(conv_bias, f32) * s)
    return s, t


def pack_w1ds(p, s) -> Tuple[np.ndarray, np.ndarray]:
    """conv1 (+folded bn2) and downsample -> (18, 6C) dot weights + shift.

    Rows (jz, mz, df): jz in 0..2, mz in {-1,0,1}, df in 0..1; the row
    holds z_jz[f + df - 1, u + mz].  Cols: conv1 (q''*C + co) then ds
    (r*C + co).  conv1: z-index = 3u + q'' + dt - 1 = 3(u + mz) + jz.
    ds (kernel (1,3), reads f exactly => df=1 rows): same time algebra
    with r in place of q''.
    """
    w1 = np.asarray(p["conv1"]["weight"], np.float32)      # (C,1,2,3)
    c = w1.shape[0]
    scale, shift1 = _fold_bn(p["bn2"], s["bn2"],
                             p["conv1"].get("bias", np.zeros(c)))
    w1 = w1 * scale[:, None, None, None]
    wd = np.asarray(p["conv_downsample"]["weight"], np.float32)  # (C,1,1,3)
    bd = np.asarray(p["conv_downsample"].get("bias", np.zeros(c)),
                    np.float32)

    w = np.zeros((18, 6 * c), np.float32)
    for q in range(3):          # q'' (conv1) / r (ds)
        for dt in range(3):
            e = q + dt - 1
            jz, mz = e % 3, (e - e % 3) // 3        # mz in {-1,0,1}
            for df in range(2):
                row = (jz * 3 + (mz + 1)) * 2 + df
                # conv1: f-read = fo + df - 1 -> A row slice [df:df+24]
                w[row, q * c:(q + 1) * c] += w1[:, 0, df, dt]
            # ds: f-read = fo -> df=1 slice rows
            row = (jz * 3 + (mz + 1)) * 2 + 1
            w[row, 3 * c + q * c:3 * c + (q + 1) * c] += wd[:, 0, 0, dt]
    shift = np.concatenate([np.tile(shift1, 3),
                            np.tile(bd, 3)]).reshape(6 * c, 1, 1, 1)
    return w, shift


def pack_w2(p) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """conv2 -> off-split dot weights.

    Returns (w_off0 (2, 3C, 3C), w_m1 (2, C, C), w_p1 (2, C, C), b2).
    Entry [(jy*C+ci),(r*C+co)] = w2[co,ci,df,dt] with dt = (jy+1-r) % 3
    and off = (r + dt - 1 - jy)/3; off=-1 is only (r=0,jy=2,dt=0), off=1
    only (r=2,jy=0,dt=2).
    """
    w2 = np.asarray(p["conv2"]["weight"], np.float32)      # (C,C,2,3)
    c = w2.shape[0]
    b2 = np.asarray(p["conv2"].get("bias", np.zeros(c)), np.float32)
    w0 = np.zeros((2, 3 * c, 3 * c), np.float32)
    wm1 = np.zeros((2, c, c), np.float32)
    wp1 = np.zeros((2, c, c), np.float32)
    for df in range(2):
        for r in range(3):
            for jy in range(3):
                dt = (jy + 1 - r) % 3
                off = (r + dt - 1 - jy) // 3
                blk = w2[:, :, df, dt].T       # (ci, co)
                if off == 0:
                    w0[df, jy * c:(jy + 1) * c, r * c:(r + 1) * c] = blk
                elif off == -1:
                    wm1[df] = blk              # (r=0, jy=2)
                else:
                    wp1[df] = blk              # (r=2, jy=0)
    b2v = np.tile(b2, 3).reshape(3 * c, 1, 1, 1)
    return w0, wm1, wp1, b2v


# =====================================================================
# frontend kernel: x mod-9 planes -> z mod-3 phase planes
# =====================================================================
def _fe_kernel(xt, w, sc, out_ref, a_scr, *, g: int, u: int, c: int,
               t_z: int):
    """One (batch-group, v-tile) step.

    xt: (1, 9, G, U+H9) mod-9 split waveform tile
    w:  (KF, 9*C) packed filterbank
    sc: (1, 2) folded BN scale/shift (SMEM)
    out:(G, 96, U) z phase planes, rows q'*32 + 1 + f (f in 0..22),
        rows q'*32 + {0, 24..31} zero
    """
    for j in range(9):
        for mp in range(M9 + 1):
            a_scr[j * (M9 + 1) + mp] = xt[0, j, :, mp:mp + u]

    y = lax.dot_general(w[...], a_scr[...], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    y = jnp.abs(y)                              # (9C, G, U)
    y = y.reshape(3, 3, c, g, u)
    yp = jnp.max(y, axis=1)                     # pool candidates (p)
    f_out = c // 3
    yf = yp[:, :3 * f_out].reshape(3, f_out, 3, g, u)
    pooled = jnp.max(yf, axis=2)                # (3, f_out, G, U)

    z = pooled * sc[0, 0] + sc[0, 1]
    z = _selu(z)

    # mask beyond each phase plane's true extent: valid iff 3v + q' < Tz
    j_tile = pl.program_id(1)
    col = lax.broadcasted_iota(jnp.int32, (1, 1, 1, u), 3)
    qp = lax.broadcasted_iota(jnp.int32, (3, 1, 1, 1), 0)
    v = j_tile * u + col
    mask = (3 * v + qp < t_z).astype(z.dtype)
    z = (z * mask).astype(out_ref.dtype)        # (3, f_out, G, U)

    for gg in range(g):
        blk = jnp.pad(z[:, :, gg], ((0, 0), (1, 32 - f_out - 1), (0, 0)))
        out_ref[gg] = blk.reshape(96, u)


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _fe_run(xt, w, sc, g: int, u: int, c: int, t_z: int):
    n_tiles, b = xt.shape[0], xt.shape[2]
    kernel = functools.partial(_fe_kernel, g=g, u=u, c=c, t_z=t_z)
    return pl.pallas_call(
        kernel,
        grid=(b // g, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 9, g, xt.shape[3]),
                         lambda bb, jj: (jj, 0, bb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((g, 96, u), lambda bb, jj: (bb, 0, jj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 96, xt.shape[0] * u), xt.dtype),
        scratch_shapes=[pltpu.VMEM((KF, g, u), xt.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_use_interpret(),
    )(xt, w, sc)


# =====================================================================
# block0 kernel: z mod-3 planes -> pooled block output (stride-1)
# =====================================================================
def _b0_kernel(zt, w1, sb1, w0, wm1, wp1, b2, out_ref, a1_scr, a20_scr,
               a21_scr, am10_scr, am11_scr, ap10_scr, ap11_scr, ds_scr,
               s_scr, *, g: int, u: int, c: int, t_z: int):
    """One (batch-group, v'-tile) step.

    zt: (1, G, 96, U+4) z phase planes, tile cols c0 <-> u_g = j*U-2+c0
    w1: (18, 6C) conv1+ds packed; sb1 (6C,1,1,1) shifts
    w0/wm1/wp1/b2: conv2 off-split weights
    out:(G, C, 23, U)

    Layout rules learned by ablation (docs/PERF.md round 2):
      * every dot operand is a FULL (unsliced) scratch buffer — offset
        slice views break the merged lane axis and the dot degenerates
        into per-(g, f) row loops;
      * every free-dim block uses f = 24 (a sublane-tile multiple) —
        f = 23 leaves physical padding between blocks, which also
        prevents the merge;
      * intermediates are bf16 (the conv1 dot result alone is 24 MB/step
        in f32, and VMEM bandwidth — not the MXU — was the bottleneck);
        this matches the XLA path, whose inter-conv tensors are bf16;
      * small-dot results are accumulated into row slices of an f32
        scratch instead of jnp.pad (each pad materialised 9 MB of
        zeros per step).
    a1 (18, G, 24, uy); a20/a21 (3C, G, 24, U) conv2 df=0/1 off=0;
    am1/ap1 (2, C, G, 24, U) off=-1/+1 per df; ds (3C, G, 24, U);
    s (3C, G, 24, U) f32.
    """
    uy = a1_scr.shape[3]                    # u + 2 rounded up
    # zero the alignment tail once per step: the dot reads all uy
    # columns and uninitialised VMEM could hold inf/NaN, which the
    # validity mask cannot scrub (NaN * 0 = NaN)
    if uy > u + 2:
        a1_scr[:, :, :, u + 2:uy] = jnp.zeros(
            (18, g, 32, uy - u - 2), a1_scr.dtype)
    # ---- A1: rows (jz, mz+1, df) = z[jz*32+df : +32, (1+mz) : +u+2] ----
    # f-extent 32 (sublane-tile multiple; zt is row-padded to 104 by the
    # host glue so jz=2/df=1 can read rows [65:97])
    for jz in range(3):
        for mzp in range(3):                # mz = mzp - 1
            for df in range(2):
                row = (jz * 3 + mzp) * 2 + df
                a1_scr[row, :, :, 0:u + 2] = \
                    zt[0, :, jz * 32 + df:jz * 32 + df + 32,
                       mzp:mzp + u + 2]

    # conv1+ds in one dot; bf16 output + bf16 epilogue (XLA-path
    # rounding: its inter-conv tensors are bf16 too)
    y = lax.dot_general(w1[...], a1_scr[...], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    # f32 epilogue: the bf16 form (bf16 broadcast-add + bf16 selu over a
    # rank-5 view) is rejected by the Mosaic compiler — construct bisect
    # in tools/probe_b0_constructs.py
    y = y + sb1[...]

    # ---- conv1 rows: selu + validity mask (y1[u] valid iff
    # 0 <= 3u + jy < Tz, u = j*U - 1 + col) ----
    j_tile = pl.program_id(1)
    col = lax.broadcasted_iota(jnp.int32, (1, 1, 1, uy), 3)
    jy = lax.broadcasted_iota(jnp.int32, (3, 1, 1, 1), 0)
    uu = j_tile * u - 1 + col
    valid = ((uu >= 0) & (3 * uu + jy < t_z) & (col < u + 2))
    y1 = _selu(y[:3 * c].reshape(3, c, g, 32, uy))
    y1 = y1 * valid[:, None].astype(y1.dtype)
    y1 = y1.reshape(3 * c, g, 32, uy).astype(a20_scr.dtype)
    a20_scr[...] = y1[:, :, 0:24, 1:1 + u]
    a21_scr[...] = y1[:, :, 1:25, 1:1 + u]
    am10_scr[...] = y1[2 * c:3 * c, :, 0:24, 0:u]
    am11_scr[...] = y1[2 * c:3 * c, :, 1:25, 0:u]
    ap10_scr[...] = y1[0:c, :, 0:24, 2:2 + u]
    ap11_scr[...] = y1[0:c, :, 1:25, 2:2 + u]
    ds_scr[...] = y[3 * c:, :, 0:24, 1:1 + u].astype(ds_scr.dtype)

    # ---- conv2: one dense dot + two small dots per df; accumulate in
    # an f32 scratch via row slices (no pads); ds + bias; r-block max --
    part0 = lax.dot_general(w0[0], a20_scr[...], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    part1 = lax.dot_general(w0[1], a21_scr[...], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s_scr[...] = part0 + part1
    # off=-1: rows jy=2 -> out rows r=0;  off=+1: jy=0 -> r=2
    pm = (lax.dot_general(wm1[0], am10_scr[...], (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
          + lax.dot_general(wm1[1], am11_scr[...], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32))
    s_scr[0:c] = s_scr[0:c] + pm
    pp = (lax.dot_general(wp1[0], ap10_scr[...], (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
          + lax.dot_general(wp1[1], ap11_scr[...], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32))
    s_scr[2 * c:3 * c] = s_scr[2 * c:3 * c] + pp

    # pooled = max_r (s_r + ds_r) + b2   (b2 identical across r)
    m = None
    for r in range(3):
        term = (s_scr[r * c:(r + 1) * c]
                + ds_scr[r * c:(r + 1) * c].astype(jnp.float32))
        m = term if m is None else jnp.maximum(m, term)
    pooled = m + b2[0:c]                    # (C, G, 24, U)

    for gg in range(g):
        out_ref[gg] = pooled[:, gg, 0:23, :].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10))
def _b0_run(zt, w1, sb1, w0, wm1, wp1, b2, g: int, u: int, c: int,
            t_z: int):
    n_tiles, b = zt.shape[0], zt.shape[1]
    uy = u + 2 + (-(u + 2) % 128)
    kernel = functools.partial(_b0_kernel, g=g, u=u, c=c, t_z=t_z)
    return pl.pallas_call(
        kernel,
        grid=(b // g, n_tiles),
        in_specs=[
            pl.BlockSpec((1, g, 104, zt.shape[3]),
                         lambda bb, jj: (jj, bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((g, c, 23, u), lambda bb, jj: (bb, 0, 0, jj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, 23, n_tiles * u), zt.dtype),
        scratch_shapes=[
            pltpu.VMEM((18, g, 32, uy), zt.dtype),
            pltpu.VMEM((3 * c, g, 24, u), zt.dtype),
            pltpu.VMEM((3 * c, g, 24, u), zt.dtype),
            pltpu.VMEM((c, g, 24, u), zt.dtype),
            pltpu.VMEM((c, g, 24, u), zt.dtype),
            pltpu.VMEM((c, g, 24, u), zt.dtype),
            pltpu.VMEM((c, g, 24, u), zt.dtype),
            pltpu.VMEM((3 * c, g, 24, u), zt.dtype),
            pltpu.VMEM((3 * c, g, 24, u), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_use_interpret(),
    )(zt, w1, sb1, w0, wm1, wp1, b2)


# =====================================================================
# host glue + public API
# =====================================================================
class FusedStackParams:
    """Packed weights for the frontend + block0 pair (eval, bf16)."""

    def __init__(self, bank, fe_bn_p, fe_bn_s, b0_p, b0_s,
                 dtype=jnp.bfloat16):
        bank = np.asarray(bank, np.float32)
        self.c_bank = bank.shape[0]
        self.w_fe = jnp.asarray(pack_w_frontend(bank), dtype)
        inv = 1.0 / np.sqrt(np.asarray(fe_bn_s["var"], np.float32)
                            + BN_EPS)
        sc = np.asarray(fe_bn_p["weight"], np.float32) * inv
        sh = (np.asarray(fe_bn_p["bias"], np.float32)
              - np.asarray(fe_bn_s["mean"], np.float32) * sc)
        self.sc_fe = jnp.asarray(
            np.stack([sc[0], sh[0]]).reshape(1, 2), jnp.float32)
        w1, sb1 = pack_w1ds(b0_p, b0_s)
        self.w1 = jnp.asarray(w1, dtype)
        self.sb1 = jnp.asarray(sb1, jnp.float32)
        w0, wm1, wp1, b2 = pack_w2(b0_p)
        self.w0 = jnp.asarray(w0, dtype)
        self.wm1 = jnp.asarray(wm1, dtype)
        self.wp1 = jnp.asarray(wp1, dtype)
        self.b2 = jnp.asarray(b2, jnp.float32)
        self.c_out = w0.shape[1] // 3


def fused_frontend_block0(x: jnp.ndarray, fsp: FusedStackParams,
                          *, u_fe: int = 512, u_b0: int = 1024,
                          g_fe: int = 8, g_b0: int = 1) -> jnp.ndarray:
    """(B, L) waveform -> (B, C, 23, (L-128)//9 pooled) block0 output.

    Exact replacement (to bf16 rounding) for the XLA chain
    frontend + residual_block_apply(first=True, train=False).
    """
    b, length = x.shape
    c_bank = fsp.c_bank
    t1 = length - KSIZE + 1
    t_z = t1 // 3                       # frontend pooled extent
    v_z = -(-t_z // 3)                  # z plane length (max, q'=0)
    t_out = t_z // 3                    # block0 pooled extent

    # ---- frontend: mod-9 split + tiles ----
    while u_fe > 128 and u_fe > v_z:
        u_fe //= 2
    nt = -(-v_z // u_fe)
    vtot = nt * u_fe + H9
    g_fe = min(g_fe, b)
    while b % g_fe:
        g_fe -= 1
    xp = jnp.pad(x, ((0, 0), (0, max(0, 9 * vtot - length))))[:, :9 * vtot]
    xq = jnp.transpose(xp.reshape(b, vtot, 9), (2, 0, 1))
    xt = jnp.stack([xq[:, :, j * u_fe:j * u_fe + u_fe + H9]
                    for j in range(nt)], axis=0)   # (nt, 9, B, U+H9)

    z_all = _fe_run(xt, fsp.w_fe, fsp.sc_fe, g_fe, u_fe, c_bank, t_z)
    # z_all: (B, 96, nt*u_fe)

    # ---- block0: overlapping tiles with halo 2 ----
    while u_b0 > 128 and u_b0 > t_out:
        u_b0 //= 2
    nt2 = -(-t_out // u_b0)
    g_b0 = min(g_b0, b)
    while b % g_b0:
        g_b0 -= 1
    need = nt2 * u_b0 + 2
    zb = jnp.pad(z_all, ((0, 0), (0, 8),
                         (2, max(0, need - z_all.shape[2]))))
    zt = jnp.stack([zb[:, :, j * u_b0:j * u_b0 + u_b0 + 4]
                    for j in range(nt2)], axis=0)  # (nt2, B, 96, U+4)

    out = _b0_run(zt, fsp.w1, fsp.sb1, fsp.w0, fsp.wm1, fsp.wp1, fsp.b2,
                  g_b0, u_b0, fsp.c_out, t_z)
    return out[:, :, :, :t_out]
