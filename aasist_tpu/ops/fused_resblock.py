"""Fused residual-block Pallas kernel (inference hot path).

The original AASIST/RawGAT encoder block (conv(2,3) -> bn -> selu ->
conv(2,3) -> +identity/downsample -> maxpool(1,3); see
aasist_tpu/models/layers.py:residual_block_apply and the reference at
/root/reference/models/RawNetGatSpoofST.py:225-278) dominates model
runtime and is memory-bound when unfused: at batch 256 the XLA lowering
materialises ~8 GB of intermediates per block in HBM — ~40 GB of traffic
for 1.6 TFLOP of work in block0.

This kernel computes the whole block per (batch-group, time-tile) grid
step with all intermediates in VMEM: HBM sees one phase-separated read of
the input slab and one contiguous write of the pooled output.

Design notes (each shaped by a measured bottleneck or a Mosaic lowering
constraint — the measurement trail is in docs/PERF.md):
  * POLYPHASE (radix-3) time decomposition.  The trailing maxpool(1,3)
    makes every natural formulation need stride-3 lane access, which
    Mosaic cannot lower (strided slices become gathers; minor-dim split
    reshapes like (T) -> (T/3, 3) are rejected).  The input arrives as
    THREE phase slabs x_q[w] = x[3w + q], conv1 produces three phase
    outputs y1_q, conv2 produces the three pool candidates s_p, and the
    pool is an elementwise max(s_0, s_1, s_2).  Every VMEM access is a
    contiguous slice.
  * REVOLVING-BUFFER DMA PIPELINE: step k computes from slab set k%2
    while prefetching step k+1 into set (k+1)%2 (scratch persists across
    grid steps).  Without it each of the ~1-2k grid steps stalled on its
    fetch, which dominated the kernel.  The traced parity selects between
    two statically-indexed compute branches via pl.when.
  * TAP-STACKED CONTRACTIONS: conv2's 6 taps form one K=6*C dot
    ((6C, C) x (6C, G, F, T)) — at K=N=C the MXU runs at (K/128)(N/128)
    of peak, so stacking taps in K quadruples the arithmetic rate for
    C=32 at the cost of bf16 concat copies.
  * BATCH GROUPING: G batch rows ride along as a free dim of every
    contraction, multiplying DMA sizes and MXU work per grid step.
  * ENCODER-MAJOR LAYOUT (C, B, F, T): the batch-group slab is one
    contiguous DMA; entry/exit transposes happen once around the whole
    encoder; the per-block phase transform is XLA (pad+reshape+transpose
    to (3, C, B, 32, W)) — a minor phase dim would be tile-padded 3->128
    in HBM.
  * Mosaic alignment: conv dots merge their (G, F, T') free dims and need
    the minor dim to be a 128 multiple -> y1 computed at width u+128
    (tail masked), tile widths multiples of 128, DMA lane extents
    128-aligned (w_x = u + 256), DMA sublane extents multiples of 8 ->
    freq padded 25 -> 32.
  * block0 has C_in=1 — a degenerate K=1 contraction Mosaic rejects; its
    6 conv1 taps stack into one K=6 dot.
  * bf16 epilogue: shift+selu+mask run in bf16 (half the VPU bytes); the
    VPU rejects bf16 compare/select, so selu is min/max algebra and the
    edge mask is a bool->bf16 multiply.
  * BN folds into conv1 (scale into taps, shift pre-shaped (C,1,1,1);
    in-kernel lane->sublane reshapes are unsupported relayouts).
    Reference quirk kept: bn1's pre-activation is discarded by the
    reference, so bn1 does not exist at inference.
  * conv2's zero time-padding must see ZEROS outside the true sequence;
    y1 halo columns are conv1-of-padded-x (selu(shift) != 0) and are
    masked by global position.

Training keeps the reference XLA path (this kernel has no VJP); eval
models opt in via ``use_fused_encoder``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aasist_tpu.nn import BN_EPS

_SELU_L = 1.0507009873554805
_SELU_A = 1.6732632423543772


def _selu(x):
    # Mosaic has no expm1 lowering and the VPU rejects bf16 compare/select
    # ("Target does not support this comparison"); min/max algebra avoids
    # both: selu(x) = L*max(x,0) + L*A*(exp(min(x,0)) - 1)
    zero = jnp.zeros((), x.dtype)
    return (_SELU_L * jnp.maximum(x, zero)
            + (_SELU_L * _SELU_A) * (jnp.exp(jnp.minimum(x, zero)) - 1.0))


def _kernel(x_hbm, w1, sb1, w2, b2, wd, bd, out_ref,
            xs00, xs01, xs02, xs10, xs11, xs12, sem, *,
            c_in: int, c_out: int, f_in: int, g: int, u: int,
            t_global: int, has_down: bool, acc_dtype):
    """One (batch-group, output-time-tile) grid step.

    x_hbm: (3, C_in, B, 32, Wtot) phase-major encoder-major input:
           x_hbm[q, :, b, :, j*u + w] = x[b, :, :, 3*(j*u) + 3w + q - 6]
    w1:    (2, 3, C_in, C_out) conv1 taps, bn2 scale folded in
    sb1:   (C_out, 1, 1, 1) folded bn2 shift (conv1 bias absorbed)
    w2:    (2, 3, C_out, C_out) conv2 taps; b2 (C_out, 1, 1, 1)
    wd:    (3, C_in, C_out) downsample taps; bd (C_out, 1, 1, 1)
    out:   (C_out, G, f_in, u) pooled tile
    xs*:   VMEM phase slabs (C_in, G, 32, u+256), two revolving sets
    """
    xs_sets = [[xs00, xs01, xs02], [xs10, xs11, xs12]]
    bg = pl.program_id(0)
    j = pl.program_id(1)
    n_bg = pl.num_programs(0)
    n_tiles = pl.num_programs(1)
    f1 = f_in + 1          # conv1 freq size (pad (1,1), kernel 2)
    u_y = u + 128          # aligned y1-phase width (>= u+2 real columns)
    w_x = u + 256          # x phase-slab width (128-aligned DMA extent)

    step = bg * n_tiles + j
    even = (step % 2) == 0

    def dma(dst_slot: int, t_bg, t_j, q: int):
        return pltpu.make_async_copy(
            x_hbm.at[q, :, pl.ds(t_bg * g, g), :, pl.ds(t_j * u, w_x)],
            xs_sets[dst_slot][q], sem.at[dst_slot, q])

    # next step's coordinates (grid iterates j fastest)
    has_next_j = j + 1 < n_tiles
    nbg = jnp.where(has_next_j, bg, bg + 1)
    nj = jnp.where(has_next_j, j + 1, 0)
    has_next = step + 1 < n_bg * n_tiles

    @pl.when(step == 0)
    def _warmup():
        for q in range(3):
            dma(0, bg, j, q).start()

    for slot in (0, 1):
        pred = even if slot == 0 else jnp.logical_not(even)

        @pl.when(jnp.logical_and(pred, has_next))
        def _prefetch(slot=slot):
            for q in range(3):
                dma(1 - slot, nbg, nj, q).start()

    def compute(xs):
        def tap_dot(w_tap, piece):
            # (K, C_out) x (K, G, F, T) -> (C_out, G, F, T)
            return lax.dot_general(
                w_tap, piece, (((0,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)

        def xph(d: int, f_lo: int, f_hi: int, width: int):
            """Phase-slab slice holding x[3v + d] for v in [0, width)."""
            q = d % 3
            m = 2 + (d - q) // 3
            return xs[q][:, :, f_lo:f_hi, m:m + width]

        taps6 = [(df, dt) for df in range(2) for dt in range(3)]

        # ---- conv1 + folded bn + selu, three phases ------------------
        # y1_q[v] = y1[3v + q - 3]; real columns v in [0, u+2)
        y1ph = []
        for q in range(3):
            if c_in == 1:
                patches = jnp.concatenate(
                    [xph(q - 4 + dt, df, df + f1, u_y)
                     for df, dt in taps6], axis=0)
                w6 = jnp.concatenate(
                    [w1[df, dt] for df, dt in taps6], axis=0)
                acc = tap_dot(w6, patches)
            else:
                acc = None
                for df, dt in taps6:
                    piece = xph(q - 4 + dt, df, df + f1, u_y)
                    contrib = tap_dot(w1[df, dt], piece)
                    acc = contrib if acc is None else acc + contrib
            # bf16 epilogue (bandwidth-bound VPU passes)
            acc = (acc + sb1[...].astype(acc_dtype)).astype(xs00.dtype)
            acc = _selu(acc)
            col = lax.broadcasted_iota(jnp.int32, (1, 1, 1, u_y), 3)
            gidx = 3 * (j * u + col) + q - 3
            mask = ((gidx >= 0) & (gidx < t_global)).astype(acc.dtype)
            y1ph.append(acc * mask)

        # ---- conv2 (tap-stacked K=6*C_out) + identity + pool ---------
        w2all = jnp.concatenate([w2[df, dt] for df, dt in taps6], axis=0)
        pooled = None
        for p in range(3):
            pieces = []
            for df, dt in taps6:
                e = p + 2 + dt          # = (p - 1 + dt) + 3
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
                # non-downsample blocks have C_in == C_out
                ident = xph(p, 1, 1 + f_in, u).astype(acc_dtype)

            s = acc + ident
            pooled = s if pooled is None else jnp.maximum(pooled, s)

        out_ref[...] = pooled.astype(out_ref.dtype)

    for slot in (0, 1):
        pred = even if slot == 0 else jnp.logical_not(even)

        @pl.when(pred)
        def _run_slot(slot=slot):
            for q in range(3):
                # wait for this step's slabs (warmup or previous prefetch)
                pltpu.make_async_copy(
                    x_hbm.at[q, :, pl.ds(bg * g, g), :,
                             pl.ds(j * u, w_x)],
                    xs_sets[slot][q], sem.at[slot, q]).wait()
            compute(xs_sets[slot])


def _fold_bn(bn_p, bn_s, conv_bias):
    """Inference BN folding -> (scale, shift) with conv bias absorbed."""
    f32 = jnp.float32
    inv = lax.rsqrt(jnp.asarray(bn_s["var"], f32) + BN_EPS)
    s = jnp.asarray(bn_p["weight"], f32) * inv
    t = (jnp.asarray(bn_p["bias"], f32)
         - jnp.asarray(bn_s["mean"], f32) * s
         + jnp.asarray(conv_bias, f32) * s)
    return s, t


def pick_tile(t_out_total: int, c_in: int, c_out: int, batch: int):
    """(G, U): batch-group size and output-time tile.

    U must be a multiple of 128 (Mosaic free-dim merge rule).  G amortises
    per-step DMA latency; both sized so the phase pipelines stay within
    ~24 MB of VMEM (scoped-vmem limit raised via CompilerParams).
    """
    u = 256 if t_out_total >= 256 else 128
    budget = 80 * 1024 * 1024
    per_g = (3 * c_out * 24 * (u + 128) * 2      # y1 phases bf16
             + c_out * 24 * (u + 128) * 4        # f32 accumulator
             + 6 * c_out * 23 * u * 2            # conv2 patch concat
             + 2 * c_out * 23 * u * 4            # s + pooled f32
             + 12 * c_in * 32 * (u + 256) * 2    # 2x3 slabs (+headroom)
             + 2 * c_out * 23 * u * 2)           # double-buffered out
    g = max(1, min(batch, budget // per_g))
    while batch % g:
        g -= 1
    return g, u


def _use_interpret() -> bool:
    # CPU backend (tests) runs the kernel through the Pallas interpreter
    return jax.default_backend() == "cpu"


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def _run(x_phase_view, packed, c_in, c_out, f_in, g, t_tile, t_global):
    w1, sb1, w2, b2, wd, bd = packed
    has_down = wd is not None
    if wd is None:
        wd = jnp.zeros((3, c_in, c_out), x_phase_view.dtype)
        bd = jnp.zeros((c_out, 1, 1, 1), jnp.float32)
    batch = x_phase_view.shape[2]
    n_tiles = (x_phase_view.shape[4] - 256) // t_tile

    kernel = functools.partial(
        _kernel, c_in=c_in, c_out=c_out, f_in=f_in, g=g, u=t_tile,
        t_global=t_global, has_down=has_down, acc_dtype=jnp.float32)

    slab = pltpu.VMEM((c_in, g, 32, t_tile + 256), x_phase_view.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(batch // g, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(
            (c_out, g, f_in, t_tile),
            lambda bb, jj: (0, bb, 0, jj),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (c_out, batch, f_in, n_tiles * t_tile), x_phase_view.dtype),
        scratch_shapes=[slab] * 6 + [pltpu.SemaphoreType.DMA((2, 3))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(x_phase_view, w1, sb1, w2, b2, wd, bd)
    return out


class FusedBlockParams:
    """Folded parameters for one block (eval mode); jnp ops so folding can
    run inside a jitted apply (XLA constant-folds/fuses the vector math)."""

    def __init__(self, p, s, c_in: int, c_out: int, dtype=jnp.bfloat16):
        self.c_in, self.c_out = c_in, c_out
        w1 = jnp.asarray(p["conv1"]["weight"], jnp.float32)  # (O,I,2,3)
        w2 = jnp.asarray(p["conv2"]["weight"], jnp.float32)
        scale, shift = _fold_bn(p["bn2"], s["bn2"],
                                p["conv1"].get("bias", 0.0))
        w1 = w1 * scale[:, None, None, None]
        self.w1 = jnp.transpose(w1, (2, 3, 1, 0)).astype(dtype)
        self.sb1 = shift.reshape(c_out, 1, 1, 1)
        self.w2 = jnp.transpose(w2, (2, 3, 1, 0)).astype(dtype)
        self.b2 = jnp.asarray(p["conv2"].get("bias", jnp.zeros(c_out)),
                              jnp.float32).reshape(c_out, 1, 1, 1)
        if "conv_downsample" in p:
            wd = jnp.asarray(p["conv_downsample"]["weight"], jnp.float32)
            self.wd = jnp.transpose(wd[:, :, 0, :], (2, 1, 0)).astype(dtype)
            self.bd = jnp.asarray(
                p["conv_downsample"].get("bias", jnp.zeros(c_out)),
                jnp.float32).reshape(c_out, 1, 1, 1)
        else:
            self.wd = None
            self.bd = None

    def packed(self):
        return (self.w1, self.sb1, self.w2, self.b2, self.wd, self.bd)


def to_encoder_major(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, F, T) -> (C, B, F, T), done once at encoder entry."""
    return jnp.transpose(x, (1, 0, 2, 3))


def from_encoder_major(e: jnp.ndarray) -> jnp.ndarray:
    """(C, B, F, T) -> (B, C, F, T), done once at encoder exit."""
    return jnp.transpose(e, (1, 0, 2, 3))


def fused_residual_block_em(x_em: jnp.ndarray, fp: FusedBlockParams
                            ) -> jnp.ndarray:
    """One fused block in encoder-major layout:
    (C_in, B, F, T) -> (C_out, B, F, T//3).

    Semantics identical to residual_block_apply(train=False) including the
    floor maxpool (samples beyond 3*floor(T/3) are dropped).
    """
    c_in, b, f_in, t = x_em.shape
    t_out_total = t // 3
    g, t_tile = pick_tile(t_out_total, c_in, fp.c_out, b)
    n_tiles = -(-t_out_total // t_tile)
    t_out_pad = n_tiles * t_tile
    # phase-major view: x_view[q, c, b, f, w] = padded[3w + q], left time
    # pad 6, freq padded 1 left then zero-filled to 32 rows (DMA sublane
    # extents must be multiples of 8)
    total = 3 * (t_out_pad + 256)
    x_padded = jnp.pad(x_em, ((0, 0), (0, 0), (1, 32 - f_in - 1),
                              (6, total - 6 - t)))
    x_view = jnp.transpose(
        x_padded.reshape(c_in, b, 32, total // 3, 3), (4, 0, 1, 2, 3))
    out = _run(x_view, fp.packed(), c_in, fp.c_out, f_in, g, t_tile, t)
    return out[:, :, :, :t_out_total]


def fused_residual_block(x: jnp.ndarray, fp: FusedBlockParams
                         ) -> jnp.ndarray:
    """Standard-layout wrapper: (B, C_in, F, T) -> (B, C_out, F, T//3)."""
    return from_encoder_major(
        fused_residual_block_em(to_encoder_major(x), fp))
