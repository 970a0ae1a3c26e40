"""Retired eval-path variants of the residual encoder block.

Round-5 retirement (VERDICT r4 "what's weak" #2): these four
reformulations were built, parity-tested and A/B'd ON-CHIP across rounds
3-4, and every one measured dead for the shipping configuration —

  * ``residual_block_apply_poly``    stride-3 polyphase conv2+pool:  -3%
  * ``residual_block_apply_aug``     downsample-inside-conv2:     neutral
  * ``fold_bn_after_conv`` (+ ``fold_encoder_bn``) as a model flag: the
    bn2-into-conv1 eval fold measured 21% SLOWER (1556 vs 1973 utt/s
    official A/B — the bn+selu elementwise pass is load-bearing as
    conv2's producer fusion, docs/PERF.md round 4)
  * ``residual_block_apply_stacked2`` RawGAT dual-encoder 2x-channel
    stacking: neutral (off 852 / dense 832 / grouped 876 utt/s at B=128
    bf16), and dense at B=128 breaks the bench compile stack

so they moved OUT of the product models (which keep exactly two eval
paths: standard XLA and the fused-frontend + b0-chunk winners) into this
module, following the round-3 ``fused_stack`` precedent.  They remain
importable for future A/B probes (tools/probe_* use them) and keep their
parity tests in tools/test_eval_variants.py.

Reference geometry for all of them: the original ``Residual_block``
(/root/reference/models/RawNetGatSpoofST.py:225-278) — conv1 (2,3) pad
(1,1); conv2 (2,3) pad (0,1); conv_downsample (1,3) pad (0,1);
MaxPool2d((1,3)); bn1 output discarded (reference quirk).
"""

from __future__ import annotations

import jax
from jax import lax
import jax.numpy as jnp

from aasist_tpu import nn
from aasist_tpu.nn import Params, State


def fold_bn_after_conv(conv_p: Params, bn_p: Params, bn_s: State
                       ) -> Params:
    """Exact eval-mode algebra: fold a BatchNorm that CONSUMES a conv's
    output into that conv's weight/bias.

    ``bn(conv(x)) == conv'(x)`` with ``w' = w * s`` (per output channel)
    and ``b' = b * s + o`` where ``s = gamma*rsqrt(var+eps)`` and
    ``o = beta - s*mean``.  Unlike folding a *preceding* BN, this
    direction is exact under any padding (the affine acts after the
    convolution).  The fold is computed in f32 and cast back to the
    conv's dtype, so bf16 paths keep the same rounding class.
    """
    dt = conv_p["weight"].dtype
    ft = jnp.promote_types(dt, jnp.float32)  # f32, or f64 on f64 paths
    w = conv_p["weight"].astype(ft)
    g = bn_p["weight"].astype(ft)
    b = bn_p["bias"].astype(ft)
    mean = bn_s["mean"].astype(ft)
    var = bn_s["var"].astype(ft)
    s = g * lax.rsqrt(var + nn.BN_EPS)
    o = b - s * mean
    w2 = (w * s[:, None, None, None]).astype(dt)
    bias = conv_p.get("bias")
    b2 = (s * bias.astype(ft) + o if bias is not None else o).astype(dt)
    return {"weight": w2, "bias": b2}


def fold_encoder_bn(enc_params, enc_state):
    """Pre-fold every residual block's bn2 into its conv1, OUTSIDE jit.

    Returns a new encoder param list where each block carries an extra
    ``conv1_folded`` entry that ``residual_block_apply_folded`` uses
    directly — the folded weights reach the compiled program as plain
    parameters instead of per-call computed tensors.
    """
    out = []
    for bp, bs in zip(enc_params, enc_state):
        bp = dict(bp)
        if "conv1" in bp and "bn2" in bp:
            bp["conv1_folded"] = fold_bn_after_conv(
                bp["conv1"], bp["bn2"], bs["bn2"])
        out.append(bp)
    return out


def residual_block_apply_folded(p: Params, s: State, x: jnp.ndarray, *,
                                first: bool) -> jnp.ndarray:
    """Eval-only residual block with bn2 riding inside conv1's weights
    (exact algebra, see fold_bn_after_conv) — removes one full-size
    elementwise pass.  A pre-folded conv (fold_encoder_bn) takes
    precedence.  Measured 21% SLOWER on-chip than the standard block
    (docs/PERF.md round 4) — retired from the product model."""
    del first
    conv1 = p.get("conv1_folded")
    if conv1 is None:
        conv1 = fold_bn_after_conv(p["conv1"], p["bn2"], s["bn2"])
    out = nn.conv2d(conv1, x, padding=((1, 1), (1, 1)))
    out = jax.nn.selu(out)
    out = nn.conv2d(p["conv2"], out, padding=((0, 0), (1, 1)))
    identity = x
    if "conv_downsample" in p:
        identity = nn.conv2d(p["conv_downsample"], x,
                             padding=((0, 0), (1, 1)))
    out = out + identity
    return nn.max_pool(out, (1, 3))


def _stacked_conv2d(pa: Params, pb: Params, x: jnp.ndarray, *,
                    padding, shared_input: bool, dense: bool
                    ) -> jnp.ndarray:
    """One convolution computing two same-geometry branch convs at once.

    Channel convention: outputs ``[branch_a ++ branch_b]``; for
    non-shared inputs the input is expected in the same stacked order.

    * ``shared_input``: both branches read the SAME input (e.g. the
      1-channel post-frontend map) — plain output-channel concat.
    * ``dense``: block-diagonal weights at 2x in/out channels — 2x the
      FLOPs at 50% density, but the K-dim doubles, which the MXU runs
      at far higher efficiency for these C<=64 convs (docs/PERF.md
      Mosaic dot-rate table: 384-row dots reach 82% peak where 192-row
      dots reach 25%).
    * otherwise: grouped conv (``feature_group_count=2``) — exact FLOPs,
      one dispatch.
    """
    wa, wb = pa["weight"], pb["weight"]
    if shared_input:
        w = jnp.concatenate([wa, wb], axis=0)
        groups = 1
    elif dense:
        w = jnp.concatenate([
            jnp.concatenate([wa, jnp.zeros_like(wb)], axis=1),
            jnp.concatenate([jnp.zeros_like(wa), wb], axis=1)], axis=0)
        groups = 1
    else:
        w = jnp.concatenate([wa, wb], axis=0)
        groups = 2
    y = lax.conv_general_dilated(
        x, w, (1, 1), tuple(padding),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups)
    ba, bb = pa.get("bias"), pb.get("bias")
    if ba is not None or bb is not None:
        bias = jnp.concatenate([
            ba if ba is not None else jnp.zeros((wa.shape[0],), y.dtype),
            bb if bb is not None else jnp.zeros((wb.shape[0],), y.dtype)])
        y = y + bias[None, :, None, None].astype(y.dtype)
    return y


def residual_block_apply_stacked2(
        pa: Params, pb: Params, sa: State, sb: State, x: jnp.ndarray, *,
        first: bool, shared_input: bool, dense: bool = True,
        fold_bn: bool = True) -> jnp.ndarray:
    """Eval-only: TWO same-geometry residual blocks as ONE at 2x channels.

    RawGAT-ST runs two structurally identical encoders on the same
    frontend output (ref: models/RawNetGatSpoofST.py:295-309); running
    them sequentially leaves the MXU at C=32 efficiency and doubles the
    pass count.  Stacking the branch weights runs the whole pyramid
    once at 2x channels; the output splits back as
    ``e[:, :C] / e[:, C:]``.  Same math as two standard block calls
    (conv accumulation order differs under ``dense``).  Measured
    NEUTRAL on-chip (docs/PERF.md round 4) — retired.

    ``first``/bn1 follows the reference quirk (bn1 output discarded),
    so eval needs no bn1 at all.
    """
    del first
    if fold_bn:
        ca = pa.get("conv1_folded")
        if ca is None:
            ca = fold_bn_after_conv(pa["conv1"], pa["bn2"], sa["bn2"])
        cb = pb.get("conv1_folded")
        if cb is None:
            cb = fold_bn_after_conv(pb["conv1"], pb["bn2"], sb["bn2"])
    else:
        ca, cb = pa["conv1"], pb["conv1"]
    out = _stacked_conv2d(ca, cb, x, padding=((1, 1), (1, 1)),
                          shared_input=shared_input, dense=dense)
    if not fold_bn:
        bn_p = {k: jnp.concatenate([pa["bn2"][k], pb["bn2"][k]])
                for k in ("weight", "bias")}
        bn_s = {k: jnp.concatenate([sa["bn2"][k], sb["bn2"][k]])
                for k in ("mean", "var")}
        out, _ = nn.batch_norm(bn_p, bn_s, out, axis=1, train=False)
    out = jax.nn.selu(out)
    out = _stacked_conv2d(pa["conv2"], pb["conv2"], out,
                          padding=((0, 0), (1, 1)), shared_input=False,
                          dense=dense)
    if "conv_downsample" in pa:
        identity = _stacked_conv2d(
            pa["conv_downsample"], pb["conv_downsample"], x,
            padding=((0, 0), (1, 1)), shared_input=shared_input,
            dense=dense)
    else:
        identity = x
    return nn.max_pool(out + identity, (1, 3))


def rawgat_encode_stacked(model, params, state, x, *, dense: bool = True):
    """Both RawGAT encoders as one 2x-channel pyramid (eval only).

    Drop-in for the retired ``RawGatStModel._encode_stacked``: returns
    ``(e_T, e_S)`` like two ``model._encode`` calls.
    """
    e = x
    for i, (bpa, bpb) in enumerate(zip(params["encoder_T"],
                                       params["encoder_S"])):
        e = residual_block_apply_stacked2(
            bpa, bpb, state["encoder_T"][i], state["encoder_S"][i], e,
            first=(i == 0), shared_input=(i == 0), dense=dense,
            fold_bn=False)
    c = model.filts[-1][-1]
    return e[:, :c], e[:, c:]


def residual_block_apply_poly(p: Params, s: State, x: jnp.ndarray, *,
                              first: bool) -> jnp.ndarray:
    """Eval-only polyphase form of the residual block for blocks WITH a
    downsample conv.

    conv2 and the trailing maxpool(1,3) are computed as ONE stride-3
    convolution with 3C phase-shifted (1x5)-tap kernels followed by a
    channel-block max — every stride-3 data access pattern (which XLA
    lowers at gather speed; docs/PERF.md round 2) disappears, and the
    conv runs at 3x the output channels on the MXU.  The identity path
    rides the downsample conv's phase kernels for free.  Numerically the
    same bf16 rounding class as the standard path (conv accumulation
    order differs).  Measured -3% on-chip — retired.
    """
    out = nn.conv2d(p["conv1"], x, padding=((1, 1), (1, 1)))
    out, _ = nn.batch_norm(p["bn2"], s["bn2"], out, axis=1, train=False)
    out = jax.nn.selu(out)

    w2 = p["conv2"]["weight"]                      # (C, Ci2, 2, 3)
    c, ci2 = w2.shape[0], w2.shape[1]
    dt = w2.dtype
    # phase-packed conv2: y2[3w+r] = sum_dt w2[dt] z[3w + (r+dt) - 1]
    w2p = jnp.zeros((3, c, ci2, 2, 5), dt)
    for r in range(3):
        w2p = w2p.at[r, :, :, :, r:r + 3].set(w2)
    w2p = w2p.reshape(3 * c, ci2, 2, 5)
    y2p = lax.conv_general_dilated(
        out, w2p, window_strides=(1, 3), padding=((0, 0), (1, 4)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "bias" in p["conv2"]:
        y2p = y2p + jnp.tile(p["conv2"]["bias"], 3)[None, :, None, None]

    # identity via the downsample conv's phase kernels (k=(1,3), f-pad 0)
    wd = p["conv_downsample"]["weight"]            # (C, Ci, 1, 3)
    ci = wd.shape[1]
    wdp = jnp.zeros((3, c, ci, 1, 5), dt)
    for r in range(3):
        wdp = wdp.at[r, :, :, :, r:r + 3].set(wd)
    wdp = wdp.reshape(3 * c, ci, 1, 5)
    idp = lax.conv_general_dilated(
        x, wdp, window_strides=(1, 3), padding=((0, 0), (1, 4)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "bias" in p["conv_downsample"]:
        idp = idp + jnp.tile(p["conv_downsample"]["bias"],
                             3)[None, :, None, None]

    t_out = x.shape[3] // 3
    ssum = (y2p + idp)[:, :, :, :t_out]
    b = ssum.shape[0]
    pooled = jnp.max(
        ssum.reshape(b, 3, c, ssum.shape[2], t_out), axis=1)
    return pooled


def residual_block_apply_aug(p: Params, s: State, x: jnp.ndarray, *,
                             first: bool = False) -> jnp.ndarray:
    """Eval-only single-pipeline form of a *downsample* residual block.

    ``y = conv2(selu(bn2(conv1(x)))) + conv_ds(x)`` forces XLA to
    materialise conv_ds's full-size output in HBM (two convolutions
    cannot fuse into one add) — at batch 256 block0 that is ~16 GB of
    round-trip traffic.  Here the downsample rides INSIDE conv2 as
    ``C_in`` extra input channels (tools/probe_aug_channel.py: 11%
    faster than the standard block on the block0 geometry, B=128):

      * conv1_aug is (C_in -> C_in + C_out): the first C_in output
        channels are an exact identity copy of x (a delta tap at kernel
        position (1,1) under the block's ((1,1),(1,1)) padding), the
        rest are conv1.
      * bias/bn-affine/selu apply to the conv1 channels only; the
        identity channels pass through raw (elementwise select, fuses).
      * conv2_aug is (C_in + C_out -> C_out2): the identity channels
        carry conv_ds's (1,3) taps in the kH=0 row (the identity
        channel at row h+0 is exactly x[h], matching conv_ds's per-row
        geometry), the rest are conv2.  Bias = b2 + b_ds.

    The residual add disappears and the trailing maxpool fuses into the
    single conv2_aug consumer.  Extra FLOPs: (C_in+C_out)/C_out input
    channels on conv2 — +3% for block0 (1 -> 32).  Numerics: same
    result up to dot accumulation order.  Measured in-model NEUTRAL
    on-chip — retired.
    """
    del first
    w1 = p["conv1"]["weight"]                       # (C_out, C_in, 2, 3)
    w2 = p["conv2"]["weight"]                       # (C_out2, C_out, 2, 3)
    wd = p["conv_downsample"]["weight"]             # (C_out2, C_in, 1, 3)
    co1, ci = w1.shape[0], w1.shape[1]
    co2 = w2.shape[0]
    dt = w1.dtype
    naug = ci + co1

    w1a = jnp.zeros((naug, ci, 2, 3), dt)
    idx = jnp.arange(ci)
    w1a = w1a.at[idx, idx, 1, 1].set(jnp.asarray(1, dt))
    w1a = w1a.at[ci:].set(w1)
    z = lax.conv_general_dilated(
        x, w1a, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))

    # channel-wise epilogue: identity rows untouched, conv1 rows get
    # bias + eval-mode bn2 affine + selu
    zeros_ci = jnp.zeros((ci,), dt)
    b1 = p["conv1"].get("bias")
    b1a = jnp.concatenate([zeros_ci, b1.astype(dt) if b1 is not None
                           else jnp.zeros((co1,), dt)])
    bn, bs = p["bn2"], s["bn2"]
    scale = (bn["weight"] * lax.rsqrt(bs["var"] + nn.BN_EPS)).astype(dt)
    offset = (bn["bias"] - bn["weight"] * lax.rsqrt(bs["var"] + nn.BN_EPS)
              * bs["mean"]).astype(dt)
    sa = jnp.concatenate([jnp.ones((ci,), dt), scale])
    oa = jnp.concatenate([zeros_ci, offset])
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
    b2 = p["conv2"].get("bias")
    bd = p["conv_downsample"].get("bias")
    if b2 is not None or bd is not None:
        b2a = ((b2.astype(dt) if b2 is not None else 0)
               + (bd.astype(dt) if bd is not None else 0))
        y = y + b2a[None, :, None, None]
    return nn.max_pool(y, (1, 3))
