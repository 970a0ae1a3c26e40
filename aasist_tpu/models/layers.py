"""Shared model building blocks for the AASIST family.

Functional JAX re-implementations of the reference's sub-modules, kept
semantically identical (including documented reference quirks needed for
checkpoint parity) but expressed TPU-first: all graph ops are dense batched
einsums over <=32 nodes with static shapes, so XLA fuses each layer into a
handful of MXU matmuls + VPU elementwise ops.

Reference sub-modules covered (file:line in /root/reference):
  * sinc filterbank CONV            models/AASIST.py:418-503
  * GraphAttentionLayer             models/AASIST.py:17-110
  * HtrgGraphAttentionLayer         models/AASIST.py:113-282
  * GraphPool                       models/AASIST.py:285-322
  * original Residual_block         models/RawNetGatSpoofST.py:225-278
    (the geometry the shipped checkpoints were trained with; the fork's
    models/AASIST.py:672-725 variant drifted to (3,3) kernels)
  * SELayer / Res2NetBlock          models/AASIST.py:506-669 (AASIST2)
  * SpeakerConditioningModule       models/AASIST.py:325-415 (AASIST2)
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from aasist_tpu import nn
from aasist_tpu.nn import Params, State, RngStream


# =====================================================================
# Sinc filterbank frontend
# =====================================================================
def mel_from_hz(hz):
    return 2595.0 * np.log10(1.0 + hz / 700.0)


def hz_from_mel(mel):
    return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)


def sinc_filterbank(out_channels: int, kernel_size: int,
                    sample_rate: int = 16000) -> np.ndarray:
    """Fixed mel-spaced band-pass filterbank, (out_channels, kernel_size).

    Deterministic construction identical to the reference CONV.__init__
    (models/AASIST.py:460-482): NFFT=512 frequency grid -> mel edges ->
    ideal band-pass (difference of two sincs) windowed by Hamming.
    The filterbank is *not* stored in checkpoints (not a registered buffer
    in the reference either) and is recomputed at model build time.
    """
    if kernel_size % 2 == 0:
        kernel_size += 1
    nfft = 512
    f = int(sample_rate / 2) * np.linspace(0, 1, nfft // 2 + 1)
    fmel = mel_from_hz(f)
    mel_edges = np.linspace(fmel.min(), fmel.max(), out_channels + 1)
    hz_edges = hz_from_mel(mel_edges)
    hsupp = np.arange(-(kernel_size - 1) / 2, (kernel_size - 1) / 2 + 1)
    ham = np.hamming(kernel_size)
    bank = np.zeros((out_channels, kernel_size))
    for i in range(out_channels):
        fmin, fmax = hz_edges[i], hz_edges[i + 1]
        h_high = (2 * fmax / sample_rate) * np.sinc(
            2 * fmax * hsupp / sample_rate)
        h_low = (2 * fmin / sample_rate) * np.sinc(
            2 * fmin * hsupp / sample_rate)
        bank[i] = ham * (h_high - h_low)
    return bank.astype(np.float32)


def freq_mask_filterbank(rng: jax.Array, bank: jnp.ndarray) -> jnp.ndarray:
    """Frequency-band augmentation: zero a random contiguous run of filters.

    Equivalent of the reference's Freq_aug path (models/AASIST.py:487-490):
    width A ~ floor(U[0,20)), start A0 ~ U{0..C-A}, rows [A0, A0+A) zeroed.
    Implemented with static shapes (mask via iota comparison) so it stays
    inside jit.
    """
    c = bank.shape[0]
    k_width, k_start = jax.random.split(rng)
    width = jnp.floor(jax.random.uniform(k_width) * 20.0).astype(jnp.int32)
    start = jax.random.randint(k_start, (), 0, c + 1 - width)
    rows = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
    keep = (rows < start) | (rows >= start + width)
    return jnp.where(keep, bank, 0.0)


def sinc_frontend(bank: jnp.ndarray, x: jnp.ndarray, stride: int = 1
                  ) -> jnp.ndarray:
    """Apply the filterbank as a 1-D conv: (B, L) -> (B, C, L-K+1)."""
    p = {"weight": bank[:, None, :]}
    return nn.conv1d(p, x[:, None, :], stride=stride)


# =====================================================================
# Graph attention (homogeneous)
# =====================================================================
def _xavier_normal(rng, shape):
    fan_in, fan_out = shape[0], shape[1] if len(shape) > 1 else 1
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(rng, shape, dtype=jnp.float32)


def gat_init(rng, in_dim: int, out_dim: int) -> Tuple[Params, State]:
    ks = jax.random.split(rng, 4)
    bn_p, bn_s = nn.bn_init(out_dim)
    params = {
        "att_proj": nn.linear_init(ks[0], in_dim, out_dim),
        "att_weight": _xavier_normal(ks[1], (out_dim, 1)),
        "proj_with_att": nn.linear_init(ks[2], in_dim, out_dim),
        "proj_without_att": nn.linear_init(ks[3], in_dim, out_dim),
        "bn": bn_p,
    }
    return params, {"bn": bn_s}


def gat_apply(p: Params, s: State, x: jnp.ndarray, *, temperature: float,
              train: bool, rngs: RngStream) -> Tuple[jnp.ndarray, State]:
    """GraphAttentionLayer forward (models/AASIST.py:43-110).

    x: (B, N, D_in) -> (B, N, D_out).  Attention map is built from the
    pairwise node product, normalised with softmax over the *source* node
    axis (torch dim=-2), then applied as att @ x.
    """
    x = nn.dropout(rngs.next(), x, 0.2, train)
    pair = x[:, :, None, :] * x[:, None, :, :]            # (B,N,N,D)
    a = jnp.tanh(nn.linear(p["att_proj"], pair))          # (B,N,N,Do)
    a = jnp.einsum("bijd,do->bijo", a, p["att_weight"])   # (B,N,N,1)
    a = jax.nn.softmax(a / temperature, axis=-2)
    agg = jnp.einsum("bij,bjd->bid", a[..., 0], x)
    y = nn.linear(p["proj_with_att"], agg) + nn.linear(p["proj_without_att"], x)
    y, bn_s = nn.batch_norm(p["bn"], s["bn"], y, axis=y.ndim - 1, train=train)
    return jax.nn.selu(y), {"bn": bn_s}


# =====================================================================
# Heterogeneous graph attention (two node types + master node)
# =====================================================================
def htrg_gat_init(rng, in_dim: int, out_dim: int) -> Tuple[Params, State]:
    ks = jax.random.split(rng, 12)
    bn_p, bn_s = nn.bn_init(out_dim)
    params = {
        "proj_type1": nn.linear_init(ks[0], in_dim, in_dim),
        "proj_type2": nn.linear_init(ks[1], in_dim, in_dim),
        "att_proj": nn.linear_init(ks[2], in_dim, out_dim),
        "att_projM": nn.linear_init(ks[3], in_dim, out_dim),
        "att_weight11": _xavier_normal(ks[4], (out_dim, 1)),
        "att_weight22": _xavier_normal(ks[5], (out_dim, 1)),
        "att_weight12": _xavier_normal(ks[6], (out_dim, 1)),
        "att_weightM": _xavier_normal(ks[7], (out_dim, 1)),
        "proj_with_att": nn.linear_init(ks[8], in_dim, out_dim),
        "proj_without_att": nn.linear_init(ks[9], in_dim, out_dim),
        "proj_with_attM": nn.linear_init(ks[10], in_dim, out_dim),
        "proj_without_attM": nn.linear_init(ks[11], in_dim, out_dim),
        "bn": bn_p,
    }
    return params, {"bn": bn_s}


def htrg_gat_apply(
    p: Params, s: State, x1: jnp.ndarray, x2: jnp.ndarray,
    master: Optional[jnp.ndarray], *, temperature: float, train: bool,
    rngs: RngStream,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, State]:
    """HtrgGraphAttentionLayer forward (models/AASIST.py:150-255).

    Node types are projected separately, concatenated into one graph of
    n1+n2 nodes, and the attention board uses four score heads: (1,1) /
    (2,2) blocks get their own weight vectors, both cross blocks share
    ``att_weight12``.  The master node aggregates all nodes through its own
    attention head.  Returns (x1', x2', master').
    """
    n1, n2 = x1.shape[1], x2.shape[1]
    x1 = nn.linear(p["proj_type1"], x1)
    x2 = nn.linear(p["proj_type2"], x2)
    x = jnp.concatenate([x1, x2], axis=1)                 # (B, N, D)
    if master is None:
        master = jnp.mean(x, axis=1, keepdims=True)
    x = nn.dropout(rngs.next(), x, 0.2, train)

    # blockwise attention board
    pair = x[:, :, None, :] * x[:, None, :, :]
    a = jnp.tanh(nn.linear(p["att_proj"], pair))          # (B,N,N,Do)
    s11 = jnp.einsum("bijd,do->bijo", a, p["att_weight11"])
    s22 = jnp.einsum("bijd,do->bijo", a, p["att_weight22"])
    s12 = jnp.einsum("bijd,do->bijo", a, p["att_weight12"])
    top = jnp.concatenate([s11[:, :n1, :n1], s12[:, :n1, n1:]], axis=2)
    bot = jnp.concatenate([s12[:, n1:, :n1], s22[:, n1:, n1:]], axis=2)
    att = jnp.concatenate([top, bot], axis=1) / temperature
    att = jax.nn.softmax(att, axis=-2)                    # (B,N,N,1)

    # master update (directional edges into the master node)
    am = jnp.tanh(nn.linear(p["att_projM"], x * master))  # (B,N,Do)
    am = jnp.einsum("bnd,do->bno", am, p["att_weightM"]) / temperature
    am = jax.nn.softmax(am, axis=-2)                      # (B,N,1)
    m_agg = jnp.einsum("bn,bnd->bd", am[..., 0], x)[:, None, :]
    new_master = (nn.linear(p["proj_with_attM"], m_agg)
                  + nn.linear(p["proj_without_attM"], master))

    # node projection
    agg = jnp.einsum("bij,bjd->bid", att[..., 0], x)
    y = (nn.linear(p["proj_with_att"], agg)
         + nn.linear(p["proj_without_att"], x))
    y, bn_s = nn.batch_norm(p["bn"], s["bn"], y, axis=y.ndim - 1, train=train)
    y = jax.nn.selu(y)
    return y[:, :n1], y[:, n1:], new_master, {"bn": bn_s}


# =====================================================================
# Graph pooling (top-k node selection)
# =====================================================================
def graph_pool_init(rng, in_dim: int) -> Params:
    return {"proj": nn.linear_init(rng, in_dim, 1)}


def graph_pool_apply(p: Params, h: jnp.ndarray, *, k: float,
                     min_nodes: int, dropout_p: float, train: bool,
                     rngs: RngStream) -> jnp.ndarray:
    """GraphPool forward (models/AASIST.py:294-322).

    Scores nodes with a sigmoid gate, keeps the top ``max(int(N*k),
    min_nodes)`` nodes ordered by descending score, scaling kept features
    by their scores.  AASIST uses min_nodes=1, RawGAT-ST uses min_nodes=2
    (models/RawNetGatSpoofST.py:126).
    """
    z = nn.dropout(rngs.next(), h, dropout_p, train)
    scores = jax.nn.sigmoid(nn.linear(p["proj"], z))      # (B,N,1)
    n_keep = max(int(h.shape[1] * k), min_nodes)
    _, idx = jax.lax.top_k(scores[..., 0], n_keep)        # (B, n_keep)
    h = h * scores
    return jnp.take_along_axis(h, idx[..., None], axis=1)


# =====================================================================
# Original residual encoder block (checkpoint-compatible geometry)
# =====================================================================
def residual_block_init(rng, in_ch: int, out_ch: int, first: bool
                        ) -> Tuple[Params, State]:
    ks = jax.random.split(rng, 3)
    params: Params = {
        "conv1": nn.conv_init(ks[0], in_ch, out_ch, (2, 3)),
        "conv2": nn.conv_init(ks[1], out_ch, out_ch, (2, 3)),
    }
    state: State = {}
    bn2_p, bn2_s = nn.bn_init(out_ch)
    params["bn2"], state["bn2"] = bn2_p, bn2_s
    if not first:
        bn1_p, bn1_s = nn.bn_init(in_ch)
        params["bn1"], state["bn1"] = bn1_p, bn1_s
    if in_ch != out_ch:
        params["conv_downsample"] = nn.conv_init(ks[2], in_ch, out_ch, (1, 3))
    return params, state


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

    Reference anchor: Residual_block's conv1 -> bn2 pair
    (/root/reference/models/RawNetGatSpoofST.py:258-268) — the bn2+selu
    elementwise pass measures ~6 ms/batch-128 unfused on TPU
    (docs/PERF.md round-3 sub-op table); folding removes the BN half
    and leaves selu alone on the fusion boundary.
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
    ``conv1_folded`` entry that ``residual_block_apply(fold_bn=True)``
    uses directly — the folded weights reach the compiled program as
    plain parameters instead of per-call computed tensors.
    """
    out = []
    for bp, bs in zip(enc_params, enc_state):
        bp = dict(bp)
        if "conv1" in bp and "bn2" in bp:
            bp["conv1_folded"] = fold_bn_after_conv(
                bp["conv1"], bp["bn2"], bs["bn2"])
        out.append(bp)
    return out


def residual_block_apply(p: Params, s: State, x: jnp.ndarray, *,
                         first: bool, train: bool,
                         fold_bn: bool = False
                         ) -> Tuple[jnp.ndarray, State]:
    """Original AASIST/RawGAT residual block (RawNetGatSpoofST.py:258-278).

    Geometry: conv1 (2,3) pad (1,1) -> bn2/selu -> conv2 (2,3) pad (0,1);
    1x3 downsample conv on the identity when channels change; MaxPool(1,3).

    Reference quirk kept deliberately: the pre-activation bn1(x)+selu result
    is computed but then *discarded* — conv1 is applied to the raw input
    (``out = self.conv1(x)``, RawNetGatSpoofST.py:265; same in the fork's
    copies).  The shipped checkpoints were trained with this behaviour, so
    in eval mode bn1 is a complete no-op here; in train mode we still run
    bn1 so its running statistics evolve exactly as in the reference.
    """
    new_s = dict(s)
    if not first and train:
        # output discarded (reference bug kept); state update is real
        _, new_s["bn1"] = nn.batch_norm(p["bn1"], s["bn1"], x, axis=1,
                                        train=True)
    if fold_bn and not train:
        # eval: bn2 rides inside conv1's weights (exact algebra, see
        # fold_bn_after_conv) — removes one full-size elementwise pass.
        # A pre-folded conv (fold_encoder_bn) takes precedence: folding
        # outside jit keeps the conv weights plain parameters.
        conv1 = p.get("conv1_folded")
        if conv1 is None:
            conv1 = fold_bn_after_conv(p["conv1"], p["bn2"], s["bn2"])
        out = nn.conv2d(conv1, x, padding=((1, 1), (1, 1)))
    else:
        out = nn.conv2d(p["conv1"], x, padding=((1, 1), (1, 1)))
        out, new_s["bn2"] = nn.batch_norm(p["bn2"], s["bn2"], out, axis=1,
                                          train=train)
    out = jax.nn.selu(out)
    out = nn.conv2d(p["conv2"], out, padding=((0, 0), (1, 1)))
    identity = x
    if "conv_downsample" in p:
        identity = nn.conv2d(p["conv_downsample"], x,
                             padding=((0, 0), (1, 1)))
    out = out + identity
    return nn.max_pool(out, (1, 3)), new_s


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
    ``e[:, :C] / e[:, C:]``.  Same math as two ``residual_block_apply``
    calls (conv accumulation order differs under ``dense``).

    ``first``/bn1 follows the reference quirk (bn1 output discarded —
    see residual_block_apply), so eval needs no bn1 at all.
    """
    del first
    if fold_bn:
        # pre-folded params (fold_encoder_bn) take precedence, same as
        # residual_block_apply — folding outside jit keeps the conv
        # weights plain parameters (round-4 review: this branch used to
        # ignore conv1_folded, re-deriving the fold per call)
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


def residual_block_apply_poly(p: Params, s: State, x: jnp.ndarray, *,
                              first: bool) -> jnp.ndarray:
    """Eval-only polyphase form of ``residual_block_apply`` for blocks
    WITH a downsample conv.

    conv2 and the trailing maxpool(1,3) are computed as ONE stride-3
    convolution with 3C phase-shifted (1x5)-tap kernels followed by a
    channel-block max — every stride-3 data access pattern (which XLA
    lowers at gather speed; docs/PERF.md round 2) disappears, and the
    conv runs at 3x the output channels on the MXU.  The identity path
    rides the downsample conv's phase kernels for free.  Numerically the
    same bf16 rounding class as the standard path (conv accumulation
    order differs).
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
    result up to dot accumulation order (the ds contribution sums
    inside the conv2 dot); exact-parity class as ``use_poly_blocks``.

    Reference geometry: Residual_block, RawNetGatSpoofST.py:225-278
    (conv1 (2,3) pad (1,1); conv2 (2,3) pad (0,1); conv_downsample
    (1,3) pad (0,1); MaxPool2d((1,3))).  ``first`` kept for signature
    symmetry — bn1 is a no-op in eval (reference quirk, see
    ``residual_block_apply``).
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



# =====================================================================
# SE layer + Res2Net block (AASIST2 encoder)
# =====================================================================
def se_init(rng, channels: int, reduction: int = 16) -> Params:
    k1, k2 = jax.random.split(rng)
    # "0"/"2" keys mirror the reference's nn.Sequential indices
    # (models/AASIST.py:511-516) so checkpoint conversion is mechanical
    return {"fc": {
        "0": nn.linear_init(k1, channels, channels // reduction, bias=False),
        "2": nn.linear_init(k2, channels // reduction, channels, bias=False),
    }}


def se_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Squeeze-and-excitation over NCHW (models/AASIST.py:506-522)."""
    y = jnp.mean(x, axis=(2, 3))                          # (B, C)
    y = jax.nn.relu(nn.linear(p["fc"]["0"], y))
    y = jax.nn.sigmoid(nn.linear(p["fc"]["2"], y))
    return x * y[:, :, None, None]


def _res2net_split_sizes(in_ch: int, width: int) -> list:
    """Per-split channel sizes, matching models/AASIST.py:544-565."""
    base = max(1, in_ch // width)
    remainder = in_ch - base * (width - 1)
    return [base] * (width - 1) + [remainder]


def res2net_block_init(rng, in_ch: int, out_ch: int, *, first: bool,
                       width: int = 14, scale: int = 8
                       ) -> Tuple[Params, State]:
    width = min(width, in_ch)
    scale = min(scale, width)
    sizes = _res2net_split_sizes(in_ch, width)
    ks = jax.random.split(rng, width + 3)
    params: Params = {
        "convs": [nn.conv_init(ks[i], sz, sz, (3, 3))
                  for i, sz in enumerate(sizes)],
        "conv_cat": nn.conv_init(ks[width], in_ch, out_ch, (3, 3)),
        "se": se_init(ks[width + 1], out_ch),
    }
    state: State = {}
    bn2_p, bn2_s = nn.bn_init(in_ch)
    params["bn2"], state["bn2"] = bn2_p, bn2_s
    if not first:
        bn1_p, bn1_s = nn.bn_init(in_ch)
        params["bn1"], state["bn1"] = bn1_p, bn1_s
    if in_ch != out_ch:
        params["conv_downsample"] = nn.conv_init(
            ks[width + 2], in_ch, out_ch, (1, 3))
    return params, state


def res2net_block_apply(p: Params, s: State, x: jnp.ndarray, *,
                        first: bool, width: int, scale: int, train: bool
                        ) -> Tuple[jnp.ndarray, State]:
    """Res2Net+SE encoder block (models/AASIST.py:603-669, AASIST2).

    Splits channels into ``width`` groups, runs a (3,3) conv per group with
    a carry-in residual every ``scale`` groups, concatenates, then
    bn/selu -> (3,3) conv -> SE -> +identity -> MaxPool(1,3).  Unlike the
    original block, here bn1's output *is* consumed (reference applies bn1
    then still convs the raw x — models/AASIST.py:609-626 uses x after bn1;
    note the fork feeds the normalised x onward, not the raw input).
    """
    in_ch = x.shape[1]
    width = min(width, in_ch)
    scale = min(scale, width)
    sizes = _res2net_split_sizes(in_ch, width)
    identity = x
    new_s = dict(s)
    if not first:
        x, new_s["bn1"] = nn.batch_norm(p["bn1"], s["bn1"], x, axis=1,
                                        train=train)
        x = jax.nn.selu(x)
    # channel splits
    offsets = np.cumsum([0] + sizes)
    outputs = []
    sp = None
    for i in range(width):
        spx_i = x[:, offsets[i]:offsets[i + 1]]
        if i > 0 and i % scale == 0:
            sp = sp + spx_i
        else:
            sp = spx_i
        sp = nn.conv2d(p["convs"][i], sp, padding=((1, 1), (1, 1)))
        outputs.append(sp)
    out = jnp.concatenate(outputs, axis=1)
    out, new_s["bn2"] = nn.batch_norm(p["bn2"], s["bn2"], out, axis=1,
                                      train=train)
    out = jax.nn.selu(out)
    out = nn.conv2d(p["conv_cat"], out, padding=((1, 1), (1, 1)))
    out = se_apply(p["se"], out)
    if "conv_downsample" in p:
        identity = nn.conv2d(p["conv_downsample"], identity,
                             padding=((0, 0), (1, 1)))
    out = out + identity
    return nn.max_pool(out, (1, 3)), new_s


# =====================================================================
# Speaker conditioning (AASIST2)
# =====================================================================
def speaker_cond_init(rng, spk_emb_dim: int, target_dim: int,
                      use_attention: bool = True) -> Params:
    ks = jax.random.split(rng, 5)
    # nested "0"/"2" keys mirror the reference's nn.Sequential layout
    # (models/AASIST.py:349-368) for mechanical checkpoint conversion
    p: Params = {
        "proj": nn.linear_init(ks[0], spk_emb_dim, target_dim),
        "fusion": {"0": nn.linear_init(ks[1], target_dim * 2, target_dim)},
    }
    if use_attention:
        p["attention"] = {
            "0": nn.linear_init(ks[2], target_dim * 2, target_dim),
            "2": nn.linear_init(ks[3], target_dim, 1),
        }
    return p


def speaker_cond_apply(p: Params, features: jnp.ndarray,
                       spk_emb: jnp.ndarray, *, level: str,
                       use_attention: bool) -> jnp.ndarray:
    """SpeakerConditioningModule forward (models/AASIST.py:370-415)."""
    spk = nn.linear(p["proj"], spk_emb)                   # (B, D)
    if level == "frame":
        seq_len = features.shape[1]
        spk_seq = jnp.broadcast_to(
            spk[:, None, :], (features.shape[0], seq_len, spk.shape[-1]))
        if use_attention:
            cat = jnp.concatenate([features, spk_seq], axis=2)
            w = nn.linear(p["attention"]["2"],
                          jnp.tanh(nn.linear(p["attention"]["0"], cat)))
            w = jax.nn.softmax(w, axis=1)                 # (B, T, 1)
            spk_ctx = w * spk_seq
            return jax.nn.relu(nn.linear(
                p["fusion"]["0"],
                jnp.concatenate([features, spk_ctx], axis=2)))
        return jax.nn.relu(nn.linear(
            p["fusion"]["0"], jnp.concatenate([features, spk_seq], axis=2)))
    # utterance level
    if features.ndim == 3:
        features = jnp.mean(features, axis=1)
    return jax.nn.relu(nn.linear(
        p["fusion"]["0"], jnp.concatenate([features, spk], axis=1)))
