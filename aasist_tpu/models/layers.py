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
    x = nn.stream_dropout(rngs, x, 0.2, train)
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
    x = nn.stream_dropout(rngs, x, 0.2, train)

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
    z = nn.stream_dropout(rngs, h, dropout_p, train)
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


def residual_block_apply(p: Params, s: State, x: jnp.ndarray, *,
                         first: bool, train: bool
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
