"""RawNet2 anti-spoofing baseline.

JAX re-implementation of `/root/reference/models/RawNet2Spoof.py`:
sinc filterbank frontend (20 filters, kernel 1025) -> |.| maxpool(3) ->
six 1-D residual blocks each followed by FMS channel attention
(sigmoid-gated ``x*y + y``) -> 3-layer GRU(1024) over the 29 remaining
frames -> fc1 (last_hidden) -> fc2 -> log-softmax.

TPU notes: the reference rebuilds its filterbank with a Python loop on
every forward (`RawNet2Spoof.py:78-89`) — here it is precomputed once
(bit-identical values).  The GRU is a ``lax.scan`` over 29 steps with the
three layers stacked inside the carry; 29 steps is short enough that scan
overhead is negligible and full unrolling is left to XLA.

Reference quirks kept for parity:
  * residual blocks apply conv1 to the raw input, discarding the
    bn1+lrelu pre-activation (`RawNet2Spoof.py:147-155`);
  * block2's config entry is mutated in place so blocks 3-5 are 128->128
    (`RawNet2Spoof.py:189`);
  * scores are log-probabilities (LogSoftmax head, `RawNet2Spoof.py:305`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aasist_tpu import nn
from aasist_tpu.nn import Params, RngStream, State
from aasist_tpu.models import layers as L


def _res1d_init(rng, in_ch: int, out_ch: int, first: bool):
    ks = jax.random.split(rng, 3)
    p: Params = {
        "conv1": nn.conv_init(ks[0], in_ch, out_ch, (3,)),
        "conv2": nn.conv_init(ks[1], out_ch, out_ch, (3,)),
    }
    s: State = {}
    p["bn2"], s["bn2"] = nn.bn_init(out_ch)
    if not first:
        p["bn1"], s["bn1"] = nn.bn_init(in_ch)
    if in_ch != out_ch:
        p["conv_downsample"] = nn.conv_init(ks[2], in_ch, out_ch, (1,))
    return p, s


def _res1d_apply(p: Params, s: State, x: jnp.ndarray, *, first: bool,
                 train: bool) -> Tuple[jnp.ndarray, State]:
    """1-D residual block (RawNet2Spoof.py:106-165), bn1 result discarded."""
    new_s = dict(s)
    if not first and train:
        _, new_s["bn1"] = nn.batch_norm(p["bn1"], s["bn1"], x, axis=1,
                                        train=True)
    out = nn.conv1d(p["conv1"], x, padding=(1, 1))
    out, new_s["bn2"] = nn.batch_norm(p["bn2"], s["bn2"], out, axis=1,
                                      train=train)
    out = nn.leaky_relu(out, 0.3)
    out = nn.conv1d(p["conv2"], out, padding=(1, 1))
    identity = x
    if "conv_downsample" in p:
        identity = nn.conv1d(p["conv_downsample"], x)
    out = out + identity
    return nn.max_pool(out, (3,)), new_s


def _gru_layer(p: Params, prefix: str, xs: jnp.ndarray, h0: jnp.ndarray
               ) -> jnp.ndarray:
    """One torch-semantics GRU layer over time. xs: (T, B, I) -> (T, B, H)."""
    w_ih = p[f"weight_ih_{prefix}"]      # (3H, I), gate order r,z,n
    w_hh = p[f"weight_hh_{prefix}"]      # (3H, H)
    b_ih = p[f"bias_ih_{prefix}"]
    b_hh = p[f"bias_hh_{prefix}"]
    hdim = w_hh.shape[1]

    # precompute input projections for all steps (one big MXU matmul)
    gi = jnp.einsum("tbi,gi->tbg", xs, w_ih) + b_ih

    def step(h, gi_t):
        gh = jnp.einsum("bh,gh->bg", h, w_hh) + b_hh
        i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1 - z) * n + z * h
        return h_new, h_new

    _, ys = jax.lax.scan(step, h0, gi)
    return ys


class RawNet2Model:
    def __init__(self, model_config: Dict[str, Any]):
        self.config = dict(model_config)
        filts = [model_config["filts"][0]] + [
            list(f) for f in model_config["filts"][1:]]
        self.n_sinc = filts[0]
        self.block_channels = [
            (filts[1][0], filts[1][1], True),    # block0 (first)
            (filts[1][1], filts[1][1], False),   # block1
            (filts[2][0], filts[2][1], False),   # block2 (20 -> 128)
            (filts[2][1], filts[2][1], False),   # block3 (in-place mutation)
            (filts[2][1], filts[2][1], False),   # block4
            (filts[2][1], filts[2][1], False),   # block5
        ]
        self.gru_node = model_config["gru_node"]
        self.nb_gru_layer = model_config["nb_gru_layer"]
        self.nb_fc_node = model_config["nb_fc_node"]
        self.nb_classes = model_config["nb_classes"]
        self.filterbank = L.sinc_filterbank(
            self.n_sinc, model_config["first_conv"])
        self.compute_dtype = jnp.dtype(model_config.get("dtype", "float32"))

    def init(self, rng: jax.Array) -> Tuple[Params, State]:
        ks = iter(jax.random.split(rng, 64))
        params: Params = {}
        state: State = {}
        params["first_bn"], state["first_bn"] = nn.bn_init(self.n_sinc)
        for i, (cin, cout, first) in enumerate(self.block_channels):
            bp, bs = _res1d_init(next(ks), cin, cout, first)
            params[f"block{i}"], state[f"block{i}"] = bp, bs
            params[f"fc_attention{i}"] = {
                "0": nn.linear_init(next(ks), cout, cout)}
        params["bn_before_gru"], state["bn_before_gru"] = nn.bn_init(
            self.block_channels[-1][1])
        gru: Params = {}
        in_dim = self.block_channels[-1][1]
        h = self.gru_node
        bound = 1.0 / np.sqrt(h)
        for layer in range(self.nb_gru_layer):
            i_dim = in_dim if layer == 0 else h
            gru[f"weight_ih_l{layer}"] = jax.random.uniform(
                next(ks), (3 * h, i_dim), minval=-bound, maxval=bound)
            gru[f"weight_hh_l{layer}"] = jax.random.uniform(
                next(ks), (3 * h, h), minval=-bound, maxval=bound)
            gru[f"bias_ih_l{layer}"] = jax.random.uniform(
                next(ks), (3 * h,), minval=-bound, maxval=bound)
            gru[f"bias_hh_l{layer}"] = jax.random.uniform(
                next(ks), (3 * h,), minval=-bound, maxval=bound)
        params["gru"] = gru
        params["fc1_gru"] = nn.linear_init(next(ks), h, self.nb_fc_node)
        params["fc2_gru"] = nn.linear_init(next(ks), self.nb_fc_node,
                                           self.nb_classes)
        return params, state

    def grad_mask(self, params: Params) -> Params:
        """Bool pytree of gradient-receiving params: every block's bn1 is
        structurally disconnected (output discarded, RawNet2Spoof.py:
        147-155 quirk) — torch skips None-grad params in its optimizers,
        so the trainer masks them out of optax (see AasistModel.grad_mask
        for the full rationale)."""
        mask = nn.all_true_mask(params)
        for i, (_, _, first) in enumerate(self.block_channels):
            if not first and "bn1" in mask[f"block{i}"]:
                mask[f"block{i}"]["bn1"] = nn.false_like(
                    mask[f"block{i}"]["bn1"])
        return mask

    def apply(self, params: Params, state: State, x: jnp.ndarray, *,
              train: bool = False, rng: Optional[jax.Array] = None,
              freq_aug: bool = False,
              speaker_embedding: Optional[jnp.ndarray] = None,
              dropout: Optional[bool] = None
              ) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], State]:
        del speaker_embedding  # accepted for the uniform Model contract
        # RawNet2 has no dropout layers (RawNet2Spoof.py); the kwarg is
        # accepted for the uniform differential-test contract
        del dropout
        rngs = RngStream(rng)
        new_state: State = {}
        x = x.astype(self.compute_dtype)
        bank = jnp.asarray(self.filterbank, dtype=self.compute_dtype)
        if freq_aug:
            aug = rngs.next()
            if aug is not None:
                bank = L.freq_mask_filterbank(aug, bank)
        h = L.sinc_frontend(bank, x)                      # (B, C, L')
        h = nn.max_pool(jnp.abs(h), (3,))
        h, new_state["first_bn"] = nn.batch_norm(
            params["first_bn"], state["first_bn"], h, axis=1, train=train)
        h = jax.nn.selu(h)

        for i, (cin, cout, first) in enumerate(self.block_channels):
            hb, new_state[f"block{i}"] = _res1d_apply(
                params[f"block{i}"], state[f"block{i}"], h, first=first,
                train=train)
            # FMS channel attention (RawNet2Spoof.py:249-295)
            y = jnp.mean(hb, axis=2)                      # (B, C)
            y = nn.linear(params[f"fc_attention{i}"]["0"], y)
            y = jax.nn.sigmoid(y)[:, :, None]             # (B, C, 1)
            h = hb * y + y

        h, new_state["bn_before_gru"] = nn.batch_norm(
            params["bn_before_gru"], state["bn_before_gru"], h, axis=1,
            train=train)
        h = jax.nn.selu(h)
        xs = jnp.transpose(h, (2, 0, 1))                  # (T, B, C)
        b = xs.shape[1]
        for layer in range(self.nb_gru_layer):
            h0 = jnp.zeros((b, self.gru_node), xs.dtype)
            xs = _gru_layer(params["gru"], f"l{layer}", xs, h0)
        last = xs[-1]                                     # (B, H)
        last_hidden = nn.linear(params["fc1_gru"], last)
        logits = nn.linear(params["fc2_gru"], last_hidden)
        output = jax.nn.log_softmax(logits, axis=1)
        return (last_hidden, output), new_state
