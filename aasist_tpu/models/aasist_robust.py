"""AASIST-Robust: AASIST with adversarial-defence additions.

JAX re-implementation of `/root/reference/models/AASIST_Robust.py`:
AASIST's frontend/encoder/graph stack with
  * train-time Gaussian input noise scaled by the batch's own std
    (`AASIST_Robust.py:21-41`),
  * a train-time non-local-means feature denoising block applied to the
    freq-pooled encoder features and added back as a residual (`:44-87`,
    `:229-235`),
  * a SINGLE HtrgGAT branch (not AASIST's two-branch MGO; `:254-267`),
    with per-pool ratios [2]/[3] and the 4th temperature for the second
    Htrg layer,
  * an auxiliary head over globally-averaged encoder features plus a
    learnable 2-way ensemble: at inference
    ``softmax(w)[0]*logits + softmax(w)[1]*aux_logits`` (`:291-302`).

Geometry fix (SURVEY.md "fork drift" #5): as shipped, the reference's
Robust config crashes at forward — its CONV uses kernel 1024 / stride 256
(`:96-102`), collapsing time below what six MaxPool(1,3) stages need.
This rebuild uses the standard AASIST frontend geometry (kernel =
``first_conv``, stride 1), keeping every Robust-specific component.

Return contract kept from the reference: ``(ensemble_logits, logits)`` —
the trainer/evaluator read element [1], so training and scoring use the
main head, as the reference's call sites do (`main.py:376,459`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from aasist_tpu import nn
from aasist_tpu.nn import Params, RngStream, State
from aasist_tpu.models import layers as L


def _denoise_init(rng, channels: int) -> Tuple[Params, State]:
    ks = jax.random.split(rng, 4)
    p: Params = {
        "g": nn.conv_init(ks[0], channels, channels, (1,)),
        "theta": nn.conv_init(ks[1], channels, channels, (1,)),
        "phi": nn.conv_init(ks[2], channels, channels, (1,)),
        "W": nn.conv_init(ks[3], channels, channels, (1,)),
    }
    bn_p, bn_s = nn.bn_init(channels)
    p["bn"] = bn_p
    return p, {"bn": bn_s}


def _denoise_apply(p: Params, s: State, x: jnp.ndarray, *, train: bool
                   ) -> Tuple[jnp.ndarray, State]:
    """Non-local means denoising over (B, C, T) (AASIST_Robust.py:64-87)."""
    g = nn.conv1d(p["g"], x)
    theta = nn.conv1d(p["theta"], x)
    phi = nn.conv1d(p["phi"], x)
    att = jnp.einsum("bct,bcu->btu", theta, phi)
    att = jax.nn.softmax(att, axis=-1)
    y = jnp.einsum("bcu,btu->bct", g, att)
    w_y = nn.conv1d(p["W"], y)
    w_y, bn_s = nn.batch_norm(p["bn"], s["bn"], w_y, axis=1, train=train)
    return w_y + x, {"bn": bn_s}


class AasistRobustModel:
    def __init__(self, model_config: Dict[str, Any]):
        self.config = dict(model_config)
        self.filts = model_config["filts"]
        self.gat_dims = model_config["gat_dims"]
        self.pool_ratios = model_config["pool_ratios"]
        self.temperatures = model_config["temperatures"]
        self.first_conv = model_config["first_conv"]
        self.noise_sigma = float(model_config.get("noise_sigma", 0.1))
        self.filterbank = L.sinc_filterbank(self.filts[0], self.first_conv)
        self.block_channels = [tuple(self.filts[1]), tuple(self.filts[2]),
                               tuple(self.filts[3]), tuple(self.filts[4]),
                               tuple(self.filts[4]), tuple(self.filts[4])]
        self.compute_dtype = jnp.dtype(model_config.get("dtype", "float32"))
        self.use_fused_frontend = bool(model_config.get(
            "use_fused_frontend", False))
        # set (by serving / callers) to a jax.sharding.Mesh for the
        # shard_map'd fused frontend under data parallelism
        self.spmd_mesh = None

    def init(self, rng: jax.Array) -> Tuple[Params, State]:
        ks = iter(jax.random.split(rng, 32))
        d_enc = self.filts[-1][-1]
        g0, g1 = self.gat_dims
        params: Params = {}
        state: State = {}
        params["first_bn"], state["first_bn"] = nn.bn_init(1)
        ep, es = [], []
        for i, (cin, cout) in enumerate(self.block_channels):
            bp, bs = L.residual_block_init(next(ks), cin, cout,
                                           first=(i == 0))
            ep.append(bp)
            es.append(bs)
        params["encoder"], state["encoder"] = ep, es
        params["denoising"], state["denoising"] = _denoise_init(
            next(ks), d_enc)
        # derived (not the reference's hardcoded 23, AASIST.py:774) so
        # shrunken filts[0] configs stay runnable; identical at 70
        params["pos_S"] = jax.random.normal(
            next(ks), (1, self.filts[0] // 3, d_enc))
        params["master1"] = jax.random.normal(next(ks), (1, 1, g0))
        params["master2"] = jax.random.normal(next(ks), (1, 1, g0))
        for name, (i_d, o_d) in (("GAT_layer_S", (d_enc, g0)),
                                 ("GAT_layer_T", (d_enc, g0))):
            params[name], state[name] = L.gat_init(next(ks), i_d, o_d)
        for name, (i_d, o_d) in (("HtrgGAT_layer_ST1", (g0, g1)),
                                 ("HtrgGAT_layer_ST2", (g1, g1))):
            params[name], state[name] = L.htrg_gat_init(next(ks), i_d, o_d)
        for name, dim in (("pool_S", g0), ("pool_T", g0),
                          ("pool_hS", g1), ("pool_hT", g1)):
            params[name] = L.graph_pool_init(next(ks), dim)
        params["out_layer"] = nn.linear_init(next(ks), 4 * g1, 2)
        params["aux_out_layer"] = nn.linear_init(next(ks), d_enc, 2)
        params["ensemble_weight"] = jnp.asarray([0.8, 0.2], jnp.float32)
        return params, state

    def grad_mask(self, params: Params) -> Params:
        """Bool pytree of gradient-receiving params: the residual blocks'
        bn1 output is discarded (reference quirk), so torch never updates
        those leaves — mirror with an optax mask (see
        AasistModel.grad_mask for the full rationale)."""
        mask = nn.all_true_mask(params)
        for bp in mask["encoder"]:
            if "bn1" in bp:
                bp["bn1"] = nn.false_like(bp["bn1"])
        return mask

    def apply(self, params: Params, state: State, x: jnp.ndarray, *,
              train: bool = False, rng: Optional[jax.Array] = None,
              freq_aug: bool = False,
              speaker_embedding: Optional[jnp.ndarray] = None,
              dropout: Optional[bool] = None
              ) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], State]:
        del speaker_embedding  # uniform Model contract
        rngs = RngStream(rng, dropout_enabled=(
            train if dropout is None else dropout))
        new_state: State = {}
        x = x.astype(self.compute_dtype)

        if train and self.noise_sigma > 0:
            noise_rng = rngs.next()
            scale = self.noise_sigma * jax.lax.stop_gradient(jnp.std(x))
            x = x + scale * jax.random.normal(noise_rng, x.shape, x.dtype)

        bank = jnp.asarray(self.filterbank, dtype=self.compute_dtype)
        if freq_aug:
            aug = rngs.next()
            if aug is not None:
                bank = L.freq_mask_filterbank(aug, bank)
        if self.use_fused_frontend and not train:
            # same eval chain as AASIST (noise/denoise are train-only), so
            # the fused Pallas frontend drops in; see models/aasist.py
            from aasist_tpu.ops.fused_frontend import fused_frontend_mesh
            h = fused_frontend_mesh(x, bank, params["first_bn"],
                                    state["first_bn"],
                                    mesh=self.spmd_mesh)
            new_state["first_bn"] = state["first_bn"]
        else:
            h = L.sinc_frontend(bank, x)
            h = nn.max_pool(jnp.abs(h)[:, None], (3, 3))
            h, new_state["first_bn"] = nn.batch_norm(
                params["first_bn"], state["first_bn"], h, axis=1,
                train=train)
            h = jax.nn.selu(h)

        enc_s = []
        e = h
        for i, bp in enumerate(params["encoder"]):
            e, bs = L.residual_block_apply(bp, state["encoder"][i], e,
                                           first=(i == 0), train=train)
            enc_s.append(bs)
        new_state["encoder"] = enc_s

        e_flat = jnp.mean(e, axis=(2, 3))                 # aux features

        if train:
            e_dn = jnp.max(jnp.abs(e), axis=2)            # (B, C, T)
            e_dn, new_state["denoising"] = _denoise_apply(
                params["denoising"], state["denoising"], e_dn, train=True)
            e = e + e_dn[:, :, None, :]
        else:
            new_state["denoising"] = state["denoising"]

        t0, t1, t2, t3 = self.temperatures[:4]
        r0, r1, r2, r3 = self.pool_ratios[:4]

        e_s = jnp.swapaxes(jnp.max(jnp.abs(e), axis=3), 1, 2) + params["pos_S"]
        gat_s, new_state["GAT_layer_S"] = L.gat_apply(
            params["GAT_layer_S"], state["GAT_layer_S"], e_s,
            temperature=t0, train=train, rngs=rngs)
        out_s = L.graph_pool_apply(params["pool_S"], gat_s, k=r0,
                                   min_nodes=1, dropout_p=0.3, train=train,
                                   rngs=rngs)
        e_t = jnp.swapaxes(jnp.max(jnp.abs(e), axis=2), 1, 2)
        gat_t, new_state["GAT_layer_T"] = L.gat_apply(
            params["GAT_layer_T"], state["GAT_layer_T"], e_t,
            temperature=t1, train=train, rngs=rngs)
        out_t = L.graph_pool_apply(params["pool_T"], gat_t, k=r1,
                                   min_nodes=1, dropout_p=0.3, train=train,
                                   rngs=rngs)

        out_t, out_s, master, new_state["HtrgGAT_layer_ST1"] = \
            L.htrg_gat_apply(
                params["HtrgGAT_layer_ST1"], state["HtrgGAT_layer_ST1"],
                out_t, out_s, params["master1"],
                temperature=t2, train=train, rngs=rngs)
        out_s = L.graph_pool_apply(params["pool_hS"], out_s, k=r2,
                                   min_nodes=1, dropout_p=0.3, train=train,
                                   rngs=rngs)
        out_t = L.graph_pool_apply(params["pool_hT"], out_t, k=r3,
                                   min_nodes=1, dropout_p=0.3, train=train,
                                   rngs=rngs)
        t_aug, s_aug, m_aug, new_state["HtrgGAT_layer_ST2"] = \
            L.htrg_gat_apply(
                params["HtrgGAT_layer_ST2"], state["HtrgGAT_layer_ST2"],
                out_t, out_s, master, temperature=t3, train=train,
                rngs=rngs)
        out_t = out_t + t_aug
        out_s = out_s + s_aug

        out_t = nn.stream_dropout(rngs, out_t, 0.2, train)
        out_s = nn.stream_dropout(rngs, out_s, 0.2, train)

        t_max = jnp.max(jnp.abs(out_t), axis=1)
        t_avg = jnp.mean(out_t, axis=1)
        s_max = jnp.max(jnp.abs(out_s), axis=1)
        s_avg = jnp.mean(out_s, axis=1)
        out = jnp.concatenate([t_max, t_avg, s_max, s_avg], axis=1)
        out = nn.stream_dropout(rngs, out, 0.5, train)
        logits = nn.linear(params["out_layer"], out)
        aux_logits = nn.linear(params["aux_out_layer"], e_flat)

        w = jax.nn.softmax(params["ensemble_weight"])
        if train:
            ensemble = logits
        else:
            ensemble = w[0] * logits + w[1] * aux_logits
        return (ensemble, logits), new_state
