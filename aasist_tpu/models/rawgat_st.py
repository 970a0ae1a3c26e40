"""RawGAT-ST: spectro-temporal graph attention baseline.

JAX re-implementation of `/root/reference/models/RawNetGatSpoofST.py`:
shared sinc frontend -> TWO independent 2-D residual encoders -> per-view
GAT + graph pool + linear projection to 12 nodes -> element-wise product
fusion of the views (`:349`) -> second GAT (32->16) -> pool to 7 nodes ->
per-node scalar projection -> 2-class head.

Differences from AASIST's graph stack, faithfully kept:
  * GraphAttentionLayer has no temperature (models/RawNetGatSpoofST.py:63-75)
  * GraphPool keeps a minimum of 2 nodes (`:126`)
  * the view named "T" is built from max-over-TIME (spectral nodes) and
    "S" from max-over-FREQ — the reference's own naming is swapped
    relative to AASIST (`:337-347`); node counts 23 / 29 respectively.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from aasist_tpu import nn
from aasist_tpu.nn import Params, RngStream, State
from aasist_tpu.models import layers as L


class RawGatStModel:
    def __init__(self, model_config: Dict[str, Any]):
        self.config = dict(model_config)
        self.filts = model_config["filts"]
        self.first_conv = model_config["first_conv"]
        self.filterbank = L.sinc_filterbank(self.filts[0], self.first_conv)
        self.block_channels = [tuple(self.filts[1]), tuple(self.filts[2]),
                               tuple(self.filts[3]), tuple(self.filts[4]),
                               tuple(self.filts[4]), tuple(self.filts[4])]
        self.compute_dtype = jnp.dtype(model_config.get("dtype", "float32"))
        # fused Pallas sinc frontend (aasist_tpu/ops/fused_frontend) —
        # identical chain to AASIST's (sinc conv + |.| + maxpool(3,3) +
        # BN(1) + SELU, reference RawNetGatSpoofST.py:324-334), so the
        # same eval-only kernel drops in; see models/aasist.py
        self.use_fused_frontend = bool(model_config.get(
            "use_fused_frontend", False))
        # set (by serving / callers) to a jax.sharding.Mesh for the
        # shard_map'd fused frontend under data parallelism
        self.spmd_mesh = None
        # round-5 retirement: dual-encoder stacking (measured NEUTRAL at
        # the real batch and compile-fragile at B=128) and the bn2 fold
        # (21% slower) moved to tools/eval_variants.py — see
        # AasistModel.__init__ for the rationale.  Fail loudly:
        _retired = [k for k in ("use_stacked_encoders", "stacked_mode",
                                "use_bn_fold") if k in model_config]
        if _retired:
            raise ValueError(
                f"model_config flags {_retired} were retired in round 5 "
                "(measured dead on-chip, docs/PERF.md); the variants "
                "live on in tools/eval_variants.py for A/B probes")

    def init(self, rng: jax.Array) -> Tuple[Params, State]:
        ks = iter(jax.random.split(rng, 32))
        params: Params = {}
        state: State = {}
        params["first_bn"], state["first_bn"] = nn.bn_init(1)
        for enc in ("encoder_T", "encoder_S"):
            ep, es = [], []
            for i, (cin, cout) in enumerate(self.block_channels):
                bp, bs = L.residual_block_init(next(ks), cin, cout,
                                               first=(i == 0))
                ep.append(bp)
                es.append(bs)
            params[enc], state[enc] = ep, es
        d = self.filts[-1][-1]
        for name, (i_d, o_d) in (("GAT_layer_T", (d, 32)),
                                 ("GAT_layer_S", (d, 32)),
                                 ("GAT_layer_ST", (32, 16))):
            params[name], state[name] = L.gat_init(next(ks), i_d, o_d)
        for name, dim in (("pool_T", 32), ("pool_S", 32), ("pool_ST", 16)):
            params[name] = L.graph_pool_init(next(ks), dim)
        params["proj_T"] = nn.linear_init(next(ks), 14, 12)
        params["proj_S"] = nn.linear_init(next(ks), 23, 12)
        params["proj_ST"] = nn.linear_init(next(ks), 16, 1)
        params["out_layer"] = nn.linear_init(next(ks), 7, 2)
        return params, state

    def grad_mask(self, params: Params) -> Params:
        """Bool pytree of gradient-receiving params: both encoders'
        residual blocks discard their bn1 output (reference quirk,
        RawNetGatSpoofST.py:258-278), so torch never updates those leaves
        — mirror with an optax mask (see AasistModel.grad_mask)."""
        mask = nn.all_true_mask(params)
        for enc in ("encoder_T", "encoder_S"):
            for bp in mask[enc]:
                if "bn1" in bp:
                    bp["bn1"] = nn.false_like(bp["bn1"])
        return mask

    def _encode(self, blocks_p, blocks_s, x, train):
        new_s = []
        e = x
        for i, bp in enumerate(blocks_p):
            e, bs = L.residual_block_apply(
                bp, blocks_s[i], e, first=(i == 0), train=train)
            new_s.append(bs)
        return e, new_s

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
        bank = jnp.asarray(self.filterbank, dtype=self.compute_dtype)
        if freq_aug:
            aug = rngs.next()
            if aug is not None:
                bank = L.freq_mask_filterbank(aug, bank)
        if self.use_fused_frontend and not train:
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

        e_t, new_state["encoder_T"] = self._encode(
            params["encoder_T"], state["encoder_T"], h, train)
        e_s, new_state["encoder_S"] = self._encode(
            params["encoder_S"], state["encoder_S"], h, train)

        # "T" view: max over time -> spectral nodes
        n_t = jnp.swapaxes(jnp.max(jnp.abs(e_t), axis=3), 1, 2)  # (B,F,C)
        gat_t, new_state["GAT_layer_T"] = L.gat_apply(
            params["GAT_layer_T"], state["GAT_layer_T"], n_t,
            temperature=1.0, train=train, rngs=rngs)
        pool_t = L.graph_pool_apply(params["pool_T"], gat_t, k=0.64,
                                    min_nodes=2, dropout_p=0.3, train=train,
                                    rngs=rngs)                 # (B,14,32)
        out_t = nn.linear(params["proj_T"], jnp.swapaxes(pool_t, 1, 2))

        # "S" view: max over freq -> temporal nodes
        n_s = jnp.swapaxes(jnp.max(jnp.abs(e_s), axis=2), 1, 2)  # (B,T,C)
        gat_s, new_state["GAT_layer_S"] = L.gat_apply(
            params["GAT_layer_S"], state["GAT_layer_S"], n_s,
            temperature=1.0, train=train, rngs=rngs)
        pool_s = L.graph_pool_apply(params["pool_S"], gat_s, k=0.81,
                                    min_nodes=2, dropout_p=0.3, train=train,
                                    rngs=rngs)                 # (B,23,32)
        out_s = nn.linear(params["proj_S"], jnp.swapaxes(pool_s, 1, 2))

        # spectro-temporal fusion: element-wise product (:349)
        st = out_t * out_s                                 # (B,32,12)
        gat_st, new_state["GAT_layer_ST"] = L.gat_apply(
            params["GAT_layer_ST"], state["GAT_layer_ST"],
            jnp.swapaxes(st, 1, 2), temperature=1.0, train=train, rngs=rngs)
        pool_st = L.graph_pool_apply(params["pool_ST"], gat_st, k=0.64,
                                     min_nodes=2, dropout_p=0.3,
                                     train=train, rngs=rngs)   # (B,7,16)
        proj_st = nn.linear(params["proj_ST"], pool_st)[..., 0]  # (B,7)
        output = nn.linear(params["out_layer"], proj_st)
        return (proj_st, output), new_state
