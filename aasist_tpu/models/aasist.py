"""AASIST / AASIST-L / AASIST2 — heterogeneous spectro-temporal GAT model.

Functional JAX re-implementation of the reference architecture
(`/root/reference/models/AASIST.py:728-921`), with two encoder variants:

  * ``encoder="residual"`` — the ORIGINAL NAVER (2,3)-kernel residual
    encoder the shipped checkpoints (AASIST.pth / AASIST-L.pth) were
    trained with.  The fork's Model drifted to a Res2Net encoder that
    cannot load those checkpoints (SURVEY.md "fork drift" #1); this
    framework keeps the weight-compatible geometry under the "AASIST"
    architecture name.
  * ``encoder="res2net"`` — the fork's Res2Net+SE encoder
    (models/AASIST.py:525-669), selected automatically when the config
    carries ``res2net_width``/``res2net_scale`` (as AASIST2.conf does),
    optionally with speaker conditioning (models/AASIST.py:325-415).

Forward dataflow (verified shapes for AASIST.conf, B x 64600 input):
  sinc conv (70 x 129)  -> (B, 70, 64472)            [AASIST.py:823]
  |.| + maxpool (3,3)   -> (B, 1, 23, 21490)         [AASIST.py:826-829]
  first_bn + selu
  6 residual blocks     -> (B, 64, 23, 29)           [AASIST.py:838]
  spectral view  max|e| over time -> 23 nodes (+pos_S) -> GAT -> pool
  temporal view  max|e| over freq -> 29 nodes          -> GAT -> pool
  2 x (HtrgGAT -> pool -> HtrgGAT + residual) branches with master nodes
  elementwise-max branch fusion ("MGO")               [AASIST.py:890-892]
  readout [max|T|, mean T, max|S|, mean S, master] -> (B, 5*gat_dims[1])
  dropout(0.5) -> Linear -> 2 logits
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aasist_tpu import nn
from aasist_tpu.nn import Params, RngStream, State
from aasist_tpu.models import layers as L


class AasistModel:
    """Static architecture object; parameters live in external pytrees."""

    def __init__(self, model_config: Dict[str, Any]):
        self.config = dict(model_config)
        self.filts = model_config["filts"]
        self.gat_dims = model_config["gat_dims"]
        self.pool_ratios = model_config["pool_ratios"]
        self.temperatures = model_config["temperatures"]
        self.first_conv = model_config["first_conv"]

        # fork heuristic: AASIST2.conf selects the Res2Net encoder purely by
        # carrying res2net_* keys while keeping architecture == "AASIST"
        self.encoder_type = model_config.get(
            "encoder",
            "res2net" if ("res2net_width" in model_config
                          or "res2net_scale" in model_config)
            else "residual")
        self.res2net_width = model_config.get("res2net_width", 14)
        self.res2net_scale = model_config.get("res2net_scale", 8)

        self.use_speaker_conditioning = bool(
            model_config.get("speaker_conditioning", False))
        self.spk_emb_dim = model_config.get("spk_emb_dim", 256)
        self.conditioning_level = model_config.get("conditioning_level",
                                                   "frame")
        self.use_attention = bool(model_config.get("use_attention", True))

        # precomputed deterministic sinc filterbank (AASIST.py:460-482)
        self.filterbank = L.sinc_filterbank(self.filts[0], self.first_conv)

        # compute dtype for the conv trunk (bf16 on TPU doubles MXU rate and
        # halves HBM traffic; callers cast params to match).  fp32 default.
        self.compute_dtype = jnp.dtype(model_config.get("dtype", "float32"))

        # fused Pallas frontend (aasist_tpu/ops/fused_frontend): sinc conv
        # + abs + maxpool(3,3) + bn + selu in one kernel — avoids the
        # (B, 70, 64472) HBM round-trip, ~41 -> ~12 ms at batch 256
        # (docs/PERF.md).  Eval-only; training uses the XLA path (the
        # kernel has no VJP).
        self.use_fused_frontend = bool(model_config.get(
            "use_fused_frontend", False))
        # set (by serving / callers) to a jax.sharding.Mesh to run the
        # fused frontend under data parallelism via shard_map — GSPMD
        # cannot partition the Pallas custom call by itself
        self.spmd_mesh = None
        # with the Pallas frontend in the program, XLA's block-0 conv
        # temporaries ((B,32,24,21490) bf16 twice) push the program past
        # HBM at batch 256 — lax.map over batch chunks runs block 0
        # sequentially per chunk, capping temp memory (docs/PERF.md r2)
        self.b0_chunks = int(model_config.get(
            "b0_chunks", 2 if self.use_fused_frontend else 1))
        # NOTE (round 3): mid-block Pallas kernels for block0 (a fused
        # frontend+conv1 head and a selu+concat epilogue) were built,
        # parity-tested, and measured SLOWER — any kernel inserted
        # between block0's convs breaks the XLA fusion web and the
        # neighbouring conv pays a 20-30 ms/batch-128 opaque-boundary
        # tax (docs/PERF.md round 3).  They were removed; only the
        # pre-conv1 fused frontend survives as a kernel insertion point.
        # NOTE (round 5): the other measured-dead eval reformulations
        # (use_poly_blocks -3%, use_aug_blocks neutral, use_bn_fold 21%
        # slower) were retired to tools/eval_variants.py — the product
        # model keeps exactly two eval paths: standard XLA and the
        # fused-frontend (+ b0_chunks) winner.  Retired flags fail
        # loudly rather than silently no-op:
        _retired = [k for k in ("use_poly_blocks", "use_aug_blocks",
                                "use_bn_fold") if model_config.get(k)]
        if _retired:
            raise ValueError(
                f"model_config flags {_retired} were retired in round 5 "
                "(measured dead on-chip, docs/PERF.md); the variants "
                "live on in tools/eval_variants.py for A/B probes")

        # rematerialize encoder blocks in the backward pass
        # (jax.checkpoint): the early blocks' activations are
        # (B, 32, 24, ~21k) — recomputing them costs ~1/3 extra encoder
        # FLOPs but shrinks the live set and the gradient graph enough
        # that full-length training fits/compiles at real batch sizes.
        self.remat = bool(model_config.get("remat", True))

        # encoder channel plan: filts[1..4] as (in, out) pairs, last repeated
        self.block_channels = [tuple(self.filts[1]), tuple(self.filts[2]),
                               tuple(self.filts[3]), tuple(self.filts[4]),
                               tuple(self.filts[4]), tuple(self.filts[4])]

    # ------------------------------------------------------------- init
    def init(self, rng: jax.Array) -> Tuple[Params, State]:
        ks = iter(jax.random.split(rng, 32))
        d_enc = self.filts[-1][-1]
        g0, g1 = self.gat_dims
        params: Params = {}
        state: State = {}

        fb_p, fb_s = nn.bn_init(1)
        params["first_bn"], state["first_bn"] = fb_p, fb_s

        enc_p, enc_s = [], []
        for i, (cin, cout) in enumerate(self.block_channels):
            if self.encoder_type == "res2net":
                bp, bs = L.res2net_block_init(
                    next(ks), cin, cout, first=(i == 0),
                    width=self.res2net_width, scale=self.res2net_scale)
            else:
                bp, bs = L.residual_block_init(next(ks), cin, cout,
                                               first=(i == 0))
            enc_p.append(bp)
            enc_s.append(bs)
        params["encoder"], state["encoder"] = enc_p, enc_s

        # spectral positional embedding: one node per post-frontend
        # frequency bin (filts[0] sinc channels maxpooled by 3 -> 23 at
        # the flagship 70).  The reference hardcodes 23 (AASIST.py:774)
        # and crashes at forward for any other filts[0]; deriving it
        # keeps bit-parity at 70 and makes shrunken configs runnable.
        params["pos_S"] = jax.random.normal(
            next(ks), (1, self.filts[0] // 3, d_enc))
        params["master1"] = jax.random.normal(next(ks), (1, 1, g0))
        params["master2"] = jax.random.normal(next(ks), (1, 1, g0))

        for name, (i_d, o_d) in (("GAT_layer_S", (d_enc, g0)),
                                 ("GAT_layer_T", (d_enc, g0))):
            params[name], state[name] = L.gat_init(next(ks), i_d, o_d)
        for name, (i_d, o_d) in (("HtrgGAT_layer_ST11", (g0, g1)),
                                 ("HtrgGAT_layer_ST12", (g1, g1)),
                                 ("HtrgGAT_layer_ST21", (g0, g1)),
                                 ("HtrgGAT_layer_ST22", (g1, g1))):
            params[name], state[name] = L.htrg_gat_init(next(ks), i_d, o_d)

        for name, dim in (("pool_S", g0), ("pool_T", g0), ("pool_hS1", g1),
                          ("pool_hT1", g1), ("pool_hS2", g1),
                          ("pool_hT2", g1)):
            params[name] = L.graph_pool_init(next(ks), dim)

        params["out_layer"] = nn.linear_init(next(ks), 5 * g1, 2)

        if self.use_speaker_conditioning:
            params["spk_cond_gat"] = L.speaker_cond_init(
                next(ks), self.spk_emb_dim, g1,
                use_attention=self.use_attention)
        return params, state

    def grad_mask(self, params: Params) -> Params:
        """Bool pytree marking params that ever RECEIVE gradients.

        The original residual encoder computes bn1 but discards its output
        (reference quirk kept for checkpoint parity —
        layers.residual_block_apply); torch therefore leaves those params'
        ``.grad`` as None and its optimizers SKIP them entirely: no Adam
        moments and, crucially, no L2 weight decay
        (`/root/reference/utils.py:72-93` + torch optimizer None-grad
        skip).  optax has no None-grad concept — ``add_decayed_weights``
        would hand every zero-grad bn1 leaf an lr-sized Adam step per
        batch (caught by the round-5 train differential).  The trainer
        wraps the optimizer in ``optax.masked`` with this mask.
        """
        mask = nn.all_true_mask(params)
        if self.encoder_type == "residual":
            for bp in mask["encoder"]:
                if "bn1" in bp:
                    bp["bn1"] = nn.false_like(bp["bn1"])
        return mask

    # ------------------------------------------------------------ apply
    def apply(
        self,
        params: Params,
        state: State,
        x: jnp.ndarray,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        freq_aug: bool = False,
        speaker_embedding: Optional[jnp.ndarray] = None,
        dropout: Optional[bool] = None,
    ) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], State]:
        """Forward pass: (B, L) waveform -> ((last_hidden, logits), state').

        ``dropout`` defaults to ``train``; ``dropout=False`` with
        ``train=True`` gives a deterministic train-mode forward (batch-stat
        BN + running-stat updates, no dropout) — the configuration the
        torch train-differential goldens are captured under.
        """
        rngs = RngStream(rng, dropout_enabled=(
            train if dropout is None else dropout))
        new_state: State = {}

        x = x.astype(self.compute_dtype)
        bank = jnp.asarray(self.filterbank, dtype=self.compute_dtype)
        if freq_aug:
            aug_rng = rngs.next()
            if aug_rng is None:
                raise ValueError("freq_aug requires an rng key")
            bank = L.freq_mask_filterbank(aug_rng, bank)
        if self.use_fused_frontend and not train:
            from aasist_tpu.ops.fused_frontend import fused_frontend_mesh
            x = fused_frontend_mesh(x, bank, params["first_bn"],
                                    state["first_bn"],
                                    mesh=self.spmd_mesh)
            new_state["first_bn"] = state["first_bn"]
        else:
            x = L.sinc_frontend(bank, x)                  # (B, C, L')
            x = jnp.abs(x)[:, None]                       # (B, 1, C, L')
            x = nn.max_pool(x, (3, 3))
            x, new_state["first_bn"] = nn.batch_norm(
                params["first_bn"], state["first_bn"], x, axis=1,
                train=train)
            x = jax.nn.selu(x)

        enc_s = []
        e = x
        start_block = 0
        if (self.use_fused_frontend and not train
                and self.encoder_type == "residual"
                and self.b0_chunks > 1):
            b = e.shape[0]
            nc = self.b0_chunks
            if b % nc:
                # chunking exists to keep the batch>=256 fused-frontend
                # program under HBM; rather than silently reverting to the
                # unchunked block0 (and possibly OOMing), fall back to the
                # largest divisor of the batch <= the requested count
                nc = max(d for d in range(1, nc + 1) if b % d == 0)
                import warnings
                warnings.warn(
                    f"b0_chunks={self.b0_chunks} does not divide batch "
                    f"size {b}; using {nc} chunks instead", stacklevel=2)
            if nc > 1:
                def _blk0(h):
                    out, _ = L.residual_block_apply(
                        params["encoder"][0], state["encoder"][0], h,
                        first=True, train=False)
                    return out

                ec = e.reshape((nc, b // nc) + e.shape[1:])
                e = jax.lax.map(_blk0, ec)
                e = e.reshape((b,) + e.shape[2:])
                enc_s.append(state["encoder"][0])
                start_block = 1
        for i, bp in enumerate(params["encoder"]):
            if i < start_block:
                continue
            if self.encoder_type == "res2net":
                block = functools.partial(
                    L.res2net_block_apply, first=(i == 0),
                    width=self.res2net_width, scale=self.res2net_scale,
                    train=train)
            else:
                block = functools.partial(
                    L.residual_block_apply, first=(i == 0), train=train)
            if train and self.remat:
                block = jax.checkpoint(block, static_argnums=())
            e, bs = block(bp, state["encoder"][i], e)
            enc_s.append(bs)
        new_state["encoder"] = enc_s                      # e: (B, C, F, T)

        t0, t1, t2 = self.temperatures[:3]
        r0, r1, r2 = self.pool_ratios[:3]

        # spectral view
        e_s = jnp.max(jnp.abs(e), axis=3)                 # (B, C, F)
        e_s = jnp.swapaxes(e_s, 1, 2) + params["pos_S"]   # (B, F, C)
        gat_s, new_state["GAT_layer_S"] = L.gat_apply(
            params["GAT_layer_S"], state["GAT_layer_S"], e_s,
            temperature=t0, train=train, rngs=rngs)
        out_s = L.graph_pool_apply(params["pool_S"], gat_s, k=r0,
                                   min_nodes=1, dropout_p=0.3, train=train,
                                   rngs=rngs)

        # temporal view
        e_t = jnp.max(jnp.abs(e), axis=2)                 # (B, C, T)
        e_t = jnp.swapaxes(e_t, 1, 2)                     # (B, T, C)
        gat_t, new_state["GAT_layer_T"] = L.gat_apply(
            params["GAT_layer_T"], state["GAT_layer_T"], e_t,
            temperature=t1, train=train, rngs=rngs)
        out_t = L.graph_pool_apply(params["pool_T"], gat_t, k=r1,
                                   min_nodes=1, dropout_p=0.3, train=train,
                                   rngs=rngs)

        def branch(tag: str, master_param: jnp.ndarray):
            l1, l2 = f"HtrgGAT_layer_ST{tag}1", f"HtrgGAT_layer_ST{tag}2"
            ph1, pt1 = f"pool_hS{tag}", f"pool_hT{tag}"
            # NB: reference passes the raw (1,1,D) master parameter, not a
            # batch-expanded copy (models/AASIST.py:859-860) — broadcast
            # semantics are identical.
            o_t, o_s, m, new_state[l1] = L.htrg_gat_apply(
                params[l1], state[l1], out_t, out_s, master_param,
                temperature=t2, train=train, rngs=rngs)
            o_s = L.graph_pool_apply(params[ph1], o_s, k=r2, min_nodes=1,
                                     dropout_p=0.3, train=train, rngs=rngs)
            o_t = L.graph_pool_apply(params[pt1], o_t, k=r2, min_nodes=1,
                                     dropout_p=0.3, train=train, rngs=rngs)
            t_aug, s_aug, m_aug, new_state[l2] = L.htrg_gat_apply(
                params[l2], state[l2], o_t, o_s, m,
                temperature=t2, train=train, rngs=rngs)
            return o_t + t_aug, o_s + s_aug, m + m_aug

        if train:
            out_t1, out_s1, master1 = branch("1", params["master1"])
            out_t2, out_s2, master2 = branch("2", params["master2"])
        else:
            # eval: run both branches as ONE vmapped computation — halves
            # the graph-stack op count (the branches are structurally
            # identical, differing only in parameters), a measurable
            # dispatch/layout saving at large batch (docs/PERF.md).  Same
            # math as the sequential path; no dropout/state updates in
            # eval, so vmap over stacked params is exact.
            stack = lambda *ts: jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *ts)
            bp = {
                "l1": stack(params["HtrgGAT_layer_ST11"],
                            params["HtrgGAT_layer_ST21"]),
                "l2": stack(params["HtrgGAT_layer_ST12"],
                            params["HtrgGAT_layer_ST22"]),
                "ph": stack(params["pool_hS1"], params["pool_hS2"]),
                "pt": stack(params["pool_hT1"], params["pool_hT2"]),
            }
            bs = {
                "l1": stack(state["HtrgGAT_layer_ST11"],
                            state["HtrgGAT_layer_ST21"]),
                "l2": stack(state["HtrgGAT_layer_ST12"],
                            state["HtrgGAT_layer_ST22"]),
            }
            masters = jnp.stack([params["master1"], params["master2"]])

            def one(bpi, bsi, m):
                null = RngStream(None)
                o_t, o_s, mm, _ = L.htrg_gat_apply(
                    bpi["l1"], bsi["l1"], out_t, out_s, m,
                    temperature=t2, train=False, rngs=null)
                o_s = L.graph_pool_apply(bpi["ph"], o_s, k=r2, min_nodes=1,
                                         dropout_p=0.3, train=False,
                                         rngs=null)
                o_t = L.graph_pool_apply(bpi["pt"], o_t, k=r2, min_nodes=1,
                                         dropout_p=0.3, train=False,
                                         rngs=null)
                t_aug, s_aug, m_aug, _ = L.htrg_gat_apply(
                    bpi["l2"], bsi["l2"], o_t, o_s, mm,
                    temperature=t2, train=False, rngs=null)
                return o_t + t_aug, o_s + s_aug, mm + m_aug

            (bt, bsig, bm) = jax.vmap(one, in_axes=(0, 0, 0))(
                bp, bs, masters)
            out_t1, out_s1, master1 = bt[0], bsig[0], bm[0]
            out_t2, out_s2, master2 = bt[1], bsig[1], bm[1]
            for l in ("HtrgGAT_layer_ST11", "HtrgGAT_layer_ST12",
                      "HtrgGAT_layer_ST21", "HtrgGAT_layer_ST22"):
                new_state[l] = state[l]

        out_t1 = nn.stream_dropout(rngs, out_t1, 0.2, train)
        out_t2 = nn.stream_dropout(rngs, out_t2, 0.2, train)
        out_s1 = nn.stream_dropout(rngs, out_s1, 0.2, train)
        out_s2 = nn.stream_dropout(rngs, out_s2, 0.2, train)
        master1 = nn.stream_dropout(rngs, master1, 0.2, train)
        master2 = nn.stream_dropout(rngs, master2, 0.2, train)

        out_t = jnp.maximum(out_t1, out_t2)               # max graph op
        out_s = jnp.maximum(out_s1, out_s2)
        master = jnp.maximum(master1, master2)

        if (self.use_speaker_conditioning and speaker_embedding is not None
                and self.conditioning_level == "frame"):
            out_t = L.speaker_cond_apply(
                params["spk_cond_gat"], out_t, speaker_embedding,
                level="frame", use_attention=self.use_attention)
            out_s = L.speaker_cond_apply(
                params["spk_cond_gat"], out_s, speaker_embedding,
                level="frame", use_attention=self.use_attention)

        t_max = jnp.max(jnp.abs(out_t), axis=1)
        t_avg = jnp.mean(out_t, axis=1)
        s_max = jnp.max(jnp.abs(out_s), axis=1)
        s_avg = jnp.mean(out_s, axis=1)
        last_hidden = jnp.concatenate(
            [t_max, t_avg, s_max, s_avg, master[:, 0]], axis=1)

        if (self.use_speaker_conditioning and speaker_embedding is not None
                and self.conditioning_level == "utterance"):
            last_hidden = L.speaker_cond_apply(
                params["spk_cond_gat"], last_hidden, speaker_embedding,
                level="utterance", use_attention=self.use_attention)

        last_hidden = nn.stream_dropout(rngs, last_hidden, 0.5, train)
        logits = nn.linear(params["out_layer"], last_hidden)
        return (last_hidden, logits), new_state


def count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))
