"""Training + evaluation orchestration.

The jit/pjit counterpart of the reference trainer
(`/root/reference/main.py:36-248,347-504`), restructured:

  * one fused jitted train step (forward + loss + grad + optimizer +
    BN-state update) instead of the reference's eager per-op loop with a
    per-batch ``time.sleep(0.01)`` (main.py:493 — not reproduced);
  * evaluation is a jitted batched forward producing bonafide scores
    ``logits[:, 1]`` (main.py:377), streamed into a score file keyed by
    utterance id;
  * per-epoch dev scoring, best-dev weight snapshots, optional full-eval
    on new best ("eval_all_best"), SWA snapshot on best-dev, final SWA
    swap + BN re-estimation + eval — the reference's epoch-level protocol
    (main.py:139-248) — plus full-state resume, which the reference lacks;
  * inputs arrive sharded along the batch axis of the device mesh; with a
    multi-device mesh this is data-parallel SPMD and the gradient psum is
    inserted by XLA automatically.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aasist_tpu.config import ExperimentConfig
from aasist_tpu.evaluation.metrics import calculate_tdcf_eer
from aasist_tpu.evaluation.scorefile import write_score_file
from aasist_tpu.train import checkpoints as ckpt_lib
from aasist_tpu.train.losses import make_loss_fn
from aasist_tpu.train.optim import create_optimizer, make_schedule
from aasist_tpu.train.swa import SWAState, reestimate_bn_stats
from aasist_tpu.utils.logging import MetricsLogger


# ------------------------------------------------------------------ steps
@dataclasses.dataclass(frozen=True)
class RobustOptions:
    """Robust-training options.

    These correspond to config keys the reference *ships* in
    AASIST-Robust.conf but never implements (SURVEY.md §5 "dormant" keys:
    use_mixup / mixup_alpha / label_smoothing / adv_training /
    adv_epsilon / adv_alpha / adv_steps / adv_ratio).  Here they are real:
    waveform mixup, and PGD adversarial training on the input waveform
    mixed into the loss at ``adv_ratio``.
    """

    use_mixup: bool = False
    mixup_alpha: float = 0.3
    adv_training: bool = False
    adv_epsilon: float = 0.02
    adv_alpha: float = 0.01
    adv_steps: int = 3
    adv_ratio: float = 0.5

    @classmethod
    def from_config(cls, cfg) -> "RobustOptions":
        ex = getattr(cfg, "extras", {}) or {}
        def b(v):
            return str(v).lower() in ("1", "true", "yes", "on", "t", "y")
        return cls(
            use_mixup=b(ex.get("use_mixup", False)),
            mixup_alpha=float(ex.get("mixup_alpha", 0.3)),
            adv_training=b(ex.get("adv_training", False)),
            adv_epsilon=float(ex.get("adv_epsilon", 0.02)),
            adv_alpha=float(ex.get("adv_alpha", 0.01)),
            adv_steps=int(ex.get("adv_steps", 3)),
            adv_ratio=float(ex.get("adv_ratio", 0.5)))


def make_train_step(model, loss_fn, optimizer, *, freq_aug: bool,
                    use_duration: bool,
                    robust: Optional["RobustOptions"] = None,
                    grad_accum_steps: int = 1,
                    mixed_precision: bool = False):
    """Build the fused jitted train step.

    Distinct input lengths (DCS buckets) trigger one compilation each —
    bounded by ``dynamic_chunk.num_buckets`` (static-shape rule).

    ``grad_accum_steps`` > 1 splits the batch into microbatches scanned
    sequentially, averaging gradients before one optimizer update: same
    effective batch with a ~1/k-sized compute graph (full-length AASIST
    at batch 24 exceeds this environment's remote-compiler limits as a
    single graph; 3 microbatches of 8 compile and run).  BN running
    statistics update per microbatch, like k sequential reference steps.
    """
    robust = robust or RobustOptions()
    if mixed_precision:
        # the model casts its input to compute_dtype; align it with the
        # bf16-cast parameters.  Reconfigure a private copy — the caller's
        # architecture object may back fp32 eval steps concurrently.
        from aasist_tpu.nn import with_compute_dtype
        model = with_compute_dtype(model, jnp.bfloat16)
    if grad_accum_steps > 1:
        micro = _make_loss_and_grads(model, loss_fn, freq_aug=freq_aug,
                                     use_duration=use_duration,
                                     robust=robust,
                                     mixed_precision=mixed_precision)

        def step(params, model_state, opt_state, x, y, dur, rng):
            k = grad_accum_steps
            b = x.shape[0]
            if b % k:
                # shape check happens at trace time (static shapes), so
                # this raises on the first batch rather than silently
                # training on b - b%k samples
                raise ValueError(
                    f"batch size {b} is not divisible by grad_accum_steps "
                    f"{k}; the tail {b % k} rows would be dropped — use a "
                    "divisible batch size or adjust grad_accum_steps")
            m = b // k
            xs = x[:m * k].reshape(k, m, *x.shape[1:])
            ys = y[:m * k].reshape(k, m)
            ds = dur[:m * k].reshape(k, m)

            def body(carry, sl):
                ms, grads_sum, loss_sum, corr_sum, r = carry
                r, sub = jax.random.split(r)
                (loss, (logits, new_ms)), grads = micro(
                    params, ms, sl[0], sl[1], sl[2], sub)
                grads_sum = jax.tree_util.tree_map(
                    jnp.add, grads_sum, grads)
                corr = jnp.sum(jnp.argmax(logits, axis=-1) == sl[1])
                return (new_ms, grads_sum, loss_sum + loss,
                        corr_sum + corr, r), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            (new_ms, grads, loss_sum, corr, _), _ = jax.lax.scan(
                body, (model_state, zeros, 0.0, 0, rng), (xs, ys, ds))
            grads = jax.tree_util.tree_map(lambda g: g / k, grads)
            updates, new_opt = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_ms, new_opt, loss_sum / k, corr

        return jax.jit(step, donate_argnums=(0, 1, 2))

    step = _make_plain_step(model, loss_fn, optimizer, freq_aug=freq_aug,
                            use_duration=use_duration, robust=robust,
                            mixed_precision=mixed_precision)
    return jax.jit(step, donate_argnums=(0, 1, 2))


def _make_plain_step(model, loss_fn, optimizer, *, freq_aug, use_duration,
                     robust, mixed_precision):
    """Unjitted single train step (shared by the jitted and chained forms)."""
    micro = _make_loss_and_grads(model, loss_fn, freq_aug=freq_aug,
                                 use_duration=use_duration, robust=robust,
                                 mixed_precision=mixed_precision)

    def step(params, model_state, opt_state, x, y, dur, rng):
        (loss, (logits, new_ms)), grads = micro(
            params, model_state, x, y, dur, rng)
        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        n_correct = jnp.sum(jnp.argmax(logits, axis=-1) == y)
        return new_params, new_ms, new_opt, loss, n_correct

    return step


def make_chained_train_step(model, loss_fn, optimizer, *, chain: int,
                            freq_aug: bool, use_duration: bool,
                            robust: Optional["RobustOptions"] = None,
                            mixed_precision: bool = False):
    """``chain`` sequential train steps inside ONE jitted dispatch.

    A lax.scan carries (params, model_state, opt_state, rng) through
    ``chain`` optimizer steps over stacked batches (chain, B, ...).  The
    rng is advanced by the SAME ``jax.random.split`` sequence the epoch
    loop performs per step, so chained training walks the identical data
    + rng stream as sequential training; the results differ only at the
    float-rounding level (scan vs straight-line programs schedule the
    same math differently — the usual compile-boundary equivalence
    class; tested in tests/test_train_stack.py).  Pays the per-dispatch
    host+RPC overhead (~50 ms/step measured on the tunneled chip,
    tools/probe_loop_fetch.py) once per group.  Requires fixed-shape
    batches (no DCS buckets) and grad_accum_steps == 1.
    """
    robust = robust or RobustOptions()
    if mixed_precision:
        from aasist_tpu.nn import with_compute_dtype
        model = with_compute_dtype(model, jnp.bfloat16)
    step = _make_plain_step(model, loss_fn, optimizer, freq_aug=freq_aug,
                            use_duration=use_duration, robust=robust,
                            mixed_precision=mixed_precision)

    def chained(params, model_state, opt_state, xs, ys, durs, rng):
        def body(carry, sl):
            p, ms, op, r = carry
            r, sub = jax.random.split(r)
            p, ms, op, loss, corr = step(p, ms, op, sl[0], sl[1], sl[2],
                                         sub)
            return (p, ms, op, r), (loss, corr)

        (p, ms, op, _), (losses, corrs) = jax.lax.scan(
            body, (params, model_state, opt_state, rng), (xs, ys, durs))
        return p, ms, op, losses, corrs

    return jax.jit(chained, donate_argnums=(0, 1, 2))


def _mixup_draw(mix_rng, alpha: float, n: int):
    """Mixup's (lam, perm) from one key — independent sub-keys for the two
    draws (reusing one key couples the beta sample and the permutation)."""
    lam_rng, perm_rng = jax.random.split(mix_rng)
    lam = jax.random.beta(lam_rng, alpha, alpha)
    perm = jax.random.permutation(perm_rng, n)
    return lam, perm


def _make_loss_and_grads(model, loss_fn, *, freq_aug: bool,
                         use_duration: bool, robust: "RobustOptions",
                         mixed_precision: bool = False):
    """Loss+grad of one (micro)batch: ((loss, aux), grads).

    ``mixed_precision`` runs the forward/backward in bfloat16 against
    float32 master parameters (the cast sits inside the differentiated
    function, so gradients arrive back in float32 for the optimizer; bf16
    has fp32's exponent range, so no loss scaling is needed).
    """

    def run(params, model_state, x, y, dur, rng):
        rng, mix_rng, adv_rng = jax.random.split(rng, 3)
        if mixed_precision:
            cast = lambda t: jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, t)
            model_state_c = cast(model_state)
        else:
            cast = lambda t: t
            model_state_c = model_state

        if robust.use_mixup:
            # waveform mixup: x' = lam*x + (1-lam)*x[perm], loss mixed the
            # same way over both label sets
            lam, perm = _mixup_draw(mix_rng, robust.mixup_alpha, x.shape[0])
            x_in = lam * x + (1 - lam) * x[perm]
            y2 = y[perm]
            dur2 = dur[perm] if dur is not None else None
        else:
            x_in, y2, dur2, lam = x, y, dur, 1.0

        if robust.use_mixup and use_duration:
            # ALMFT's margin is m = A*dur + B; for a mixed waveform the
            # "duration" of either source row alone is ill-defined, so
            # both loss terms score the sample at the lam-weighted mixed
            # duration — the margin tracks the actual mixed content
            # (tested in tests/test_train_stack.py)
            dur_mixed = lam * dur + (1.0 - lam) * dur2
        else:
            dur_mixed = dur

        def batch_loss(p, xb, step_rng):
            (_, logits), new_ms = model.apply(
                cast(p), model_state_c, xb, train=True, rng=step_rng,
                freq_aug=freq_aug)
            logits = logits.astype(jnp.float32)
            d = dur_mixed if use_duration else None
            d2 = dur_mixed if use_duration else None
            loss = loss_fn(logits, y, d)
            if robust.use_mixup:
                loss = lam * loss + (1 - lam) * loss_fn(logits, y2, d2)
            if mixed_precision:
                # BN running stats stay float32 in the carried state
                new_ms = jax.tree_util.tree_map(
                    lambda a, ref: a.astype(ref.dtype), new_ms, model_state)
            return loss, (logits, new_ms)

        if robust.adv_training:
            # PGD on the input waveform under the current parameters
            def input_loss(xb, step_rng):
                return batch_loss(params, xb, step_rng)[0]

            def pgd_step(i, x_adv):
                g = jax.grad(input_loss)(x_adv, adv_rng)
                x_adv = x_adv + robust.adv_alpha * jnp.sign(g)
                return x_in + jnp.clip(x_adv - x_in,
                                       -robust.adv_epsilon,
                                       robust.adv_epsilon)
            x_adv = jax.lax.fori_loop(0, robust.adv_steps, pgd_step, x_in)
            x_adv = jax.lax.stop_gradient(x_adv)

            def loss_of(p):
                clean, aux = batch_loss(p, x_in, rng)
                adv, _ = batch_loss(p, x_adv, adv_rng)
                return ((1 - robust.adv_ratio) * clean
                        + robust.adv_ratio * adv), aux
        else:
            def loss_of(p):
                return batch_loss(p, x_in, rng)

        return jax.value_and_grad(loss_of, has_aux=True)(params)

    return run


def make_eval_step(model):
    def fwd(params, model_state, x):
        (_, logits), _ = model.apply(params, model_state, x, train=False)
        return logits

    return jax.jit(fwd)


def make_chained_eval_step(model, chain: int, mesh=None):
    """Eval step over ``chain`` stacked batches in ONE dispatched call.

    ``x`` is (chain, B, L); a lax.scan runs the forward per batch inside
    one jitted program, so per-dispatch overhead (large on tunneled TPU
    backends — docs/PERF.md methodology) is paid once per ``chain``
    batches instead of once per batch.  Worth ~5-8% on top of 2-deep
    pipelining at batch 128 (bench.py's G-chaining, same mechanism).

    With ``mesh``, the stacked input gets an explicit
    ``P(None, "data")`` partition (chain dim replicated, batch dim
    sharded over the data axis — the same DP layout as the per-batch
    path) so chaining works under multi-chip serving too.
    """
    def fwd(params, model_state, xs):
        def body(_, x):
            (_, logits), _ = model.apply(params, model_state, x,
                                         train=False)
            return 0, logits
        _, all_logits = jax.lax.scan(body, 0, xs)
        return all_logits                       # (chain, B, n_classes)

    if mesh is None:
        return jax.jit(fwd)
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    from aasist_tpu.parallel.mesh import DATA_AXIS
    xsh = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.jit(fwd, in_shardings=(repl, repl, xsh),
                   out_shardings=repl)


# ------------------------------------------------------------- evaluation
def produce_scores(model, params, model_state, batcher,
                   eval_step=None, pipeline_depth: int = 2,
                   chain: int = 1, mesh=None) -> Tuple[list, list]:
    """Run batched inference; returns (utt_ids, bonafide scores).

    Equivalent of produce_evaluation_file's loop (main.py:364-380); the
    score is logits[:, 1].  Dispatch is pipelined ``pipeline_depth`` deep:
    jax dispatch is async, so fetching batch k's scores overlaps device
    compute of batch k+1 (and host decode of k+2 via the batcher's own
    prefetch) — this hides per-call dispatch latency, which is large on
    tunneled backends.

    ``chain`` > 1 additionally stacks that many same-shape batches into
    ONE dispatched call (``make_chained_eval_step``); the final partial
    group is padded by repeating its last batch and the padding rows are
    dropped on drain.  With ``chain`` > 1 a provided ``eval_step`` must
    be a CHAINED step over (chain, B, L) (from
    ``make_chained_eval_step`` — pass it when calling repeatedly, e.g.
    per epoch, to avoid re-jitting).
    """
    from aasist_tpu.utils.dispatch import pipelined

    ids, scores = [], []

    if chain > 1:
        chained_step = (eval_step if eval_step is not None
                        else make_chained_eval_step(model, chain,
                                                    mesh=mesh))

        def groups():
            gx, gu = [], []
            for x, utts, n_real in batcher:
                gx.append(x)
                gu.append(utts)
                if len(gx) == chain:
                    yield gx, gu
                    gx, gu = [], []
            if gx:
                # pad the final partial group by repeating its last
                # batch; the padding rows have no utt list and drop
                yield gx + [gx[-1]] * (chain - len(gx)), gu

        def dispatch(group):
            gx, gu = group
            try:
                out = chained_step(params, model_state, jnp.stack(gx))
            except (TypeError, ValueError) as e:
                raise ValueError(
                    f"produce_scores(chain={chain}) needs an eval_step "
                    "built by make_chained_eval_step(model, chain) over "
                    f"(chain, B, L) inputs; tracing it failed: {e}") from e
            if out.ndim != 3 or out.shape[0] != chain:
                # a plain make_eval_step result passed with chain > 1
                # would otherwise fail later with an opaque shape error
                # (or silently mis-score if broadcasting happens to work)
                raise ValueError(
                    f"produce_scores(chain={chain}) needs an eval_step "
                    "built by make_chained_eval_step(model, chain) — the "
                    f"provided step returned shape {out.shape}, expected "
                    f"({chain}, B, n_classes)")
            return out, gu

        def drain(ticket):
            logits, utt_lists = ticket
            arr = np.asarray(logits)            # (chain, B, n_classes)
            for g, utts in enumerate(utt_lists):
                ids.extend(utts)
                scores.extend(arr[g, :len(utts), 1].tolist())

        pipelined(groups(), dispatch, drain, depth=pipeline_depth)
        return ids, scores

    if eval_step is None:
        eval_step = make_eval_step(model)

    def dispatch(item):
        x, utts, n_real = item
        return eval_step(params, model_state, x), utts

    def drain(ticket):
        logits, utts = ticket
        s = np.asarray(logits[:, 1])
        ids.extend(utts)
        scores.extend(s[:len(utts)].tolist())

    pipelined(batcher, dispatch, drain, depth=pipeline_depth)
    return ids, scores


def evaluate_to_file(model, params, model_state, batcher, trial_meta,
                     score_path, eval_step=None, chain: int = 1,
                     mesh=None) -> None:
    # a chain longer than the whole set wastes padded forwards (the
    # final partial group repeats its last batch); clamp to the actual
    # batch count when the batcher exposes it.  Only safe without a
    # pre-built eval_step — a provided step is compiled for `chain`.
    utt_ids = getattr(batcher, "utt_ids", None)
    bs = getattr(batcher, "batch_size", None)
    if eval_step is None and utt_ids is not None and bs:
        n_batches = max(1, -(-len(utt_ids) // bs))
        chain = max(1, min(chain, n_batches))
    ids, scores = produce_scores(model, params, model_state, batcher,
                                 eval_step, chain=chain, mesh=mesh)
    write_score_file(score_path, ids, scores, trial_meta)


# ------------------------------------------------------------ orchestrator
@dataclasses.dataclass
class Loaders:
    train: Any
    dev: Any
    eval: Any
    dev_trial_meta: Dict
    eval_trial_meta: Dict


def run_training(
    cfg: ExperimentConfig,
    model,
    loaders: Loaders,
    run_dir,
    *,
    seed: int = 1234,
    resume: bool = False,
    asv_scores_path=None,
    max_epochs: Optional[int] = None,
    mesh=None,
) -> Dict[str, float]:
    """Full training protocol; returns final best metrics.

    With ``mesh`` given (and loaders built with the matching batch
    sharding), parameters/optimizer state are replicated across the mesh
    and every step runs data-parallel SPMD — XLA inserts the gradient
    all-reduce because the loss is a mean over the sharded batch.
    """
    run_dir = Path(run_dir)
    weights_dir = run_dir / "weights"
    metric_dir = run_dir / "metrics"
    weights_dir.mkdir(parents=True, exist_ok=True)
    metric_dir.mkdir(parents=True, exist_ok=True)
    log = MetricsLogger(run_dir)

    asv_scores_path = asv_scores_path or cfg.asv_scores()
    steps_per_epoch = len(loaders.train)
    cfg.optim_config.steps_per_epoch = steps_per_epoch
    cfg.optim_config.epochs = cfg.num_epochs

    optimizer = create_optimizer(
        cfg.optim_config, grad_mask=getattr(model, "grad_mask", None))
    schedule = make_schedule(cfg.optim_config)
    loss_fn, use_duration = make_loss_fn(cfg.loss, cfg)

    params, model_state = model.init(jax.random.PRNGKey(seed))
    opt_state = optimizer.init(params)
    if mesh is not None:
        from aasist_tpu.parallel import replicated_sharding
        repl = replicated_sharding(mesh)
        params = jax.device_put(params, repl)
        model_state = jax.device_put(model_state, repl)
        opt_state = jax.device_put(opt_state, repl)

    start_epoch = 0
    # NB: the reference initialises best_dev_eer = 1.0 (main.py:126) while
    # EERs are tracked in percent — with that threshold nothing is
    # checkpointed and SWA never updates until dev EER <= 1% (latent bug).
    # Initialise to the true maxima instead.
    best = {"dev_eer": 100.0, "eval_eer": 100.0, "dev_tdcf": 1.0,
            "eval_tdcf": 1.0}
    swa = SWAState()
    state_dir = run_dir / "train_state"
    if resume and (state_dir.exists() or
                   state_dir.with_name(state_dir.name + ".old").exists()):
        ck = ckpt_lib.load_train_state(state_dir, opt_state)
        params, model_state, opt_state = (ck.params, ck.model_state,
                                          ck.opt_state)
        start_epoch = ck.epoch + 1
        best["dev_eer"] = ck.best_dev_eer
        best["eval_eer"] = ck.best_eval_eer
        best["eval_tdcf"] = ck.best_eval_tdcf
        swa.n = ck.n_swa
        swa.avg = ck.swa_avg

    mp = str(cfg.extras.get("mixed_precision", False)).lower() in (
        "1", "true", "yes", "on", "t", "y")
    grad_accum = int(cfg.extras.get("grad_accum_steps", 1))
    train_step = make_train_step(
        model, loss_fn, optimizer, freq_aug=cfg.freq_aug,
        use_duration=use_duration, robust=RobustOptions.from_config(cfg),
        grad_accum_steps=grad_accum,
        mixed_precision=mp)
    # chained train dispatch: K optimizer steps per jitted call, same
    # data+rng stream as sequential, float-rounding-level drift only
    # (make_chained_train_step).  Needs fixed batch shapes (no DCS
    # buckets) and no grad accumulation.  Default OFF: with metric
    # fetches deferred (below), async dispatch already pipelines steps
    # and chaining measured exactly neutral on the tunneled chip
    # (tools/probe_loop_fetch.py: 254.4 vs 254.4 ms/step) — the knob
    # remains for higher-dispatch-cost environments.
    train_chain = int(cfg.extras.get("train_chain", 1))
    if cfg.dynamic_chunk.enabled or grad_accum > 1 or mesh is not None:
        # DCS buckets vary batch shapes; accumulation has its own scan;
        # under a DP mesh the stacked (K, B, ...) input would need its
        # own PartitionSpec — keep the proven per-step path there
        train_chain = 1
    chained_train_step = None
    if train_chain > 1:
        chained_train_step = make_chained_train_step(
            model, loss_fn, optimizer, chain=train_chain,
            freq_aug=cfg.freq_aug, use_duration=use_duration,
            robust=RobustOptions.from_config(cfg), mixed_precision=mp)
    # chained eval dispatch (docs/PERF.md: ~5-8% on tunneled TPU); off
    # on CPU where per-dispatch overhead is negligible.  Under a DP mesh
    # the chained step carries an explicit P(None, "data") input
    # partition (round 4 — the round-3 force-disable is gone).
    eval_chain = int(cfg.extras.get(
        "eval_chain", 4 if jax.default_backend() == "tpu" else 1))
    eval_step = (make_eval_step(model) if eval_chain == 1
                 else make_chained_eval_step(model, eval_chain, mesh=mesh))
    rng = jax.random.PRNGKey(seed + 1)

    n_epochs = max_epochs if max_epochs is not None else cfg.num_epochs
    global_step = start_epoch * steps_per_epoch
    # a resume that lands past the last epoch (crash during the final
    # SWA/eval phase) runs zero epochs — train_loss must still be bound
    train_loss = float("nan")
    for epoch in range(start_epoch, n_epochs):
        loaders.train.set_epoch(epoch)
        t0 = time.time()
        loss_sum, n_correct, n_seen = 0.0, 0, 0
        # (loss, corr) stay on-device until a progress print or epoch
        # end: fetching a scalar per step is a synchronous ~27 ms RPC
        # stall on tunneled backends (docs/PERF.md), and deferring it
        # lets dispatch of step k+1 overlap device compute of step k
        pending_metrics = []

        def drain_metrics():
            nonlocal loss_sum, n_correct, n_seen
            for dloss, dcorr, bs in pending_metrics:
                # per-step scalars from single steps; (K,) arrays from
                # chained groups (every batch in a group has size bs)
                a = np.asarray(dloss, np.float64)
                loss_sum += float(a.sum()) * bs
                n_correct += int(np.asarray(dcorr).sum())
                n_seen += bs * max(a.size, 1)
            pending_metrics.clear()

        def progress(batch_idx):
            drain_metrics()
            print(f"epoch {epoch:03d} batch {batch_idx}/"
                  f"{steps_per_epoch} loss={loss_sum / n_seen:.4f} "
                  f"acc={100 * n_correct / n_seen:.2f}% "
                  f"lr={float(schedule(global_step)):.2e}",
                  flush=True)

        group_x, group_y, group_d = [], [], []
        next_print = 0
        for batch_idx, (x, y, dur) in enumerate(loaders.train):
            if chained_train_step is not None:
                group_x.append(x)
                group_y.append(y)
                group_d.append(dur)
                if len(group_x) < train_chain:
                    continue
                # the chained step splits the carried rng once per inner
                # step with the same jax.random.split sequence as the
                # sequential path; mirror it host-side so resume/replay
                # stay bit-identical
                group_rng = rng
                for _ in range(train_chain):
                    rng, _ = jax.random.split(rng)
                params, model_state, opt_state, losses, corrs = \
                    chained_train_step(params, model_state, opt_state,
                                       jnp.stack(group_x),
                                       jnp.stack(group_y),
                                       jnp.stack(group_d), group_rng)
                pending_metrics.append((losses, corrs, group_x[0].shape[0]))
                group_x, group_y, group_d = [], [], []
                global_step += train_chain
            else:
                rng, sub = jax.random.split(rng)
                params, model_state, opt_state, loss, corr = train_step(
                    params, model_state, opt_state, x, y, dur, sub)
                pending_metrics.append((loss, corr, x.shape[0]))
                global_step += 1
            if batch_idx >= next_print:
                # per-batch progress (the reference's tqdm postfix:
                # loss/acc/lr — main.py:485-490)
                progress(batch_idx)
                next_print += 50
        # tail group smaller than train_chain: run it as single steps
        for x, y, dur in zip(group_x, group_y, group_d):
            rng, sub = jax.random.split(rng)
            params, model_state, opt_state, loss, corr = train_step(
                params, model_state, opt_state, x, y, dur, sub)
            pending_metrics.append((loss, corr, x.shape[0]))
            global_step += 1
        drain_metrics()
        train_loss = loss_sum / max(n_seen, 1)
        train_acc = 100.0 * n_correct / max(n_seen, 1)
        log.scalar("loss", train_loss, epoch)
        log.scalar("train_acc", train_acc, epoch)
        log.scalar("lr", float(schedule(global_step)), epoch)
        log.scalar("epoch_seconds", time.time() - t0, epoch)

        # dev scoring
        dev_score_path = metric_dir / "dev_score.txt"
        evaluate_to_file(model, params, model_state, loaders.dev,
                         loaders.dev_trial_meta, dev_score_path, eval_step,
                         chain=eval_chain)
        dev_eer, dev_tdcf = calculate_tdcf_eer(
            dev_score_path, asv_scores_path,
            metric_dir / f"dev_t-DCF_EER_{epoch}epo.txt", printout=False)
        log.scalar("dev_eer", dev_eer, epoch)
        log.scalar("dev_tdcf", dev_tdcf, epoch)

        best["dev_tdcf"] = min(dev_tdcf, best["dev_tdcf"])
        if best["dev_eer"] >= dev_eer:
            best["dev_eer"] = dev_eer
            ckpt_lib.save_weights(
                weights_dir / f"epoch_{epoch}_{dev_eer:03.3f}.npz",
                params, model_state)

            if cfg.eval_all_best:
                eval_score_path = run_dir / cfg.eval_output
                evaluate_to_file(model, params, model_state, loaders.eval,
                                 loaders.eval_trial_meta, eval_score_path,
                                 eval_step, chain=eval_chain)
                eval_eer, eval_tdcf = calculate_tdcf_eer(
                    eval_score_path, asv_scores_path,
                    metric_dir / f"t-DCF_EER_{epoch:03d}epo.txt",
                    printout=False)
                log_text = f"epoch{epoch:03d}, "
                if eval_eer < best["eval_eer"]:
                    log_text += f"best eer, {eval_eer:.4f}%"
                    best["eval_eer"] = eval_eer
                if eval_tdcf < best["eval_tdcf"]:
                    log_text += f"best tdcf, {eval_tdcf:.4f}"
                    best["eval_tdcf"] = eval_tdcf
                    ckpt_lib.save_weights(weights_dir / "best.npz",
                                          params, model_state)
                log.text(log_text)

            swa.update(params)

        log.scalar("best_dev_eer", best["dev_eer"], epoch)
        log.scalar("best_dev_tdcf", best["dev_tdcf"], epoch)

        ckpt_lib.save_train_state(state_dir, ckpt_lib.TrainCheckpoint(
            params=params, model_state=model_state, opt_state=opt_state,
            step=global_step, epoch=epoch,
            best_dev_eer=best["dev_eer"], best_eval_eer=best["eval_eer"],
            best_eval_tdcf=best["eval_tdcf"], n_swa=swa.n,
            swa_avg=swa.avg))

    # final: SWA swap + BN re-estimation + eval (main.py:212-248)
    if swa.n > 0:
        params = swa.avg
        loaders.train.set_epoch(n_epochs)
        model_state = reestimate_bn_stats(model, params, model_state,
                                          iter(loaders.train),
                                          mixed_precision=mp)

    eval_score_path = run_dir / cfg.eval_output
    evaluate_to_file(model, params, model_state, loaders.eval,
                     loaders.eval_trial_meta, eval_score_path, eval_step,
                     chain=eval_chain)
    eval_eer, eval_tdcf = calculate_tdcf_eer(
        eval_score_path, asv_scores_path, run_dir / "t-DCF_EER.txt",
        printout=False)
    log.text(f"EER: {eval_eer:.3f}, min t-DCF: {eval_tdcf:.5f}")
    ckpt_lib.save_weights(weights_dir / "swa.npz", params, model_state)

    if eval_eer <= best["eval_eer"]:
        best["eval_eer"] = eval_eer
    if eval_tdcf <= best["eval_tdcf"]:
        best["eval_tdcf"] = eval_tdcf
        ckpt_lib.save_weights(weights_dir / "best.npz", params, model_state)
    log.close()
    return {"eval_eer": best["eval_eer"], "eval_tdcf": best["eval_tdcf"],
            "dev_eer": best["dev_eer"], "final_eval_eer": eval_eer,
            "final_eval_tdcf": eval_tdcf, "train_loss": train_loss}
