"""Command-line entry point.

Same surface as the reference (`/root/reference/main.py:507-537`)::

    python -m aasist_tpu.cli --config configs/AASIST.conf [--eval]
        [--output_dir DIR] [--seed N] [--comment TAG] [--resume]

plus ``--debug_subset n_train n_dev n_eval`` replacing the reference's
hardcoded 100/50/50 debug slices (main.py:289,318,333 — fork drift #3),
and ``--resume`` for full train-state resume (absent in the reference).

Device handling: runs on whatever JAX backend is available (TPU in
production, CPU elsewhere) — no reference-style hard GPU gate
(main.py:84-87, drift #8).
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

import numpy as np


def default_eval_batch(arch: str, backend: str, train_bs: int,
                       eval_only: bool) -> int:
    """Dev/eval scoring batch default.

    On the standalone ``--eval`` path the measured-best serving batch
    per architecture applies (``serving.SERVING_BATCH_DEFAULTS``: the
    round-3 VERDICT's ~5x dispatch-granularity win).  DURING TRAINING
    the train batch is kept: the bf16 batch-24 train graph already
    peaks near HBM capacity, and a chained batch-128 eval program on
    top of the live train state OOMs the chip (measured, round-4
    on-TPU protocol run) — the reference's train-batch scoring
    (main.py:305-342) is memory-load-bearing there, not an accident.
    Non-TPU backends (tests, CPU smoke) also keep the train batch.
    """
    if backend != "tpu" or not eval_only:
        return train_bs
    from aasist_tpu.serving import SERVING_BATCH_DEFAULTS
    return SERVING_BATCH_DEFAULTS.get(arch, 128)


def build_loaders(cfg, seed: int, mesh=None, eval_only: bool = False):
    """Assemble train/dev/eval batchers (reference get_loader,
    main.py:262-344)."""
    from aasist_tpu.data import dataset as D
    from aasist_tpu.data import protocol as P
    from aasist_tpu.parallel import batch_sharding
    from aasist_tpu.train.loop import Loaders

    sharding = batch_sharding(mesh) if mesh is not None else None

    train_entries = P.parse_protocol(cfg.protocol_path("train"))
    dev_entries = P.parse_protocol(cfg.protocol_path("dev"))
    eval_entries = P.parse_protocol(cfg.protocol_path("eval"))

    labels, train_files = P.labels_and_files(train_entries)
    dev_files = [e.utt_id for e in dev_entries]
    eval_files = [e.utt_id for e in eval_entries]
    if cfg.debug_subset is not None:
        n_tr, n_dv, n_ev = cfg.debug_subset
        train_files = train_files[:n_tr]
        dev_files = dev_files[:n_dv]
        eval_files = eval_files[:n_ev]

    dcs = cfg.dynamic_chunk
    buckets = (D.bucket_lengths(dcs.min_samples, dcs.max_samples,
                                dcs.num_buckets) if dcs.enabled else None)

    # fixed train window: the fork trains on 6 s (96,000 samples,
    # data_utils.py:128); the original AASIST used the 64,600 eval window.
    # Overridable via the "train_fixed_length" config key.
    fixed_len = int(cfg.extras.get("train_fixed_length",
                                   D.FIXED_TRAIN_LEN))
    train = D.TrainBatcher(
        D.AudioStore(cfg.audio_dir("train")), train_files, labels,
        batch_size=cfg.batch_size, seed=seed, dcs_buckets=buckets,
        dcs_min=dcs.min_samples, dcs_max=dcs.max_samples,
        fixed_len=fixed_len, sharding=sharding)
    # dev/eval batch size: see default_eval_batch — serving batch on the
    # standalone --eval path, train batch while training (memory-safe
    # alongside the live train graph).  The "eval_batch_size" config
    # extra overrides both.
    import jax

    arch = cfg.model_config.get("architecture")
    default_eval_bs = default_eval_batch(
        arch, jax.default_backend(), cfg.batch_size, eval_only)
    eval_bs = int(cfg.extras.get("eval_batch_size", default_eval_bs))
    if mesh is not None:
        # the batch axis must divide the mesh's data axis
        from aasist_tpu.parallel.mesh import DATA_AXIS
        d = mesh.shape.get(DATA_AXIS, 1)
        eval_bs = max(d, (eval_bs // d) * d)
    dev = D.EvalBatcher(
        D.AudioStore(cfg.audio_dir("dev")), dev_files,
        batch_size=eval_bs, sharding=sharding)
    ev = D.EvalBatcher(
        D.AudioStore(cfg.audio_dir("eval")), eval_files,
        batch_size=eval_bs, sharding=sharding)
    return Loaders(train=train, dev=dev, eval=ev,
                   dev_trial_meta=P.trial_metadata(dev_entries),
                   eval_trial_meta=P.trial_metadata(eval_entries))


def load_model_weights(model, model_path):
    """Load pretrained weights: converted .npz, or .pth via converter."""
    model_path = Path(model_path)
    if model_path.suffix == ".npz":
        from aasist_tpu.train.checkpoints import load_weights
        return load_weights(model_path)
    if model_path.suffix == ".pth":
        from aasist_tpu.utils.torch_compat import convert_checkpoint
        return convert_checkpoint(model, model_path)
    raise ValueError(f"unsupported weights format: {model_path.suffix}")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="ASVspoof detection system (TPU-native)")
    parser.add_argument("--config", required=True)
    parser.add_argument("--output_dir", default="./exp_result")
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--eval", action="store_true",
                        help="evaluate the configured model and exit")
    parser.add_argument("--comment", default=None)
    parser.add_argument("--eval_model_weights", default=None)
    parser.add_argument("--resume", action="store_true",
                        help="resume training from the saved train state")
    parser.add_argument("--debug_subset", type=int, nargs=3, default=None,
                        metavar=("TRAIN", "DEV", "EVAL"))
    args = parser.parse_args(argv)

    from aasist_tpu.config import load_config
    from aasist_tpu.registry import build_model
    from aasist_tpu.utils.seed import set_seed

    cfg = load_config(args.config)
    cfg.seed = args.seed
    if args.debug_subset is not None:
        cfg.debug_subset = tuple(args.debug_subset)
    set_seed(args.seed)

    config_name = Path(args.config).stem
    run_dir = Path(args.output_dir) / cfg.model_tag(
        config_name, args.comment or "")
    run_dir.mkdir(parents=True, exist_ok=True)
    shutil.copy(args.config, run_dir / "config.conf")

    import jax
    print(f"Devices: {jax.devices()}")
    mesh = None
    n_dev = len(jax.devices())
    if n_dev > 1:
        # batch axis must divide the data axis; use the largest divisor
        d = max(k for k in range(1, n_dev + 1) if cfg.batch_size % k == 0)
        if d > 1:
            from aasist_tpu.parallel import make_mesh
            mesh = make_mesh(n_data=d)
            print(f"Data-parallel mesh: {d} devices")

    model = build_model(cfg.model_config)
    if mesh is not None and hasattr(model, "spmd_mesh"):
        # the fused Pallas frontend is a custom call GSPMD cannot
        # partition on its own; under a DP mesh the model must route it
        # through shard_map (fused_frontend_mesh).  Without this, a
        # config-set use_fused_frontend would hand the unsharded kernel
        # a sharded batch (round-4 review finding).
        model.spmd_mesh = mesh
    params, _ = model.init(jax.random.PRNGKey(0))
    from aasist_tpu.models.aasist import count_params
    print(f"no. model params: {count_params(params)}")

    loaders = build_loaders(cfg, args.seed, mesh=mesh,
                            eval_only=args.eval)

    if args.eval:
        from aasist_tpu.evaluation.metrics import calculate_tdcf_eer
        from aasist_tpu.train.loop import evaluate_to_file
        weights = args.eval_model_weights or cfg.model_path
        params, model_state = load_model_weights(model, weights)
        print(f"Model loaded : {weights}")
        print("Start evaluation...")
        eval_score_path = run_dir / cfg.eval_output
        # chained dispatch works under a DP mesh too (round 4): the
        # chained step shards the stacked input P(None, "data")
        # standalone --eval: the measured-best chain is 16 (bench.py /
        # docs/PERF.md, +5-8% over unchained at B=128); training-time
        # scoring keeps the conservative 4 (train/loop.py)
        eval_chain = int(cfg.extras.get(
            "eval_chain", 16 if jax.default_backend() == "tpu" else 1))
        evaluate_to_file(model, params, model_state, loaders.eval,
                         loaders.eval_trial_meta, eval_score_path,
                         chain=eval_chain, mesh=mesh)
        eer, tdcf = calculate_tdcf_eer(
            eval_score_path, cfg.asv_scores(), run_dir / "t-DCF_EER.txt")
        # reference writes the report twice on the eval-only path
        # (main.py:110-118: t-DCF_EER.txt and loaded_model_t-DCF_EER.txt)
        calculate_tdcf_eer(eval_score_path, cfg.asv_scores(),
                           run_dir / "loaded_model_t-DCF_EER.txt")
        print(f"DONE. EER: {eer:.3f}%, min t-DCF: {tdcf:.5f}")
        return 0

    from aasist_tpu.train.loop import run_training
    results = run_training(cfg, model, loaders, run_dir,
                           seed=args.seed, resume=args.resume, mesh=mesh)
    print("Exp FIN. EER: {:.3f}, min t-DCF: {:.5f}".format(
        results["eval_eer"], results["eval_tdcf"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
