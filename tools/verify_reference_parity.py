"""Assert the published reference quality numbers on a real LA corpus.

The reference's headline result is EER 0.83 % / min t-DCF 0.0275 on
ASVspoof2019-LA eval with the pretrained AASIST checkpoint
(/root/reference/README.md:57).  This harness runs THIS framework's full
eval pipeline — native FLAC decode, EvalBatcher fixed-window padding,
jitted forward with the converted checkpoint, score-file writer, metrics
engine — and asserts the numbers, printing a one-line JSON verdict.

Real corpus::

    python tools/verify_reference_parity.py --database_path /path/to/LA/

asserts EER <= 0.84 % and min t-DCF <= 0.0276 (the published numbers plus
0.01/0.0001 of scoring-order headroom).

Without a corpus (offline CI) it dry-runs the identical logic on the
deterministic synthetic fixture and asserts exact agreement with the
torch-reference golden (tests/goldens/e2e_differential_golden.npz, the
same oracle as tests/test_e2e_differential.py)::

    python tools/verify_reference_parity.py            # synthetic dry-run

Exit code 0 iff the verdict passes.  See MIGRATION.md "Verifying parity".
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# published numbers (/root/reference/README.md:57) + scoring-order headroom
EER_THRESHOLD = 0.84        # %
TDCF_THRESHOLD = 0.0276

GOLDEN = os.path.join(REPO, "tests", "goldens",
                      "e2e_differential_golden.npz")
CKPT = os.path.join(REPO, "checkpoints", "AASIST.npz")

# must mirror tools/make_e2e_golden.py
CORPUS_SEED, N_TRAIN, N_DEV, N_EVAL = 77, 4, 4, 48
BIG_SEED, BIG_TRAIN, BIG_DEV, BIG_EVAL = 99, 2, 2, 512

FLAGSHIP_CONF = {
    "architecture": "AASIST",
    "first_conv": 128,
    "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
    "gat_dims": [64, 32],
    "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
}

AASIST_L_CONF = {  # ref config/AASIST-L.conf model_config
    "architecture": "AASIST",
    "first_conv": 128,
    "filts": [70, [1, 32], [32, 32], [32, 24], [24, 24]],
    "gat_dims": [24, 32],
    "pool_ratios": [0.4, 0.5, 0.7, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
}

RAWNET2_CONF = {
    "architecture": "RawNet2Spoof",
    "nb_samp": 64600, "first_conv": 1024, "in_channels": 1,
    "filts": [20, [20, 20], [20, 128], [128, 128]],
    "blocks": [2, 4], "nb_fc_node": 1024, "gru_node": 1024,
    "nb_gru_layer": 3, "nb_classes": 2,
}

RAWGATST_CONF = {
    "architecture": "RawNetGatSpoofST",
    "nb_samp": 64600, "first_conv": 128,
    "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
}

AASIST2_CONF = {  # ref config/AASIST2.conf model_config (fork Res2Net)
    "architecture": "AASIST",
    "nb_samp": 64600, "first_conv": 128,
    "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
    "gat_dims": [64, 32],
    "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
    "res2net_width": 14, "res2net_scale": 8,
    "speaker_conditioning": True, "spk_emb_dim": 256,
    "conditioning_level": "frame", "use_attention": True,
}

# per-arch (config, weight source, score tolerance).  RawNet2's score is
# a LogSoftmax output downstream of a 3-layer GRU(1024) — the longest f32
# accumulation chain in the zoo — so its tolerance is one decade looser;
# AASIST2's Res2Net split-conv + SE chains match its unit-golden class
# (1e-3).
BIG_ARCHS = {
    "AASIST": (FLAGSHIP_CONF, ("ckpt", "AASIST.npz"), 1e-4),
    "AASIST-L": (AASIST_L_CONF, ("ckpt", "AASIST-L.npz"), 1e-4),
    "AASIST2": (AASIST2_CONF, ("golden_sd", "aasist2_golden.npz"), 1e-3),
    "RawNet2": (RAWNET2_CONF, ("golden_sd", "rawnet2_golden.npz"), 1e-3),
    "RawGATST": (RAWGATST_CONF, ("golden_sd", "rawgatst_golden.npz"),
                 5e-4),
}


def _build_arch(arch: str):
    """Framework-side (model, params, state) for a BIG_ARCHS entry."""
    import jax

    from aasist_tpu.registry import build_model
    from aasist_tpu.train.checkpoints import load_weights
    from aasist_tpu.utils.torch_compat import fill_from_state_dict

    conf, (kind, name), _tol = BIG_ARCHS[arch]
    model = build_model(dict(conf))
    if kind == "ckpt":
        params, state = load_weights(
            os.path.join(REPO, "checkpoints", name))
    else:
        data = np.load(os.path.join(REPO, "tests", "goldens", name))
        sd = {k[len("sd__"):]: data[k] for k in data.files
              if k.startswith("sd__")}
        params, state = model.init(jax.random.PRNGKey(0))
        params, state = fill_from_state_dict(params, state, sd)
    return model, params, state


def _score_corpus(la_root: str, batch_size: int, out_dir: str,
                  model=None, params=None, state=None):
    """Full pipeline over `{la_root}/ASVspoof2019_LA_eval`: returns
    (utt_ids, scores, eer_pct, min_tdcf)."""
    from aasist_tpu.data import dataset as D
    from aasist_tpu.data.protocol import parse_protocol, trial_metadata
    from aasist_tpu.evaluation.metrics import calculate_tdcf_eer
    from aasist_tpu.evaluation.scorefile import write_score_file
    from aasist_tpu.registry import build_model
    from aasist_tpu.train.checkpoints import load_weights
    from aasist_tpu.train.loop import produce_scores

    proto = os.path.join(la_root, "ASVspoof2019_LA_cm_protocols",
                         "ASVspoof2019.LA.cm.eval.trl.txt")
    asv = os.path.join(la_root, "ASVspoof2019_LA_asv_scores",
                       "ASVspoof2019.LA.asv.eval.gi.trl.scores.txt")
    entries = parse_protocol(proto)
    files = [e.utt_id for e in entries]

    if model is None:
        model = build_model(dict(FLAGSHIP_CONF))
        params, state = load_weights(CKPT)
    batcher = D.EvalBatcher(
        D.AudioStore(os.path.join(la_root, "ASVspoof2019_LA_eval")),
        files, batch_size=batch_size)
    ids, scores = produce_scores(model, params, state, batcher)
    assert ids == files

    cm_path = os.path.join(out_dir, "parity_scores.txt")
    write_score_file(cm_path, ids, [float(s) for s in scores],
                     trial_metadata(entries))
    eer, min_tdcf = calculate_tdcf_eer(cm_path, asv, printout=False)
    return ids, np.asarray(scores, np.float64), eer, min_tdcf


def run_real(database_path: str, batch_size: int, out_dir: str) -> dict:
    _, _, eer, min_tdcf = _score_corpus(database_path, batch_size, out_dir)
    return {
        "mode": "real", "eer_pct": float(eer), "min_tdcf": float(min_tdcf),
        "eer_threshold": EER_THRESHOLD, "tdcf_threshold": TDCF_THRESHOLD,
        "pass": bool(eer <= EER_THRESHOLD and min_tdcf <= TDCF_THRESHOLD),
    }


def run_synthetic(batch_size: int, out_dir: str) -> dict:
    """Dry-run on the synthetic fixture: exact agreement with the
    torch-reference golden (same assertions as the e2e differential)."""
    from aasist_tpu.data import synthetic

    golden = np.load(GOLDEN)
    root = os.path.join(out_dir, "LA")
    synthetic.generate(root, n_train=N_TRAIN, n_dev=N_DEV, n_eval=N_EVAL,
                       seed=CORPUS_SEED)
    ids, scores, eer, min_tdcf = _score_corpus(root, batch_size, out_dir)

    ref_scores = np.asarray(golden["scores"], np.float64)
    max_diff = float(np.max(np.abs(scores - ref_scores)))
    rank_ok = bool(np.array_equal(np.argsort(scores),
                                  np.argsort(ref_scores)))
    eer_ok = abs(eer - float(golden["eer"])) < 1e-10
    tdcf_ok = abs(min_tdcf - float(golden["min_tdcf"])) < 1e-10
    return {
        "mode": "synthetic", "eer_pct": float(eer),
        "min_tdcf": float(min_tdcf),
        "golden_eer_pct": float(golden["eer"]),
        "golden_min_tdcf": float(golden["min_tdcf"]),
        "max_abs_score_diff": max_diff, "rank_identical": rank_ok,
        "pass": bool(max_diff < 1e-4 and rank_ok and eer_ok and tdcf_ok),
    }


def run_synthetic_big(arch: str, batch_size: int, out_dir: str) -> dict:
    """512-utterance per-arch differential vs the torch reference golden
    (tests/goldens/e2e_diff_big_{arch}.npz, tools/make_e2e_golden.py
    --big) — the scaled-up offline stand-in for the real-corpus run
    (VERDICT r3 item 4)."""
    from aasist_tpu.data import synthetic

    conf, _src, tol = BIG_ARCHS[arch]
    golden = np.load(os.path.join(REPO, "tests", "goldens",
                                  f"e2e_diff_big_{arch}.npz"))
    root = os.path.join(out_dir, "LA_big")
    marker = os.path.join(root, ".complete")
    if not os.path.exists(marker):  # shared across archs in one run;
        # a partial corpus from an interrupted run must regenerate, not
        # be silently reused (round-4 review)
        import shutil
        if os.path.isdir(root):
            shutil.rmtree(root)
        synthetic.generate(root, n_train=BIG_TRAIN, n_dev=BIG_DEV,
                           n_eval=BIG_EVAL, seed=BIG_SEED,
                           audio_format="wav")
        with open(marker, "w") as fh:
            fh.write("ok\n")
    model, params, state = _build_arch(arch)
    ids, scores, eer, min_tdcf = _score_corpus(
        root, batch_size, out_dir, model=model, params=params, state=state)
    assert list(ids) == [str(u) for u in golden["utt_ids"]]

    ref_scores = np.asarray(golden["scores"], np.float64)
    max_diff = float(np.max(np.abs(scores - ref_scores)))
    # rank agreement modulo genuine near-ties: two utterances whose
    # reference scores differ by less than 2*tol may legitimately swap
    order, ref_order = np.argsort(scores), np.argsort(ref_scores)
    swaps = order != ref_order
    tie_ok = bool(np.all(np.abs(ref_scores[order[swaps]]
                                - ref_scores[ref_order[swaps]]) < 2 * tol))
    rank_ok = bool(np.array_equal(order, ref_order)) or tie_ok
    eer_ok = abs(eer - float(golden["eer"])) < 1e-10
    tdcf_ok = abs(min_tdcf - float(golden["min_tdcf"])) < 1e-10
    return {
        "mode": "synthetic_big", "arch": arch, "n_eval": int(BIG_EVAL),
        "eer_pct": float(eer), "min_tdcf": float(min_tdcf),
        "golden_eer_pct": float(golden["eer"]),
        "golden_min_tdcf": float(golden["min_tdcf"]),
        "max_abs_score_diff": max_diff, "score_tol": tol,
        "rank_identical": rank_ok,
        "pass": bool(max_diff < tol and rank_ok and eer_ok and tdcf_ok),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--database_path", default=None,
                    help="real ASVspoof2019 LA root (contains "
                         "ASVspoof2019_LA_eval/ etc.); omit for the "
                         "synthetic dry-run")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--out_dir", default=None,
                    help="where to write the score file (default: tmp)")
    ap.add_argument("--big", action="store_true",
                    help="512-utterance per-arch differential over the "
                         "whole zoo (synthetic corpus)")
    ap.add_argument("--arch", default=None, choices=sorted(BIG_ARCHS),
                    help="with --big: restrict to one architecture")
    args = ap.parse_args(argv)

    out_dir = args.out_dir or tempfile.mkdtemp(prefix="parity_")
    os.makedirs(out_dir, exist_ok=True)
    if args.database_path:
        verdict = run_real(args.database_path, args.batch_size, out_dir)
    elif args.big:
        archs = [args.arch] if args.arch else sorted(BIG_ARCHS)
        per = {a: run_synthetic_big(a, args.batch_size, out_dir)
               for a in archs}
        verdict = {"mode": "synthetic_big", "archs": per,
                   "pass": all(v["pass"] for v in per.values())}
    else:
        verdict = run_synthetic(args.batch_size, out_dir)
    print(json.dumps(verdict))
    return 0 if verdict["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
