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

FLAGSHIP_CONF = {
    "architecture": "AASIST",
    "first_conv": 128,
    "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
    "gat_dims": [64, 32],
    "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
}


def _score_corpus(la_root: str, batch_size: int, out_dir: str):
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


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--database_path", default=None,
                    help="real ASVspoof2019 LA root (contains "
                         "ASVspoof2019_LA_eval/ etc.); omit for the "
                         "synthetic dry-run")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--out_dir", default=None,
                    help="where to write the score file (default: tmp)")
    args = ap.parse_args(argv)

    out_dir = args.out_dir or tempfile.mkdtemp(prefix="parity_")
    os.makedirs(out_dir, exist_ok=True)
    if args.database_path:
        verdict = run_real(args.database_path, args.batch_size, out_dir)
    else:
        verdict = run_synthetic(args.batch_size, out_dir)
    print(json.dumps(verdict))
    return 0 if verdict["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
