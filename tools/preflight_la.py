"""Real-data preflight drill for an ASVspoof2019-LA directory.

VERDICT r4 item 8: the real-corpus parity run (README.md:57's 0.83% EER /
0.0275 min t-DCF) has been blocked on the zero-egress environment for
four rounds; when a corpus ever appears it must go from mount to parity
verdict in ONE command with no code edits.  This tool is the first half
of that command: it validates the directory layout end-to-end and prints
the exact parity invocation.

Checks, per split (train/dev/eval):
  * protocol file present, parses, and has a plausible row count
    (official LA counts printed for comparison: 25380 / 24844 / 71237);
  * labels: both bonafide and spoof rows present; eval carries A07-A19
    attack ids (the per-attack EER breakdown needs them);
  * audio: every protocol utterance resolves under ``<split>/flac/``
    (``--sample N`` bounds the existence sweep; default full);
  * one utterance per split actually DECODES through the production
    native-FLAC path (shape, dtype, sample count sanity).
Plus: the ASV score file exists and parses (target/nontarget/spoof).

Exit 0 = ready; the tail prints:

    python tools/verify_reference_parity.py --database_path <dir>

Tested against the synthetic corpus by tests/test_preflight_la.py.

Usage:
    python tools/preflight_la.py /path/to/LA [--sample 500]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# official ASVspoof2019-LA protocol row counts, for the report only
OFFICIAL_COUNTS = {"train": 25380, "dev": 24844, "eval": 71237}

PROTOCOLS = {
    "train": "ASVspoof2019.LA.cm.train.trn.txt",
    "dev": "ASVspoof2019.LA.cm.dev.trl.txt",
    "eval": "ASVspoof2019.LA.cm.eval.trl.txt",
}
AUDIO_DIRS = {
    "train": "ASVspoof2019_LA_train",
    "dev": "ASVspoof2019_LA_dev",
    "eval": "ASVspoof2019_LA_eval",
}
ASV_SCORES = os.path.join("ASVspoof2019_LA_asv_scores",
                          "ASVspoof2019.LA.asv.eval.gi.trl.scores.txt")

_problems = []


def problem(msg):
    print(f"FAIL {msg}")
    _problems.append(msg)


def ok(msg):
    print(f"ok   {msg}")


def check_split(root, split, sample):
    from aasist_tpu.data.dataset import AudioStore
    from aasist_tpu.data.protocol import parse_protocol

    proto = os.path.join(root, "ASVspoof2019_LA_cm_protocols",
                         PROTOCOLS[split])
    if not os.path.isfile(proto):
        problem(f"{split}: protocol missing: {proto}")
        return
    try:
        entries = parse_protocol(proto)
    except Exception as e:  # malformed lines
        problem(f"{split}: protocol unparseable: {e}")
        return
    n = len(entries)
    official = OFFICIAL_COUNTS[split]
    note = ("matches official" if n == official
            else f"official LA has {official}")
    ok(f"{split}: protocol {n} rows ({note})")

    n_bona = sum(1 for e in entries if e.key == "bonafide")
    n_spoof = n - n_bona
    if not n_bona or not n_spoof:
        problem(f"{split}: need both classes, got bonafide={n_bona} "
                f"spoof={n_spoof}")
    else:
        ok(f"{split}: bonafide={n_bona} spoof={n_spoof}")
    if split == "eval":
        attacks = sorted({e.src for e in entries if e.key != "bonafide"})
        if not attacks:
            problem("eval: no attack ids — per-attack EER breakdown "
                    "impossible")
        else:
            ok(f"eval: attack ids {attacks[0]}..{attacks[-1]} "
               f"({len(attacks)} systems)")

    audio_dir = os.path.join(root, AUDIO_DIRS[split])
    store = AudioStore(audio_dir)
    flac_dir = os.path.join(audio_dir, "flac")
    if not os.path.isdir(flac_dir):
        problem(f"{split}: audio dir missing: {flac_dir}")
        return
    to_check = entries if sample <= 0 else entries[:sample]
    missing = []
    for e in to_check:
        if not (os.path.exists(os.path.join(flac_dir, e.utt_id + ".flac"))
                or os.path.exists(os.path.join(flac_dir,
                                               e.utt_id + ".wav"))):
            missing.append(e.utt_id)
            if len(missing) >= 5:
                break
    if missing:
        problem(f"{split}: missing audio for {missing} "
                f"(first {len(missing)} of a bounded sweep)")
    else:
        scope = "all" if sample <= 0 else f"first {len(to_check)}"
        ok(f"{split}: audio present for {scope} protocol utterances")

    # one real decode through the production path
    try:
        wave = store.read(entries[0].utt_id)
    except Exception as e:
        problem(f"{split}: decode of {entries[0].utt_id} failed: {e}")
        return
    import numpy as np
    if wave.ndim != 1 or wave.size < 1600 or not np.isfinite(wave).all():
        problem(f"{split}: decoded {entries[0].utt_id} looks wrong: "
                f"shape={wave.shape} dtype={wave.dtype}")
    else:
        ok(f"{split}: decoded {entries[0].utt_id}: {wave.size} samples "
           f"({wave.size / 16000:.2f}s) {wave.dtype}")


def check_asv(root):
    import numpy as np
    path = os.path.join(root, ASV_SCORES)
    if not os.path.isfile(path):
        problem(f"ASV score file missing: {path}")
        return
    data = np.genfromtxt(path, dtype=str)
    if data.ndim != 2 or data.shape[1] < 2:
        problem(f"ASV score file malformed: shape {data.shape}")
        return
    kinds = set(data[:, -2])
    needed = {"target", "nontarget", "spoof"}
    if not needed <= kinds:
        problem(f"ASV score file lacks classes {needed - kinds}")
    else:
        ok(f"ASV scores: {data.shape[0]} rows, classes {sorted(kinds)}")


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("database_path", help="LA root directory")
    ap.add_argument("--sample", type=int, default=0,
                    help="bound the audio-existence sweep to the first N "
                         "protocol rows per split (0 = all)")
    args = ap.parse_args()

    root = args.database_path
    if not os.path.isdir(root):
        problem(f"not a directory: {root}")
    else:
        for split in ("train", "dev", "eval"):
            check_split(root, split, args.sample)
        check_asv(root)

    print()
    if _problems:
        print(f"preflight FAILED ({len(_problems)} problems) — fix the "
              "layout and rerun")
        return 1
    print("preflight PASSED — run the parity verdict with:")
    print(f"    python tools/verify_reference_parity.py "
          f"--database_path {root}")
    print("(expected for the pretrained AASIST checkpoint: "
          "0.83% EER / 0.0275 min t-DCF — reference README.md:57)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
