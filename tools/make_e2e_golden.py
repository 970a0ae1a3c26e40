"""End-to-end differential golden: torch reference pipeline on the
synthetic corpus.

Runs the ORIGINAL-geometry torch AASIST (pretrained AASIST.pth) through the
reference's full eval semantics — flac decode, `pad` crop-or-tile to 64,600
(data_utils.py:45-52), batched forward, score = logits[:, 1]
(main.py:377), score-file write (main.py:382-388), and
evaluation.calculate_tDCF_EER (evaluation.py:7-103) — over the framework's
deterministic synthetic mini-corpus, and commits the resulting per-utterance
scores + EER + min t-DCF as a golden.

tests/test_e2e_differential.py then regenerates the identical corpus and
asserts the aasist_tpu pipeline (native FLAC decode -> pad -> jit forward ->
scorefile -> metrics) reproduces these numbers: "pipeline parity", the
offline stand-in for the README.md:57 0.83% EER / 0.0275 t-DCF claim
(VERDICT.md next-round item 2).

Decode note: the reference decodes via soundfile/libsndfile, whose float32
output for 16-bit FLAC is exactly pcm / 32768.  soundfile is not installed
here, so this tool uses the framework's decoder (golden-tested to produce
pcm / 32768); any scale/codec divergence would surface as a score mismatch
in the differential test itself.

Corpus constants below MUST match tests/test_e2e_differential.py.
"""

import os
import sys
import tempfile

import numpy as np
import torch

REF = os.environ.get("AASIST_REFERENCE_PATH", "/root/reference")
REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
OUT = os.path.join(REPO, "tests", "goldens")
sys.path.insert(0, REF)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_goldens import build_original_aasist  # noqa: E402

# -- corpus definition (mirrored in tests/test_e2e_differential.py) -------
CORPUS_SEED = 77
N_TRAIN, N_DEV, N_EVAL = 4, 4, 48
FIXED_LEN = 64600
BATCH = 8

# -- big per-arch differential corpus (VERDICT r3 item 4: >=500 utts, all
# architectures).  Mirrored in tools/verify_reference_parity.py.  WAV
# container: the native FLAC decode path is already covered by the
# 48-utt quick differential; the big corpus optimizes generation time.
BIG_SEED = 99
BIG_TRAIN, BIG_DEV, BIG_EVAL = 2, 2, 512


def reference_pad(x: np.ndarray, max_len: int = FIXED_LEN) -> np.ndarray:
    """data_utils.py:45-52 semantics."""
    if x.shape[0] >= max_len:
        return x[:max_len]
    num_repeats = int(max_len / x.shape[0]) + 1
    return np.tile(x, num_repeats)[:max_len]


def main():
    import json

    import evaluation as ref_eval  # reference scoring module

    from aasist_tpu.data import synthetic
    from aasist_tpu.data.audio_io import read_audio
    from aasist_tpu.data.protocol import parse_protocol

    with open(os.path.join(REF, "config", "AASIST.conf")) as f:
        cfg = json.load(f)
    model = build_original_aasist(cfg["model_config"])
    sd = torch.load(os.path.join(REF, "models/weights/AASIST.pth"),
                    map_location="cpu")
    model.load_state_dict(sd, strict=True)
    model.eval()

    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "LA")
        synthetic.generate(root, n_train=N_TRAIN, n_dev=N_DEV,
                           n_eval=N_EVAL, seed=CORPUS_SEED)
        proto = os.path.join(
            root, "ASVspoof2019_LA_cm_protocols",
            "ASVspoof2019.LA.cm.eval.trl.txt")
        entries = parse_protocol(proto)
        flac_dir = os.path.join(root, "ASVspoof2019_LA_eval", "flac")

        rows, utt_ids = [], []
        for e in entries:
            wave, sr = read_audio(os.path.join(flac_dir, f"{e.utt_id}.flac"))
            assert sr == 16000
            rows.append(reference_pad(np.asarray(wave, np.float32)))
            utt_ids.append(e.utt_id)
        x = np.stack(rows)

        scores = []
        with torch.no_grad():
            for i in range(0, len(x), BATCH):
                _, logits = model(torch.from_numpy(x[i:i + BATCH]))
                scores.append(logits[:, 1].numpy())
        scores = np.concatenate(scores)

        # reference score-file format (main.py:382-388)
        cm_path = os.path.join(tmp, "scores.txt")
        with open(cm_path, "w") as fh:
            for e, sc in zip(entries, scores):
                fh.write(f"{e.utt_id} {e.src} {e.key} {sc}\n")
        asv_path = os.path.join(
            root, "ASVspoof2019_LA_asv_scores",
            "ASVspoof2019.LA.asv.eval.gi.trl.scores.txt")
        eer, min_tdcf = ref_eval.calculate_tDCF_EER(
            cm_path, asv_path, os.path.join(tmp, "tdcf.txt"),
            printout=False)

    np.savez(os.path.join(OUT, "e2e_differential_golden.npz"),
             utt_ids=np.array(utt_ids), scores=scores.astype(np.float32),
             eer=float(eer), min_tdcf=float(min_tdcf),
             corpus_seed=CORPUS_SEED,
             n_train=N_TRAIN, n_dev=N_DEV, n_eval=N_EVAL)
    print(f"e2e differential golden: {len(utt_ids)} utts, "
          f"EER={eer:.6f}% min t-DCF={min_tdcf:.6f}")


def _torch_model_for(arch: str):
    """Reference-side model for the big differential, eval mode.

    AASIST/AASIST-L load the shipped pretrained checkpoints; RawNet2 and
    RawGAT-ST (no published checkpoints) reuse the seeded state_dicts
    already committed inside the unit goldens, so both sides of the
    differential run the exact same weights without storing them twice.
    """
    import json

    def _load_sd_golden(model, golden_name):
        data = np.load(os.path.join(OUT, golden_name))
        sd = {k[len("sd__"):]: torch.from_numpy(data[k])
              for k in data.files if k.startswith("sd__")}
        model.load_state_dict(sd, strict=True)
        return model

    if arch in ("AASIST", "AASIST-L"):
        conf = "AASIST.conf" if arch == "AASIST" else "AASIST-L.conf"
        with open(os.path.join(REF, "config", conf)) as f:
            cfg = json.load(f)
        model = build_original_aasist(cfg["model_config"])
        sd = torch.load(os.path.join(REF, f"models/weights/{arch}.pth"),
                        map_location="cpu")
        model.load_state_dict(sd, strict=True)
    elif arch == "AASIST2":
        # the fork's own Model (Res2Net+SE encoder) with the seeded
        # state_dict committed in the AASIST2 unit golden
        from models.AASIST import Model as ForkAASIST
        with open(os.path.join(REF, "config", "AASIST2.conf")) as f:
            cfg = json.load(f)
        model = _load_sd_golden(ForkAASIST(cfg["model_config"]),
                                "aasist2_golden.npz")
    elif arch == "RawNet2":
        from models.RawNet2Spoof import Model as RawNet2
        with open(os.path.join(REF, "config",
                               "RawNet2_baseline.conf")) as f:
            cfg = json.load(f)
        model = _load_sd_golden(RawNet2(cfg["model_config"]),
                                "rawnet2_golden.npz")
    elif arch == "RawGATST":
        from models.RawNetGatSpoofST import Model as RawGATST
        with open(os.path.join(REF, "config",
                               "RawGATST_baseline.conf")) as f:
            cfg = json.load(f)
        model = _load_sd_golden(RawGATST(cfg["model_config"]),
                                "rawgatst_golden.npz")
    else:
        raise ValueError(arch)
    model.eval()
    return model


def main_big():
    """Per-arch big differential goldens: 512 eval utterances through the
    reference eval semantics (pad crop-or-tile, logits[:, 1] scoring,
    calculate_tDCF_EER) for every architecture in the zoo."""
    import json

    import evaluation as ref_eval

    from aasist_tpu.data import synthetic
    from aasist_tpu.data.audio_io import read_audio
    from aasist_tpu.data.protocol import parse_protocol

    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "LA")
        synthetic.generate(root, n_train=BIG_TRAIN, n_dev=BIG_DEV,
                           n_eval=BIG_EVAL, seed=BIG_SEED,
                           audio_format="wav")
        proto = os.path.join(
            root, "ASVspoof2019_LA_cm_protocols",
            "ASVspoof2019.LA.cm.eval.trl.txt")
        entries = parse_protocol(proto)
        wav_dir = os.path.join(root, "ASVspoof2019_LA_eval", "flac")

        rows, utt_ids = [], []
        for e in entries:
            wave, sr = read_audio(os.path.join(wav_dir, f"{e.utt_id}.wav"))
            assert sr == 16000
            rows.append(reference_pad(np.asarray(wave, np.float32)))
            utt_ids.append(e.utt_id)
        x = np.stack(rows)

        asv_path = os.path.join(
            root, "ASVspoof2019_LA_asv_scores",
            "ASVspoof2019.LA.asv.eval.gi.trl.scores.txt")

        archs = (sys.argv[sys.argv.index("--archs") + 1].split(",")
                 if "--archs" in sys.argv
                 else ("AASIST", "AASIST-L", "AASIST2", "RawNet2",
                       "RawGATST"))
        for arch in archs:
            model = _torch_model_for(arch)
            scores = []
            with torch.no_grad():
                for i in range(0, len(x), BATCH):
                    _, logits = model(torch.from_numpy(x[i:i + BATCH]))
                    scores.append(logits[:, 1].numpy())
            scores = np.concatenate(scores)

            cm_path = os.path.join(tmp, f"scores_{arch}.txt")
            with open(cm_path, "w") as fh:
                for e, sc in zip(entries, scores):
                    fh.write(f"{e.utt_id} {e.src} {e.key} {sc}\n")
            eer, min_tdcf = ref_eval.calculate_tDCF_EER(
                cm_path, asv_path, os.path.join(tmp, f"tdcf_{arch}.txt"),
                printout=False)

            out = os.path.join(OUT, f"e2e_diff_big_{arch}.npz")
            np.savez(out, utt_ids=np.array(utt_ids),
                     scores=scores.astype(np.float32),
                     eer=float(eer), min_tdcf=float(min_tdcf),
                     corpus_seed=BIG_SEED, n_train=BIG_TRAIN,
                     n_dev=BIG_DEV, n_eval=BIG_EVAL)
            print(f"{arch}: {len(utt_ids)} utts EER={eer:.6f}% "
                  f"min t-DCF={min_tdcf:.6f}")


if __name__ == "__main__":
    if "--big" in sys.argv:
        main_big()
    else:
        main()
