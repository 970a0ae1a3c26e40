"""Pipeline parity: full aasist_tpu eval pipeline vs the torch reference.

The golden (tests/goldens/e2e_differential_golden.npz, produced by
tools/make_e2e_golden.py in a torch environment) holds per-utterance
bonafide scores + EER + min t-DCF from the ORIGINAL-geometry torch AASIST
under the pretrained AASIST.pth, run through the reference's full eval
semantics (soundfile-equivalent decode, pad crop-or-tile
data_utils.py:45-52, logits[:, 1] scoring main.py:377,
evaluation.calculate_tDCF_EER) over the deterministic synthetic corpus.

This test regenerates the identical corpus and runs THIS framework's whole
pipeline — native FLAC decode, EvalBatcher padding, jitted forward with the
converted checkpoint, score-file writer, metrics engine — and asserts the
outputs agree: scores to 1e-4 (f32 conv accumulation-order drift), ranking
exactly, EER/min t-DCF as scored by our engine on our scores equal to the
reference's numbers on its own scores.  This converts the round-1 piecewise
parity chain into end-to-end "pipeline parity" (VERDICT.md item 2), the
offline stand-in for README.md:57's 0.83% EER / 0.0275 t-DCF.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "e2e_differential_golden.npz")

CORPUS_SEED = 77          # must mirror tools/make_e2e_golden.py
N_TRAIN, N_DEV, N_EVAL = 4, 4, 48


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def test_full_pipeline_matches_torch_reference(golden, tmp_path_factory):
    import jax

    from aasist_tpu.data import dataset as D
    from aasist_tpu.data import synthetic
    from aasist_tpu.data.protocol import parse_protocol, trial_metadata
    from aasist_tpu.evaluation.metrics import calculate_tdcf_eer
    from aasist_tpu.evaluation.scorefile import write_score_file
    from aasist_tpu.registry import build_model
    from aasist_tpu.train.checkpoints import load_weights
    from aasist_tpu.train.loop import produce_scores

    tmp = tmp_path_factory.mktemp("e2e_diff")
    root = tmp / "LA"
    synthetic.generate(root, n_train=N_TRAIN, n_dev=N_DEV, n_eval=N_EVAL,
                       seed=CORPUS_SEED)

    proto = (root / "ASVspoof2019_LA_cm_protocols" /
             "ASVspoof2019.LA.cm.eval.trl.txt")
    entries = parse_protocol(proto)
    files = [e.utt_id for e in entries]
    assert files == [str(u) for u in golden["utt_ids"]]

    conf = {
        "architecture": "AASIST",
        "first_conv": 128,
        "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
        "gat_dims": [64, 32],
        "pool_ratios": [0.5, 0.7, 0.5, 0.5],
        "temperatures": [2.0, 2.0, 100.0, 100.0],
    }
    model = build_model(conf)
    ckpt = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                        "AASIST.npz")
    params, state = load_weights(ckpt)

    batcher = D.EvalBatcher(
        D.AudioStore(root / "ASVspoof2019_LA_eval"), files,
        batch_size=8)
    ids, scores = produce_scores(model, params, state, batcher)
    assert ids == files

    scores = np.asarray(scores, np.float64)
    ref_scores = np.asarray(golden["scores"], np.float64)
    np.testing.assert_allclose(scores, ref_scores, atol=1e-4)
    # identical ranking => identical DET curve => identical EER/t-DCF
    assert np.array_equal(np.argsort(scores), np.argsort(ref_scores))

    cm_path = tmp / "scores.txt"
    write_score_file(cm_path, ids, scores.tolist(),
                     trial_metadata(entries))
    asv_path = (root / "ASVspoof2019_LA_asv_scores" /
                "ASVspoof2019.LA.asv.eval.gi.trl.scores.txt")
    eer, min_tdcf = calculate_tdcf_eer(cm_path, asv_path, printout=False)

    assert eer == pytest.approx(float(golden["eer"]), abs=1e-10)
    assert min_tdcf == pytest.approx(float(golden["min_tdcf"]), abs=1e-10)
    del jax  # imported to assert the CPU backend is configured (conftest)
