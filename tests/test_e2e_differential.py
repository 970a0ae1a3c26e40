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
    """Drives tools/verify_reference_parity.py's synthetic dry-run — the
    same harness a user points at a real LA corpus with --database_path —
    and asserts its verdict plus the underlying golden agreement."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    try:
        import verify_reference_parity as vrp
    finally:
        sys.path.pop(0)

    tmp = tmp_path_factory.mktemp("e2e_diff")
    verdict = vrp.run_synthetic(batch_size=8, out_dir=str(tmp))

    assert verdict["pass"], verdict
    assert verdict["max_abs_score_diff"] < 1e-4
    assert verdict["rank_identical"]
    assert verdict["eer_pct"] == pytest.approx(float(golden["eer"]),
                                               abs=1e-10)
    assert verdict["min_tdcf"] == pytest.approx(float(golden["min_tdcf"]),
                                                abs=1e-10)
    # the harness and this test must agree on the oracle corpus
    assert (vrp.CORPUS_SEED, vrp.N_TRAIN, vrp.N_DEV, vrp.N_EVAL) == (
        CORPUS_SEED, N_TRAIN, N_DEV, N_EVAL)


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["AASIST", "AASIST-L", "AASIST2",
                                  "RawNet2", "RawGATST"])
def test_big_differential_per_arch(arch, tmp_path_factory):
    """512-utterance differential for every architecture in the zoo
    (VERDICT r3 item 4: >=500 utts, per-arch goldens).  AASIST/AASIST-L
    run the shipped pretrained checkpoints; RawNet2/RawGAT-ST run the
    seeded reference state_dicts committed in the unit goldens — both
    sides of the differential share exact weights either way.

    Runs the harness in a SUBPROCESS with the production environment:
    the suite's ``xla_force_host_platform_device_count=8`` virtual-mesh
    flag changes XLA-CPU conv reduction splits and inflates the f32
    score drift ~160x (measured: 4.4e-5 plain vs 7.1e-3 under the
    flag), which is an artifact of the test harness, not the pipeline.
    The 1e-4-class tolerances are calibrated for the real backend."""
    import json
    import subprocess
    import sys

    # one corpus dir for the whole module run (the harness regenerates
    # only when the completion marker is absent)
    tmp = tmp_path_factory.getbasetemp() / "e2e_big_shared"
    tmp.mkdir(exist_ok=True)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    tools_dir = os.path.join(os.path.dirname(__file__), "..", "tools")
    # force CPU via jax.config: the axon sitecustomize overrides the
    # JAX_PLATFORMS env var (tests/conftest.py docstring)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        f"import sys; sys.path.insert(0, {tools_dir!r})\n"
        "import verify_reference_parity as vrp\n"
        f"sys.exit(vrp.main(['--big', '--arch', {arch!r}, "
        f"'--batch_size', '32', '--out_dir', {str(tmp)!r}]))\n")
    res = subprocess.run(
        [sys.executable, "-c", code],
        env=env, capture_output=True, text=True, timeout=2700)
    line = next((ln for ln in res.stdout.splitlines()
                 if ln.startswith("{")), None)
    assert line, (res.returncode, res.stdout[-500:], res.stderr[-500:])
    verdict = json.loads(line)
    assert res.returncode == 0 and verdict["pass"], verdict
