"""tools/preflight_la.py drill against the synthetic corpus.

VERDICT r4 item 8: a future real-corpus drop must go from mount to
parity verdict in one command — the preflight is that command's first
half, so it is exercised here end-to-end (pass case, broken-layout
cases, and the printed parity command).
"""

import os
import shutil
import subprocess
import sys

import pytest

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools",
                    "preflight_la.py")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from aasist_tpu.data import synthetic
    root = str(tmp_path_factory.mktemp("pf") / "LA")
    synthetic.generate(root, n_train=4, n_dev=4, n_eval=8, seed=31)
    return root


def _run(root, *args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable, TOOL, root, *args], env=env,
                          capture_output=True, text=True, timeout=300)


def test_preflight_passes_on_valid_corpus(corpus):
    res = _run(corpus)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "preflight PASSED" in res.stdout
    # the exact parity command is printed
    assert f"verify_reference_parity.py --database_path {corpus}" \
        in res.stdout
    # every split decoded through the production path
    for split in ("train", "dev", "eval"):
        assert f"ok   {split}: decoded" in res.stdout, res.stdout


def test_preflight_fails_on_missing_audio(corpus, tmp_path):
    broken = str(tmp_path / "LA")
    shutil.copytree(corpus, broken)
    # remove one eval utterance's audio
    flac = os.path.join(broken, "ASVspoof2019_LA_eval", "flac")
    victim = sorted(os.listdir(flac))[0]
    os.remove(os.path.join(flac, victim))
    res = _run(broken)
    assert res.returncode == 1
    assert "missing audio" in res.stdout


def test_preflight_fails_on_missing_protocol(corpus, tmp_path):
    broken = str(tmp_path / "LA")
    shutil.copytree(corpus, broken)
    os.remove(os.path.join(broken, "ASVspoof2019_LA_cm_protocols",
                           "ASVspoof2019.LA.cm.dev.trl.txt"))
    res = _run(broken)
    assert res.returncode == 1
    assert "protocol missing" in res.stdout


def test_preflight_fails_on_missing_asv_scores(corpus, tmp_path):
    broken = str(tmp_path / "LA")
    shutil.copytree(corpus, broken)
    os.remove(os.path.join(broken, "ASVspoof2019_LA_asv_scores",
                           "ASVspoof2019.LA.asv.eval.gi.trl.scores.txt"))
    res = _run(broken)
    assert res.returncode == 1
    assert "ASV score file missing" in res.stdout
