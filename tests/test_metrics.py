"""Scoring-engine golden tests: EER / t-DCF parity with the reference."""

import os

import numpy as np
import pytest

from aasist_tpu.evaluation import metrics

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def golden(golden_dir):
    return np.load(os.path.join(golden_dir, "metrics_golden.npz"))


def test_det_curve_matches_reference(golden):
    frr, far, thr = metrics.compute_det_curve(golden["bona"], golden["spoof"])
    np.testing.assert_array_equal(frr, golden["frr"])
    np.testing.assert_array_equal(far, golden["far"])
    np.testing.assert_array_equal(thr, golden["thresholds"])


def test_eer_matches_reference(golden):
    eer, thr = metrics.compute_eer(golden["bona"], golden["spoof"])
    assert eer == pytest.approx(float(golden["eer_cm"]), abs=0)
    assert thr == pytest.approx(float(golden["thr_cm"]), abs=0)


def test_asv_error_rates_match_reference(golden):
    pfa, pmiss, pmiss_spoof = metrics.obtain_asv_error_rates(
        golden["tar"], golden["non"], golden["spf"], float(golden["thr_asv"]))
    assert pfa == pytest.approx(float(golden["pfa_asv"]), abs=0)
    assert pmiss == pytest.approx(float(golden["pmiss_asv"]), abs=0)
    assert pmiss_spoof == pytest.approx(
        float(golden["pmiss_spoof_asv"]), abs=0)


def test_tdcf_curve_matches_reference(golden):
    curve, _ = metrics.compute_tdcf(
        golden["bona"], golden["spoof"], float(golden["pfa_asv"]),
        float(golden["pmiss_asv"]), float(golden["pmiss_spoof_asv"]))
    np.testing.assert_array_equal(curve, golden["tdcf_curve"])
    min_tdcf = float(curve[np.argmin(curve)])
    assert min_tdcf == pytest.approx(float(golden["min_tdcf"]), abs=0)


def test_eer_simple_separable():
    # perfectly separable scores -> EER 0 at some threshold
    eer, _ = metrics.compute_eer(
        np.array([3.0, 4.0, 5.0]), np.array([-1.0, 0.0, 1.0]))
    assert eer == 0.0


def test_eer_fully_overlapping():
    rng = np.random.default_rng(0)
    scores = rng.standard_normal(4000)
    eer, _ = metrics.compute_eer(scores[:2000], scores[2000:])
    assert 0.4 < eer < 0.6


def test_tdcf_rejects_hard_decisions():
    with pytest.raises(metrics.ScoringError):
        metrics.compute_tdcf(
            np.array([1.0, 1.0]), np.array([0.0, 0.0]),
            0.01, 0.01, 0.9)


def test_tdcf_rejects_nan():
    with pytest.raises(metrics.ScoringError):
        metrics.compute_tdcf(
            np.array([np.nan, 1.0, 0.5]), np.array([0.0, 0.2, 0.4]),
            0.01, 0.01, 0.9)


def _write_score_files(tmp_path, rng):
    cm = tmp_path / "cm.txt"
    asv = tmp_path / "asv.txt"
    lines = []
    for i in range(40):
        lines.append(f"U{i:03d} - bonafide {rng.normal(2.0, 1.0):.6f}")
    for i in range(60):
        lines.append(f"U{100+i:03d} A{7 + i % 13:02d} spoof "
                     f"{rng.normal(-1.0, 1.5):.6f}")
    cm.write_text("\n".join(lines) + "\n")
    asv_lines = []
    for i in range(50):
        asv_lines.append(f"s{i} target {rng.normal(3.0, 1.0):.6f}")
        asv_lines.append(f"s{i} nontarget {rng.normal(-3.0, 1.0):.6f}")
        asv_lines.append(f"s{i} spoof {rng.normal(0.0, 1.5):.6f}")
    asv.write_text("\n".join(asv_lines) + "\n")
    return cm, asv


def test_report_file_written_without_printout(tmp_path):
    """Round-4 review: the train loop requests per-epoch report files
    with printout=False; the old gate silently dropped every one."""
    rng = np.random.default_rng(11)
    cm, asv = _write_score_files(tmp_path, rng)
    out = tmp_path / "report.txt"
    eer, tdcf = metrics.calculate_tdcf_eer(cm, asv, out, printout=False)
    text = out.read_text()
    assert "CM SYSTEM" in text and "min-tDCF" in text
    assert f"{eer:8.9f}"[:6] in text
    assert "EER A07" in text   # per-attack breakdown present


def test_single_line_score_file(tmp_path):
    """Round-4 review: a 1-line CM file parses to a 1-D array; scoring
    must not crash on the column slice (--debug_subset n_dev=1)."""
    rng = np.random.default_rng(12)
    _, asv = _write_score_files(tmp_path, rng)
    cm = tmp_path / "one.txt"
    cm.write_text("U000 - bonafide 1.5\n")
    with pytest.raises(metrics.ScoringError):
        # one line -> <3 unique CM scores; the point is reaching the
        # sanity check instead of IndexError on cm_data[:, 1]
        metrics.calculate_tdcf_eer(cm, asv, printout=False)
