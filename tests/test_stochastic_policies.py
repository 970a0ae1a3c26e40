"""Distributional fidelity of the train-time stochastic policies.

VERDICT r4 item 5: freq-aug masking, pad_random cropping and the DCS
target draw are re-implemented with different RNGs than the reference
(jax PRNG / np.Generator vs the reference's global np.random + random),
so sample-for-sample goldens are impossible — instead these tests pin
each policy's SAMPLING LAW (exact support + uniformity) against the
reference's definition:

  * freq_aug   (models/layers.py freq_mask_filterbank   vs
                /root/reference/models/AASIST.py:485-490):
                width A = int(U[0,20)) -> U{0..19};
                start A0 = randint(0, C-A) INCLUSIVE of both ends.
  * pad_random (data/dataset.py pad_random vs data_utils.py:55-65):
                crop start = np.random.randint(n - max_len) — high
                EXCLUSIVE, so the last possible start is never drawn
                (reference quirk, mirrored); n == max_len would CRASH
                the reference (randint(0)) and is a documented fix here
                (returns x unchanged — docs/MIGRATION.md).
  * DCS        (data/dataset.py draw_chunk_targets / dynamic_chunk vs
                data_utils.py:68-97): target ~ U{min..max} INCLUSIVE
                (np.random.randint(min, max+1)); crop start ~
                U{0..n-target} INCLUSIVE (note the asymmetry vs
                pad_random — both faithfully mirrored).

Uniformity is checked with a chi-square statistic against a generous
6-sigma bound (no scipy dependency); support is checked exactly.
"""

import jax
import numpy as np

from aasist_tpu.data.dataset import (draw_chunk_targets, dynamic_chunk,
                                     pad_random)
from aasist_tpu.models.layers import freq_mask_filterbank


def chi_square_uniform(counts):
    """Chi-square statistic vs a uniform law over the observed bins and
    its 6-sigma acceptance bound (df + 6*sqrt(2 df))."""
    counts = np.asarray(counts, np.float64)
    e = counts.sum() / len(counts)
    chi2 = float(np.sum((counts - e) ** 2 / e))
    df = len(counts) - 1
    return chi2, df + 6.0 * np.sqrt(2.0 * df)


# ------------------------------------------------------------- freq_aug
def _mask_params(bank_masked, c):
    """Recover (width, start) from a masked filterbank."""
    zero_rows = np.where(~bank_masked.any(axis=1))[0]
    if len(zero_rows) == 0:
        return 0, None
    # the law zeroes one contiguous run
    assert np.array_equal(zero_rows,
                          np.arange(zero_rows[0], zero_rows[-1] + 1))
    return len(zero_rows), int(zero_rows[0])


def test_freq_aug_width_and_start_law():
    c = 70
    bank = np.ones((c, 5), np.float32)  # no intrinsically-zero rows
    n = 4000
    keys = jax.random.split(jax.random.PRNGKey(42), n)
    widths, starts = [], []
    masked = jax.vmap(lambda k: freq_mask_filterbank(k, bank))(keys)
    masked = np.asarray(masked)
    for i in range(n):
        w, s = _mask_params(masked[i], c)
        widths.append(w)
        if s is not None:
            starts.append((w, s))

    widths = np.asarray(widths)
    # exact support: A = int(U[0,20)) -> {0..19}, all attained at n=4000
    assert widths.min() == 0 and widths.max() == 19
    assert set(np.unique(widths)) == set(range(20))
    chi2, bound = chi_square_uniform(np.bincount(widths, minlength=20))
    assert chi2 < bound, (chi2, bound)

    # start support: A0 in {0..C-A} inclusive — check bounds for every
    # sample and that the INCLUSIVE upper end is attained overall
    top_hit = False
    for w, s in starts:
        assert 0 <= s <= c - w, (w, s)
        top_hit = top_hit or (s == c - w)
    assert top_hit, "inclusive upper start bound never drawn"

    # conditional uniformity of the start for the most common widths
    for w in (5, 10):
        ws = np.asarray([s for ww, s in starts if ww == w])
        if len(ws) < 100:
            continue
        chi2, bound = chi_square_uniform(
            np.bincount(ws, minlength=c - w + 1))
        assert chi2 < bound, (w, chi2, bound)


# ------------------------------------------------------------ pad_random
def test_pad_random_crop_start_law():
    n, max_len = 130, 100
    x = np.arange(n, dtype=np.float32)
    rng = np.random.default_rng(7)
    starts = []
    for _ in range(4000):
        y = pad_random(x, max_len, rng)
        assert y.shape == (max_len,)
        starts.append(int(y[0]))
    starts = np.asarray(starts)
    # reference law: np.random.randint(n - max_len) — HIGH EXCLUSIVE:
    # support is {0..n-max_len-1}; the last feasible start (30) is never
    # drawn (reference quirk, mirrored)
    assert starts.min() == 0
    assert starts.max() == n - max_len - 1, starts.max()
    chi2, bound = chi_square_uniform(
        np.bincount(starts, minlength=n - max_len))
    assert chi2 < bound, (chi2, bound)


def test_pad_random_exact_length_returns_input():
    """n == max_len crashes the reference (np.random.randint(0)); the
    framework returns the input unchanged — documented fix."""
    x = np.arange(100, dtype=np.float32)
    rng = np.random.default_rng(0)
    np.testing.assert_array_equal(pad_random(x, 100, rng), x)


def test_pad_random_short_tiles():
    x = np.arange(30, dtype=np.float32)
    rng = np.random.default_rng(0)
    y = pad_random(x, 100, rng)
    np.testing.assert_array_equal(y, np.tile(x, 4)[:100])


# ------------------------------------------------------------------ DCS
def test_dcs_target_draw_law():
    rng = np.random.default_rng(11)
    lo, hi = 16000, 96000
    t = draw_chunk_targets(rng, 20000, lo, hi)
    # inclusive support U{min..max} (np.random.randint(min, max+1))
    assert t.min() >= lo and t.max() <= hi
    # both inclusive ends reachable: bin into 40 equal cells and check
    # uniformity; explicitly check the extreme cells are populated
    cells = (t - lo) * 40 // (hi - lo + 1)
    counts = np.bincount(cells, minlength=40)
    assert counts[0] > 0 and counts[-1] > 0
    chi2, bound = chi_square_uniform(counts)
    assert chi2 < bound, (chi2, bound)


def test_dcs_crop_start_law_inclusive():
    """DCS crop start ~ U{0..n-target} INCLUSIVE (data_utils.py:90) —
    unlike pad_random's exclusive draw."""
    n, target = 120, 100
    x = np.arange(n, dtype=np.float32)
    rng = np.random.default_rng(3)
    starts = []
    for _ in range(3000):
        row, dur = dynamic_chunk(x, rng, target, target)
        assert row.shape == (target,)
        assert dur == target / 16000.0
        starts.append(int(row[0]))
    starts = np.asarray(starts)
    assert starts.min() == 0
    assert starts.max() == n - target        # inclusive upper end drawn
    chi2, bound = chi_square_uniform(
        np.bincount(starts, minlength=n - target + 1))
    assert chi2 < bound, (chi2, bound)


def test_dcs_short_tiles_and_pads():
    x = np.arange(40, dtype=np.float32)
    rng = np.random.default_rng(5)
    row, dur = dynamic_chunk(x, rng, 100, 104)
    np.testing.assert_array_equal(row[:100], np.tile(x, 3)[:100])
    np.testing.assert_array_equal(row[100:], np.zeros(4))
    assert dur == 100 / 16000.0
