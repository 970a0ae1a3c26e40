"""Native C++ FLAC decoder tests.

Hermetic: streams are produced by the framework's pure-Python encoder
(aasist_tpu/data/flac_encode.py), decoded by the native library, and the
PCM must round-trip exactly.  Covers every subframe type, Rice partition
layout, stereo decorrelation mode, and the CRC error paths.
"""

import numpy as np
import pytest

pytest.importorskip("ctypes")

from aasist_tpu.data import flac_encode
from aasist_tpu.data import flac_native


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(0)
    t = np.arange(48000)
    x = (8000 * np.sin(2 * np.pi * 220 * t / 16000)
         + 200 * rng.standard_normal(len(t)))
    return np.clip(x, -32768, 32767).astype(np.int64)


def _roundtrip(x, bps=16, **kwargs):
    data = flac_encode.encode(x, bps=bps, **kwargs)
    y, sr = flac_native.read_flac_bytes(data)
    yi = np.round(y * (1 << (bps - 1))).astype(np.int64)
    return yi, sr, len(data)


@pytest.mark.parametrize("kwargs", [
    {},                              # fixed predictors, rice coding
    {"subframe_mode": "verbatim"},
    {"subframe_mode": "lpc2"},       # LPC decode path
    {"partition_order": 2},          # multi-partition rice
    {"escape_partitions": True},     # raw-bits escape path
    {"block_size": 192},             # coded block size
    {"block_size": 1000},            # explicit 16-bit block size
])
def test_mono_roundtrip(signal, kwargs):
    yi, sr, _ = _roundtrip(signal, **kwargs)
    assert sr == 16000
    np.testing.assert_array_equal(yi, signal)


def test_constant_subframe():
    x = np.full(5000, 123, np.int64)
    yi, _, nbytes = _roundtrip(x, subframe_mode="constant")
    np.testing.assert_array_equal(yi, x)
    assert nbytes < 200  # constant frames are tiny


@pytest.mark.parametrize("mid_side", [False, True])
def test_stereo_roundtrip(signal, mid_side):
    st = np.stack([signal, np.roll(signal, 7)], axis=1)
    yi, _, _ = _roundtrip(st, mid_side=mid_side)
    np.testing.assert_array_equal(yi, st)


def test_24bit_roundtrip(signal):
    x24 = signal * 197
    yi, _, _ = _roundtrip(x24, bps=24)
    np.testing.assert_array_equal(yi, x24)


def test_corruption_detected(signal):
    data = bytearray(flac_encode.encode(signal))
    data[1000] ^= 0xFF
    with pytest.raises(flac_native.FlacDecodeError):
        flac_native.read_flac_bytes(bytes(data))


def test_not_flac():
    with pytest.raises(flac_native.FlacDecodeError):
        flac_native.read_flac_bytes(b"RIFFxxxxWAVE" + b"\0" * 100)


def test_truncated_stream(signal):
    data = flac_encode.encode(signal)
    with pytest.raises(flac_native.FlacDecodeError):
        flac_native.read_flac_bytes(data[:len(data) // 2])


def test_file_roundtrip(tmp_path, signal):
    p = tmp_path / "x.flac"
    flac_encode.write_flac(p, signal)
    y, sr = flac_native.read_flac(p)
    yi = np.round(y * 32768).astype(np.int64)
    np.testing.assert_array_equal(yi, signal)
    # via the generic audio_io dispatch used by the data layer
    from aasist_tpu.data.audio_io import read_audio
    y2, sr2 = read_audio(p)
    np.testing.assert_array_equal(y2, y)


def test_synthetic_fixture_uses_flac(tmp_path):
    from aasist_tpu.data import synthetic
    from aasist_tpu.data.dataset import AudioStore
    ids = synthetic.generate(tmp_path / "LA", n_train=2, n_dev=2, n_eval=2,
                             seed=1, audio_format="flac")
    store = AudioStore(tmp_path / "LA" / "ASVspoof2019_LA_train")
    x = store.read(ids["train"][0])
    assert x.ndim == 1 and len(x) > 16000
    assert np.abs(x).max() <= 1.0
