"""Native decoder robustness: malformed inputs must raise, never crash
or silently return wrong data (pre-screened outside pytest for segfault
safety before being committed as a suite test)."""

import numpy as np
import pytest

from aasist_tpu.data import flac_encode, flac_native


@pytest.fixture(scope="module")
def stream():
    rng = np.random.default_rng(0)
    x = np.clip(3000 * rng.standard_normal(20000), -32768, 32767)
    return flac_encode.encode(x.astype(np.int64))


def test_every_truncation_raises(stream):
    """A stream cut anywhere must raise — STREAMINFO declares the sample
    count, so silent partial decodes are data corruption."""
    for i in range(1, len(stream), 512):
        with pytest.raises(flac_native.FlacDecodeError):
            flac_native.read_flac_bytes(stream[:i])


def test_random_garbage_raises():
    for seed in range(50):
        r = np.random.default_rng(seed)
        blob = bytes(r.integers(0, 256, size=int(r.integers(10, 5000)),
                                dtype=np.uint8))
        with pytest.raises(flac_native.FlacDecodeError):
            flac_native.read_flac_bytes(b"fLaC" + blob)


def test_every_bitflip_detected(stream):
    """CRC-8/16 coverage: flipping any byte must be caught."""
    for pos in range(0, len(stream), 97):
        corrupted = bytearray(stream)
        corrupted[pos] ^= 0xFF
        with pytest.raises(flac_native.FlacDecodeError):
            flac_native.read_flac_bytes(bytes(corrupted))


def test_huge_declared_total_samples_raises(stream):
    """Round-4 review: a corrupt STREAMINFO declaring ~2^36 samples must
    raise FlacDecodeError, not abort the process via an uncaught
    std::bad_alloc from a multi-TB reserve (exceptions now stop at the
    C ABI; absurd declared sizes also skip the reserve)."""
    corrupted = bytearray(stream)
    # STREAMINFO total_samples: low 4 bits of byte 21 + bytes 22-25
    corrupted[21] |= 0x0F
    for i in (22, 23, 24, 25):
        corrupted[i] = 0xFF
    with pytest.raises(flac_native.FlacDecodeError):
        flac_native.read_flac_bytes(bytes(corrupted))
