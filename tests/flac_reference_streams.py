"""Hand-assembled FLAC streams built directly from RFC 9639 rules.

A second, INDEPENDENT implementation of FLAC stream assembly for
cross-oracle testing of the native decoder (VERDICT.md round-1 weakness 7:
the decoder was previously validated only against this repo's own encoder,
so a shared misreading of the spec could pass round-trip).  This module is
written bit-by-bit from the specification text — frame-header tables,
subframe layouts, Rice coding, stereo decorrelation — deliberately NOT
reusing aasist_tpu/data/flac_encode.py, and it emits stream features the
repo encoder never produces: wasted bits, high-order asymmetric LPC with a
nonzero shift, Rice escape partitions, the 5-bit Rice2 method, left-side /
right-side decorrelation, and the 192/8-bit/16-bit block-size header
encodings.

Every builder returns ``(stream_bytes, expected_int32_samples)`` where the
expectation is reconstructed by straightforward numpy implementations of
the spec's prediction equations (also independent of the C++ decoder).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


class Bits:
    """MSB-first bit writer (FLAC is a big-endian bit stream)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def u(self, value: int, width: int):
        assert 0 <= value < (1 << width), (value, width)
        self.acc = (self.acc << width) | value
        self.n += width
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def s(self, value: int, width: int):
        """Two's-complement signed."""
        assert -(1 << (width - 1)) <= value < (1 << (width - 1))
        self.u(value & ((1 << width) - 1), width)

    def unary(self, q: int):
        """q zero bits terminated by a one bit."""
        for _ in range(q):
            self.u(0, 1)
        self.u(1, 1)

    def pad_to_byte(self):
        if self.n:
            self.u(0, 8 - self.n)

    def data(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


# ------------------------------------------------------------------ CRCs
def crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0."""
    r = 0
    for b in data:
        r ^= b
        for _ in range(8):
            r = ((r << 1) ^ 0x07) & 0xFF if r & 0x80 else (r << 1) & 0xFF
    return r


def crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0."""
    r = 0
    for b in data:
        r ^= b << 8
        for _ in range(8):
            r = (((r << 1) ^ 0x8005) & 0xFFFF if r & 0x8000
                 else (r << 1) & 0xFFFF)
    return r


# -------------------------------------------------------- stream framing
def streaminfo(sample_rate: int, channels: int, bps: int,
               total_samples: int, min_bs: int = 16,
               max_bs: int = 65535) -> bytes:
    b = Bits()
    b.u(min_bs, 16)
    b.u(max_bs, 16)
    b.u(0, 24)                      # min frame size unknown
    b.u(0, 24)                      # max frame size unknown
    b.u(sample_rate, 20)
    b.u(channels - 1, 3)
    b.u(bps - 1, 5)
    b.u(total_samples, 36)
    b.u(0, 128)                     # md5 unknown
    body = b.data()
    assert len(body) == 34
    hdr = Bits()
    hdr.u(1, 1)                     # last metadata block
    hdr.u(0, 7)                     # type STREAMINFO
    hdr.u(len(body), 24)
    return b"fLaC" + hdr.data() + body


# block-size header codes: value -> (4-bit code, trailing field width)
def _blocksize_code(n: int, force: Optional[str] = None
                    ) -> Tuple[int, Optional[Tuple[int, int]]]:
    table = {192: 0b0001, 576: 0b0010, 1152: 0b0011, 2304: 0b0100,
             4608: 0b0101, 256: 0b1000, 512: 0b1001, 1024: 0b1010,
             2048: 0b1011, 4096: 0b1100, 8192: 0b1101, 16384: 0b1110,
             32768: 0b1111}
    if force == "u8" or (force is None and n not in table and n <= 256):
        return 0b0110, (n - 1, 8)
    if force == "u16" or (force is None and n not in table):
        return 0b0111, (n - 1, 16)
    return table[n], None


_SAMPLE_RATE_CODES = {88200: 0b0001, 176400: 0b0010, 192000: 0b0011,
                      8000: 0b0100, 16000: 0b0101, 22050: 0b0110,
                      24000: 0b0111, 32000: 0b1000, 44100: 0b1001,
                      48000: 0b1010, 96000: 0b1011}

_BPS_CODES = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110,
              32: 0b111}


def _utf8_frame_number(n: int) -> bytes:
    # frame indices < 128 encode as a single byte (all these fixtures)
    assert 0 <= n < 128
    return bytes([n])


def frame_header(block_size: int, sample_rate: int, ch_assign: int,
                 bps: int, frame_number: int,
                 blocksize_force: Optional[str] = None,
                 rate_from_streaminfo: bool = False) -> bytes:
    b = Bits()
    b.u(0b11111111111110, 14)       # sync
    b.u(0, 1)                       # reserved
    b.u(0, 1)                       # fixed block-size stream
    bs_code, bs_tail = _blocksize_code(block_size, blocksize_force)
    b.u(bs_code, 4)
    sr_code = (0b0000 if rate_from_streaminfo
               else _SAMPLE_RATE_CODES[sample_rate])
    b.u(sr_code, 4)
    b.u(ch_assign, 4)
    b.u(_BPS_CODES[bps], 3)
    b.u(0, 1)                       # reserved
    head = b.data() + _utf8_frame_number(frame_number)
    tail = Bits()
    if bs_tail is not None:
        tail.u(*bs_tail)
    head += tail.data()
    return head + bytes([crc8(head)])


# ------------------------------------------------------------- subframes
def rice_fold(res: np.ndarray) -> np.ndarray:
    """Signed residual -> unsigned zigzag (positive -> 2v, negative ->
    -2v-1)."""
    res = np.asarray(res, np.int64)
    return np.where(res >= 0, 2 * res, -2 * res - 1)


def write_rice_partitioned(
        b: Bits, res: Sequence[int], pred_order: int, block_size: int,
        partition_order: int, params: Sequence[Optional[int]],
        method: int = 0, escape_bits: Optional[Sequence[int]] = None):
    """Residual section: method (00 rice4 / 01 rice5), partition order,
    then 2^po partitions.  params[i] is the Rice parameter, or None for an
    escape partition whose raw width comes from escape_bits[i]."""
    assert method in (0, 1)
    pwidth = 4 if method == 0 else 5
    escape_code = (1 << pwidth) - 1
    nparts = 1 << partition_order
    assert len(params) == nparts
    b.u(method, 2)
    b.u(partition_order, 4)
    res = list(res)
    pos = 0
    for i in range(nparts):
        count = block_size >> partition_order
        if i == 0:
            count -= pred_order
        part = res[pos:pos + count]
        pos += count
        if params[i] is None:
            raw = escape_bits[i]
            b.u(escape_code, pwidth)
            b.u(raw, 5)
            for v in part:
                if raw:
                    b.s(v, raw)
                else:
                    assert v == 0
        else:
            k = params[i]
            b.u(k, pwidth)
            for u in rice_fold(np.asarray(part)):
                b.unary(int(u) >> k)
                if k:
                    b.u(int(u) & ((1 << k) - 1), k)
    assert pos == len(res)


FIXED_COEFFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def reconstruct_fixed(warmup: Sequence[int], res: Sequence[int],
                      order: int) -> np.ndarray:
    s = list(int(v) for v in warmup)
    coef = FIXED_COEFFS[order]
    for r in res:
        pred = sum(c * s[-1 - j] for j, c in enumerate(coef))
        s.append(int(r) + pred)
    return np.asarray(s, np.int64)


def reconstruct_lpc(warmup: Sequence[int], res: Sequence[int],
                    coefs: Sequence[int], shift: int) -> np.ndarray:
    s = list(int(v) for v in warmup)
    for r in res:
        pred = sum(c * s[-1 - j] for j, c in enumerate(coefs)) >> shift
        s.append(int(r) + pred)
    return np.asarray(s, np.int64)


def subframe_constant(b: Bits, value: int, bps: int):
    b.u(0, 1)
    b.u(0b000000, 6)
    b.u(0, 1)
    b.s(value, bps)


def subframe_verbatim(b: Bits, samples: Sequence[int], bps: int):
    b.u(0, 1)
    b.u(0b000001, 6)
    b.u(0, 1)
    for v in samples:
        b.s(int(v), bps)


def subframe_fixed(b: Bits, order: int, warmup: Sequence[int],
                   res: Sequence[int], bps: int, block_size: int,
                   partition_order: int = 0,
                   params: Sequence[Optional[int]] = (4,),
                   method: int = 0,
                   escape_bits: Optional[Sequence[int]] = None,
                   wasted: int = 0):
    b.u(0, 1)
    b.u(0b001000 | order, 6)
    if wasted:
        b.u(1, 1)
        b.unary(wasted - 1)
    else:
        b.u(0, 1)
    eff = bps - wasted
    for v in warmup:
        b.s(int(v), eff)
    write_rice_partitioned(b, res, order, block_size, partition_order,
                           params, method, escape_bits)


def subframe_lpc(b: Bits, order: int, warmup: Sequence[int],
                 res: Sequence[int], coefs: Sequence[int], shift: int,
                 precision: int, bps: int, block_size: int,
                 partition_order: int = 0,
                 params: Sequence[Optional[int]] = (4,),
                 method: int = 0):
    b.u(0, 1)
    b.u(0b100000 | (order - 1), 6)
    b.u(0, 1)
    for v in warmup:
        b.s(int(v), bps)
    b.u(precision - 1, 4)
    b.u(shift, 5)
    for c in coefs:
        b.s(int(c), precision)
    write_rice_partitioned(b, res, order, block_size, partition_order,
                           params, method)


def finish_frame(header: bytes, body: Bits) -> bytes:
    body.pad_to_byte()
    frame = header + body.data()
    c = crc16(frame)
    return frame + bytes([c >> 8, c & 0xFF])


# ====================================================== fixture builders
def stream_fixed_orders() -> Tuple[bytes, np.ndarray]:
    """Mono 16-bit: five 192-sample frames, FIXED orders 0-4, block-size
    code 0b0001 (192), multi-partition Rice with distinct parameters."""
    rng = np.random.default_rng(11)
    bs, sr, bps = 192, 16000, 16
    frames, expected = [], []
    for order in range(5):
        # choose the bounded signal first, derive the residual from the
        # predictor difference equation (high-order predictors integrate,
        # so free-running residual choices blow past 16 bits)
        t = np.arange(bs)
        sig = (np.round(6000 * np.sin(2 * np.pi * t / 37.0))
               + rng.integers(-20, 20, bs)).astype(np.int64)
        warmup = sig[:order]
        coef = FIXED_COEFFS[order]
        res = [int(sig[i]) - sum(c * int(sig[i - 1 - j])
                                 for j, c in enumerate(coef))
               for i in range(order, bs)]
        assert np.array_equal(reconstruct_fixed(warmup, res, order), sig)
        expected.append(sig)
        hdr = frame_header(bs, sr, 0, bps, order)
        body = Bits()
        po = 2 if order <= 2 else 0     # 192/4=48 > order for order<=2
        params = [2, 3, 4, 5][:1 << po]
        subframe_fixed(body, order, warmup, res, bps, bs,
                       partition_order=po, params=params)
        frames.append(finish_frame(hdr, body))
    sig = np.concatenate(expected)
    head = streaminfo(sr, 1, bps, len(sig), min_bs=bs, max_bs=bs)
    return head + b"".join(frames), sig.reshape(-1)


def stream_escape_and_rice2() -> Tuple[bytes, np.ndarray]:
    """Mono 16-bit, one 256-sample frame (8-bit block-size encoding):
    FIXED order 1 with partition order 1 — partition 0 is a Rice escape
    (raw 7-bit residuals), partition 1 uses the 5-bit Rice2 method."""
    rng = np.random.default_rng(12)
    bs, sr, bps = 256, 16000, 16
    warmup = [1000]
    res = rng.integers(-60, 60, bs - 1)
    sig = reconstruct_fixed(warmup, res, 1)
    assert np.abs(sig).max() < 2 ** 15
    hdr = frame_header(bs, sr, 0, bps, 0, blocksize_force="u8")
    body = Bits()
    subframe_fixed(body, 1, warmup, res, bps, bs, partition_order=1,
                   params=[None, 6], method=1, escape_bits=[7, None])
    return (streaminfo(sr, 1, bps, bs, min_bs=bs, max_bs=bs)
            + finish_frame(hdr, body), sig)


def stream_lpc() -> Tuple[bytes, np.ndarray]:
    """Mono 16-bit, 320-sample frame (16-bit block-size encoding): LPC
    order 3, asymmetric coefficients, precision 12, shift 5 — catches any
    coefficient-order or shift-handling confusion a symmetric order-2
    round-trip cannot."""
    rng = np.random.default_rng(13)
    bs, sr, bps = 320, 16000, 16
    coefs = [901, -414, 130]        # applies to s[i-1], s[i-2], s[i-3]
    shift, precision = 5, 12
    # choose a bounded signal; derive the residual under this predictor
    t = np.arange(bs)
    sig = (np.round(900 * np.sin(2 * np.pi * t / 23.0))
           + rng.integers(-10, 10, bs)).astype(np.int64)
    warmup = sig[:3]
    res = [int(sig[i]) - (sum(c * int(sig[i - 1 - j])
                              for j, c in enumerate(coefs)) >> shift)
           for i in range(3, bs)]
    assert np.array_equal(reconstruct_lpc(warmup, res, coefs, shift), sig)
    hdr = frame_header(bs, sr, 0, bps, 0, blocksize_force="u16")
    body = Bits()
    subframe_lpc(body, 3, warmup, res, coefs, shift, precision, bps, bs,
                 params=[3])
    return (streaminfo(sr, 1, bps, bs, min_bs=bs, max_bs=bs)
            + finish_frame(hdr, body), sig)


def stream_wasted_bits() -> Tuple[bytes, np.ndarray]:
    """Mono 16-bit, 192 samples, FIXED order 2 with 2 wasted bits: the
    stream stores samples >> 2 and the decoder must restore the shift."""
    rng = np.random.default_rng(14)
    bs, sr, bps = 192, 16000, 16
    wasted = 2
    warmup_st = [77, -30]
    res = rng.integers(-30, 30, bs - 2)
    stored = reconstruct_fixed(warmup_st, res, 2)
    sig = stored << wasted
    assert np.abs(sig).max() < 2 ** 15
    hdr = frame_header(bs, sr, 0, bps, 0)
    body = Bits()
    subframe_fixed(body, 2, warmup_st, res, bps, bs, params=[3],
                   wasted=wasted)
    return (streaminfo(sr, 1, bps, bs, min_bs=bs, max_bs=bs)
            + finish_frame(hdr, body), sig)


def stream_constant_verbatim() -> Tuple[bytes, np.ndarray]:
    """Mono 8-bit: a CONSTANT frame then a VERBATIM frame."""
    rng = np.random.default_rng(15)
    bs, sr, bps = 192, 16000, 8
    verb = rng.integers(-128, 128, bs)
    hdr0 = frame_header(bs, sr, 0, bps, 0)
    b0 = Bits()
    subframe_constant(b0, -42, bps)
    hdr1 = frame_header(bs, sr, 0, bps, 1)
    b1 = Bits()
    subframe_verbatim(b1, verb, bps)
    sig = np.concatenate([np.full(bs, -42, np.int64), verb])
    return (streaminfo(sr, 1, bps, 2 * bs, min_bs=bs, max_bs=bs)
            + finish_frame(hdr0, b0) + finish_frame(hdr1, b1), sig)


def _stereo_stream(ch_assign: int) -> Tuple[bytes, np.ndarray]:
    """One stereo frame under the given decorrelation mode.

    ch_assign: 1 = independent L/R, 8 = left-side, 9 = right-side,
    10 = mid-side.  Expected output is (n, 2) [left, right].
    """
    rng = np.random.default_rng(16 + ch_assign)
    bs, sr, bps = 192, 16000, 16
    left = np.asarray(reconstruct_fixed(
        [500], rng.integers(-50, 50, bs - 1), 1))
    right = np.asarray(reconstruct_fixed(
        [-300], rng.integers(-50, 50, bs - 1), 1))
    side = left - right                      # needs bps+1 bits
    mid = (left + right) >> 1
    if ch_assign == 1:
        chans = [(left, bps), (right, bps)]
    elif ch_assign == 8:                     # left-side
        chans = [(left, bps), (side, bps + 1)]
    elif ch_assign == 9:                     # right-side
        chans = [(side, bps + 1), (right, bps)]
    elif ch_assign == 10:                    # mid-side
        chans = [(mid, bps), (side, bps + 1)]
    else:
        raise ValueError(ch_assign)
    hdr = frame_header(bs, sr, ch_assign, bps, 0)
    body = Bits()
    for sig_ch, eff_bps in chans:
        # verbatim keeps the construction independent of prediction rules
        subframe_verbatim(body, sig_ch, eff_bps)
    expected = np.stack([left, right], axis=1)
    return (streaminfo(sr, 2, bps, bs, min_bs=bs, max_bs=bs)
            + finish_frame(hdr, body), expected)


def stream_stereo_independent():
    return _stereo_stream(1)


def stream_left_side():
    return _stereo_stream(8)


def stream_right_side():
    return _stereo_stream(9)


def stream_mid_side():
    return _stereo_stream(10)


def stream_24bit() -> Tuple[bytes, np.ndarray]:
    """Mono 24-bit FIXED order 2 with large amplitudes."""
    rng = np.random.default_rng(21)
    bs, sr, bps = 192, 16000, 24
    warmup = [400000, 399000]
    res = rng.integers(-3000, 3000, bs - 2)
    sig = reconstruct_fixed(warmup, res, 2)
    assert np.abs(sig).max() < 2 ** 23
    hdr = frame_header(bs, sr, 0, bps, 0)
    body = Bits()
    subframe_fixed(body, 2, warmup, res, bps, bs, params=[8])
    return (streaminfo(sr, 1, bps, bs, min_bs=bs, max_bs=bs)
            + finish_frame(hdr, body), sig)


ALL_STREAMS = {
    "fixed_orders": stream_fixed_orders,
    "escape_and_rice2": stream_escape_and_rice2,
    "lpc_order3_shift5": stream_lpc,
    "wasted_bits": stream_wasted_bits,
    "constant_verbatim_8bit": stream_constant_verbatim,
    "stereo_independent": stream_stereo_independent,
    "left_side": stream_left_side,
    "right_side": stream_right_side,
    "mid_side": stream_mid_side,
    "fixed_24bit": stream_24bit,
}
