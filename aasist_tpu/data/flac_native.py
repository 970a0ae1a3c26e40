"""ctypes bindings for the native C++ FLAC decoder.

Loads ``aasist_tpu/_native/libflacdec.so`` (built by
``tools/build_native.py``; auto-builds on first use if g++ is available).
Returns float64 waveforms in [-1, 1) with soundfile's int scaling
(value / 2**(bps-1)), matching what the reference's data layer saw.
"""

from __future__ import annotations

import ctypes
import subprocess
import sys
import threading
from pathlib import Path
from typing import Tuple

import numpy as np

_LIB_PATH = Path(__file__).resolve().parent.parent / "_native" / "libflacdec.so"
_lock = threading.Lock()
_lib = None


class FlacDecodeError(RuntimeError):
    pass


def _cache_lib_path() -> Path:
    """Per-user cache location for host-local rebuilds (XDG convention).

    Keyed by package version AND python tag so upgrades / multi-env
    hosts never load a stale binary.
    """
    import os

    from aasist_tpu import __version__

    base = Path(os.environ.get("XDG_CACHE_HOME",
                               Path.home() / ".cache"))
    tag = f"{__version__}-py{sys.version_info[0]}{sys.version_info[1]}"
    return base / "aasist_tpu" / tag / "libflacdec.so"


def _bundled_source() -> Path:
    return _LIB_PATH.parent / "src" / "flac_decoder.cpp"


def _build(target: Path, source: Path) -> None:
    """Compile the decoder for THIS host (native tuning is correct here —
    the redistributable wheel artifact is built generic by setup.py)."""
    target.parent.mkdir(parents=True, exist_ok=True)
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC",
         "-std=c++17", "-o", str(target), str(source)],
        check=True, capture_output=True)


def _rebuild_for_host() -> Path:
    """Build from the bundled source into a writable location.

    Prefers the package dir (repo checkout / user-owned venv); falls
    back to the per-user cache when site-packages is read-only (ADVICE
    r4: the root-owned-install case used to fail here).
    """
    import os

    bundled = _bundled_source()
    if not bundled.exists():
        raise FlacDecodeError(
            f"native FLAC decoder source not found at {bundled}")
    targets = []
    if os.access(_LIB_PATH.parent if _LIB_PATH.parent.exists()
                 else _LIB_PATH.parent.parent, os.W_OK):
        targets.append(_LIB_PATH)
    targets.append(_cache_lib_path())
    last_err = None
    for target in targets:
        try:
            _build(target, bundled)
            return target
        except (subprocess.CalledProcessError, FileNotFoundError,
                PermissionError, OSError) as e:
            last_err = e
    raise FlacDecodeError(
        f"native FLAC decoder auto-build failed: {last_err}")


def _ensure_built() -> Path:
    if _LIB_PATH.exists():
        return _LIB_PATH
    cached = _cache_lib_path()
    if cached.exists():
        return cached
    # Repo checkout: build via the tools script.  Installed tree (pip
    # wheel/sdist): compile the source bundled at _native/src/ directly
    # (setup.py ships it precisely for this rebuild path).
    tools = _LIB_PATH.parent.parent.parent / "tools" / "build_native.py"
    if tools.exists():
        try:
            subprocess.run([sys.executable, str(tools)], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            raise FlacDecodeError(
                f"native FLAC decoder not built and auto-build failed: {e}")
        if not _LIB_PATH.exists():
            raise FlacDecodeError(
                "native FLAC decoder build produced no library")
        return _LIB_PATH
    return _rebuild_for_host()


def _get_lib():
    global _lib
    with _lock:
        if _lib is None:
            path = _ensure_built()
            try:
                lib = ctypes.CDLL(str(path))
            except OSError:
                # the found .so targets a different CPU/OS (e.g. a wheel
                # built elsewhere, or a stale cache) — use an earlier
                # host-local cache build if one exists, else rebuild
                # from the bundled source for THIS host (ADVICE r4)
                lib = None
                cached = _cache_lib_path()
                if cached.exists() and cached != Path(path):
                    try:
                        lib = ctypes.CDLL(str(cached))
                    except OSError:
                        lib = None
                if lib is None:
                    lib = ctypes.CDLL(str(_rebuild_for_host()))
            lib.flac_decode_file.restype = ctypes.c_int
            lib.flac_decode_file.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_char_p, ctypes.c_int64,
            ]
            lib.flac_decode_buffer.restype = ctypes.c_int
            lib.flac_decode_buffer.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_char_p, ctypes.c_int64,
            ]
            lib.flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
            lib.flac_decode_file_f32.restype = ctypes.c_int
            lib.flac_decode_file_f32.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_char_p, ctypes.c_int64,
            ]
            lib.flac_decode_buffer_f32.restype = ctypes.c_int
            lib.flac_decode_buffer_f32.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_char_p, ctypes.c_int64,
            ]
            lib.flac_free_f32.argtypes = [ctypes.POINTER(ctypes.c_float)]
            _lib = lib
    return _lib


def _finish(lib, rc, err, samples_p, n_frames, sr, channels, bps
            ) -> Tuple[np.ndarray, int]:
    if rc != 0:
        raise FlacDecodeError(err.value.decode() or f"decode error {rc}")
    n = n_frames.value * channels.value
    try:
        arr = np.ctypeslib.as_array(samples_p, shape=(n,)).copy()
    finally:
        lib.flac_free(samples_p)
    x = arr.astype(np.float64) / float(1 << (bps.value - 1))
    if channels.value > 1:
        x = x.reshape(-1, channels.value)
    return x, sr.value


def read_flac(path) -> Tuple[np.ndarray, int]:
    """Decode a FLAC file -> (float64 waveform, sample_rate)."""
    lib = _get_lib()
    samples_p = ctypes.POINTER(ctypes.c_int32)()
    n_frames = ctypes.c_int64()
    sr = ctypes.c_int32()
    channels = ctypes.c_int32()
    bps = ctypes.c_int32()
    err = ctypes.create_string_buffer(128)
    rc = lib.flac_decode_file(
        str(path).encode(), ctypes.byref(samples_p), ctypes.byref(n_frames),
        ctypes.byref(sr), ctypes.byref(channels), ctypes.byref(bps),
        err, len(err))
    return _finish(lib, rc, err, samples_p, n_frames, sr, channels, bps)


def read_flac_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    """Decode an in-memory FLAC stream -> (float64 waveform, sample_rate)."""
    lib = _get_lib()
    samples_p = ctypes.POINTER(ctypes.c_int32)()
    n_frames = ctypes.c_int64()
    sr = ctypes.c_int32()
    channels = ctypes.c_int32()
    bps = ctypes.c_int32()
    err = ctypes.create_string_buffer(128)
    rc = lib.flac_decode_buffer(
        data, len(data), ctypes.byref(samples_p), ctypes.byref(n_frames),
        ctypes.byref(sr), ctypes.byref(channels), ctypes.byref(bps),
        err, len(err))
    return _finish(lib, rc, err, samples_p, n_frames, sr, channels, bps)


def read_flac_f32(path) -> Tuple[np.ndarray, int]:
    """Decode to float32 in one native pass (the data-loader hot path).

    For <=24-bit PCM the int->float32 conversion is exact, so results are
    bit-identical to the float64 path after the pipeline's eventual
    float32 cast — this just skips the intermediate copies (~25% of
    per-file decode cost).
    """
    lib = _get_lib()
    samples_p = ctypes.POINTER(ctypes.c_float)()
    n_frames = ctypes.c_int64()
    sr = ctypes.c_int32()
    channels = ctypes.c_int32()
    bps = ctypes.c_int32()
    err = ctypes.create_string_buffer(128)
    rc = lib.flac_decode_file_f32(
        str(path).encode(), ctypes.byref(samples_p), ctypes.byref(n_frames),
        ctypes.byref(sr), ctypes.byref(channels), ctypes.byref(bps),
        err, len(err))
    if rc != 0:
        raise FlacDecodeError(err.value.decode() or f"decode error {rc}")
    n = n_frames.value * channels.value
    try:
        x = np.ctypeslib.as_array(samples_p, shape=(n,)).copy()
    finally:
        lib.flac_free_f32(samples_p)
    if channels.value > 1:
        x = x.reshape(-1, channels.value)
    return x, sr.value
