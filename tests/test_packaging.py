"""Packaging: pip-installable distribution with the native decoder.

The reference is run from a checkout (`python main.py`, ref: README.md:33);
the rebuild additionally ships as a pip package (pyproject.toml + setup.py)
whose wheel bundles the compiled FLAC decoder AND its C++ source, so an
installed tree can rebuild the decoder on a different-ABI host.
"""

import ctypes
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


def test_installed_tree_rebuild_fallback(tmp_path, monkeypatch):
    """_ensure_built compiles the bundled _native/src source when the
    repo's tools/build_native.py is absent (pip-installed layout)."""
    if shutil.which("g++") is None:
        pytest.skip("no g++ on this host")
    from aasist_tpu.data import flac_native

    # Emulate an installed tree: <site>/aasist_tpu/_native/src/*.cpp,
    # no tools/ three levels up.
    native = tmp_path / "site" / "aasist_tpu" / "_native"
    (native / "src").mkdir(parents=True)
    shutil.copy2(ROOT / "native" / "flac_decoder.cpp", native / "src")
    lib_path = native / "libflacdec.so"
    monkeypatch.setattr(flac_native, "_LIB_PATH", lib_path)

    built = flac_native._ensure_built()
    assert built == lib_path and lib_path.exists()
    lib = ctypes.CDLL(str(lib_path))
    assert hasattr(lib, "flac_decode_file")


@pytest.mark.slow
def test_wheel_builds_and_bundles_native(tmp_path):
    """pip wheel produces a wheel containing the package, the compiled
    decoder, its source, and the aasist-tpu console entry point."""
    out = tmp_path / "wheels"
    res = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-build-isolation",
         "--no-deps", "--no-input", "-w", str(out), str(ROOT)],
        capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-4000:]
    wheels = list(out.glob("aasist_tpu-*.whl"))
    assert len(wheels) == 1, list(out.iterdir())
    names = zipfile.ZipFile(wheels[0]).namelist()
    assert "aasist_tpu/_native/src/flac_decoder.cpp" in names
    if shutil.which("g++") is not None:
        assert "aasist_tpu/_native/libflacdec.so" in names
    assert any(n.startswith("aasist_tpu/models/") for n in names)
    entry = next(n for n in names if n.endswith("entry_points.txt"))
    text = zipfile.ZipFile(wheels[0]).read(entry).decode()
    assert "aasist-tpu = aasist_tpu.cli:main" in text
