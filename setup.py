"""Build hooks for the aasist-tpu distribution.

Metadata lives in pyproject.toml; this file exists only to compile the
native FLAC decoder (native/flac_decoder.cpp) into the wheel's
``aasist_tpu/_native/`` directory and to bundle its source so installed
trees can rebuild it on a different-ABI host (see
``aasist_tpu.data.flac_native._ensure_built``).

If g++ is unavailable the build still succeeds: the decoder auto-builds
from the bundled source on first FLAC decode, and WAV loading never
needs it.
"""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py as _build_py

ROOT = Path(__file__).resolve().parent
NATIVE_SRC = ROOT / "native" / "flac_decoder.cpp"


class build_py(_build_py):
    def run(self):
        super().run()
        out_dir = Path(self.build_lib) / "aasist_tpu" / "_native"
        out_dir.mkdir(parents=True, exist_ok=True)
        src_dir = out_dir / "src"
        src_dir.mkdir(exist_ok=True)
        shutil.copy2(NATIVE_SRC, src_dir / NATIVE_SRC.name)
        gxx = shutil.which("g++")
        if gxx is None:
            print("aasist-tpu: g++ not found; shipping source only "
                  "(decoder auto-builds on first use)", file=sys.stderr)
            return
        target = out_dir / "libflacdec.so"
        cmd = [gxx, "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", "-o", str(target), str(NATIVE_SRC)]
        print(" ".join(cmd))
        subprocess.run(cmd, check=True)


setup(cmdclass={"build_py": build_py})
