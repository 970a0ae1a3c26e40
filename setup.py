"""Build hooks for the aasist-tpu distribution.

Metadata lives in pyproject.toml; this file exists only to compile the
native FLAC decoder (native/flac_decoder.cpp) into the wheel's
``aasist_tpu/_native/`` directory and to bundle its source so installed
trees can rebuild it for their own host (see
``aasist_tpu.data.flac_native._ensure_built``).

Wheel portability (ADVICE r4): the bundled .so is compiled with a
GENERIC optimisation level (-O2, no -march=native — a native-tuned
binary SIGILLs on older CPUs), and because the wheel contains a compiled
artifact the Distribution is marked as having ext_modules so the wheel
is tagged platform-specific instead of py3-none-any.  On a host where
the shipped .so still fails to load (different libc/OS), the runtime
loader rebuilds from the bundled source into a per-user cache — that
path IS allowed to use -march=native, it targets the running machine.

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
from setuptools.dist import Distribution as _Distribution

ROOT = Path(__file__).resolve().parent
NATIVE_SRC = ROOT / "native" / "flac_decoder.cpp"


class build_py(_build_py):
    def run(self):
        super().run()
        # stock configs as package data so the console script works from
        # an installed tree (ADVICE r4); config.resolve_config_path
        # falls back to this directory
        conf_out = Path(self.build_lib) / "aasist_tpu" / "configs"
        conf_out.mkdir(parents=True, exist_ok=True)
        for conf in sorted((ROOT / "configs").glob("*.conf")):
            shutil.copy2(conf, conf_out / conf.name)
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
        # generic arch for the redistributable artifact; runtime rebuilds
        # (flac_native._build) use -march=native for the actual host
        cmd = [gxx, "-O2", "-shared", "-fPIC",
               "-std=c++17", "-o", str(target), str(NATIVE_SRC)]
        print(" ".join(cmd))
        subprocess.run(cmd, check=True)


class BinaryDistribution(_Distribution):
    """Wheels carry a compiled .so — never tag them py3-none-any."""

    def has_ext_modules(self):
        return True


setup(cmdclass={"build_py": build_py}, distclass=BinaryDistribution)
