"""Build the framework's native components.

Usage: python tools/build_native.py [--force]

Compiles native/*.cpp into shared libraries under aasist_tpu/_native/.
Pure g++ invocation (no cmake dependency for a two-file build); -O3 +
-march=native for the host data path.
"""

import argparse
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
NATIVE = ROOT / "native"
OUT = ROOT / "aasist_tpu" / "_native"

LIBS = {
    "libflacdec.so": ["flac_decoder.cpp"],
}


def build(force: bool = False) -> int:
    OUT.mkdir(exist_ok=True)
    for lib, sources in LIBS.items():
        target = OUT / lib
        srcs = [NATIVE / s for s in sources]
        if (not force and target.exists()
                and all(target.stat().st_mtime > s.stat().st_mtime
                        for s in srcs)):
            print(f"{lib}: up to date")
            continue
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", "-Wall", "-o", str(target)]
        cmd += [str(s) for s in srcs]
        print(" ".join(cmd))
        subprocess.run(cmd, check=True)
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    sys.exit(build(args.force))
