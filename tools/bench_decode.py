"""Native FLAC decoder throughput benchmark (CPU-only).

Best-of-5 timing over a directory of .flac files through the Python
wrapper (the f64 path; the loader's one-pass f32 path is strictly
faster).  Shared-VM run-to-run noise is ~±10-15% — compare best-of
numbers, and bench A/B variants back-to-back.

History (synthetic eval corpus, 1 core; passes 2-3 were measured under
test-suite load, which inflates readings up to ~40%):
  round 1            0.98 ms/file (~1020 files/s)  buffered reader + CLZ
  round 2 pass 2     0.76 ms/file (loaded host)    fused rice, wide fills
  round 2 pass 3     0.60 ms/file (loaded host)    slicing-by-8 CRC-16
  round 2 pass 3     0.435 ms/file (~2300 files/s) same build, idle host

Usage: python tools/bench_decode.py [flac_dir] [reps]
"""

from __future__ import annotations

import glob
import sys
import time

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from aasist_tpu.data.audio_io import read_audio  # noqa: E402


def main() -> None:
    d = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/v/LA/ASVspoof2019_LA_eval/flac"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    files = sorted(glob.glob(f"{d}/*.flac"))
    if not files:
        raise SystemExit(f"no .flac files under {d} — generate a corpus "
                         "with aasist_tpu.data.synthetic first")
    for f in files[:4]:
        read_audio(f)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        n = 0
        for _ in range(reps):
            for f in files:
                read_audio(f)
                n += 1
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{1e3 * best:.3f} ms/file  {1 / best:.0f} files/s/core "
          f"({len(files)} files x {reps} reps, best of 5)")


if __name__ == "__main__":
    main()
