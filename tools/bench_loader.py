"""End-to-end data-loader throughput benchmark (CPU-only).

Drives EvalBatcher — threaded native FLAC decode -> pad to 64,600 ->
batch assembly -> (host) device_put — over a synthetic corpus directory
and reports utterances/sec.  This is the host-side ceiling on how fast
the eval pipeline can feed the chip (the chip consumes ~1864 utt/s at
the measured serving config, docs/PERF.md).

Usage: python tools/bench_loader.py [corpus_LA_dir] [batch] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from aasist_tpu.data.dataset import AudioStore, EvalBatcher  # noqa: E402


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/v/LA"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    import os
    store = AudioStore(f"{root}/ASVspoof2019_LA_eval")
    flac_dir = os.path.join(str(store.base_dir), "flac")
    ids = sorted(p[:-5] for p in os.listdir(flac_dir)
                 if p.endswith(".flac"))
    if not ids:
        raise SystemExit(f"no .flac under {flac_dir}")
    b = EvalBatcher(store, ids, batch_size=batch)
    for x, u, n in b:     # warmup (page cache, thread pool)
        np.asarray(x)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        total = 0
        for _ in range(reps):
            for x, u, n in b:
                np.asarray(x)
                total += n
        rate = total / (time.perf_counter() - t0)
        best = max(best, rate)
    print(f"{best:.0f} utt/s host-side ({len(ids)} utts x {reps} reps, "
          f"batch {batch}, best of 3)")


if __name__ == "__main__":
    main()
