"""Sweep candidate libtpu/XLA flags over the official bench.

Round-3 found ``--xla_tpu_scoped_vmem_limit_kib=65536`` worth +5.7%; this
probe asks whether any OTHER init-time flag stacks on top of it.  Each
combo runs the real ``bench.py`` in a child process because an unknown
flag CHECK-fails libtpu (uncatchable abort) — the child dies, the sweep
records it and moves on.  Compile caches are keyed by flags, so every
combo pays a cold remote compile; budget ~2-8 min per row.

Usage:  python tools/probe_flags.py [row-index ...]
        (no args = all rows)
"""
import json
import os
import subprocess
import sys
import time

BASE = "--xla_tpu_scoped_vmem_limit_kib=65536"

CANDIDATES = [
    ("base", ""),
    ("lhs", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("rwb_off", "--xla_tpu_rwb_fusion=false"),
    ("bundle_cost", "--xla_tpu_use_bundle_aware_cost_model_for_fusions=true"),
    ("licm2", "--xla_tpu_licm_size_inflation_ratio=2"),
    ("dot_sr_off", "--xla_tpu_enable_dot_strength_reduction=false"),
]


def run_one(name: str, extra: str, timeout_s: float = 1200.0):
    # timeout must leave room for one worst-case cold compile (~10 min on
    # the remote compiler) — a short timeout falsely records a viable flag
    # as producing no measurement.  The in-bench watchdog gets the same
    # headroom, independently of the subprocess timeout.
    env = dict(os.environ)
    # prepend any inherited init args (e.g. a required topology flag)
    # rather than clobbering them
    env["LIBTPU_INIT_ARGS"] = " ".join(
        a for a in (os.environ.get("LIBTPU_INIT_ARGS", ""), BASE, extra)
        if a).strip()
    env["BENCH_SCOPED_VMEM"] = "0"       # flags are set here, not by bench
    # the in-bench watchdog must stay BELOW the subprocess timeout, or a
    # slow run is killed externally and recorded as 'no measurement'
    # instead of the watchdog's partial JSON (round-4 review)
    env["BENCH_WATCHDOG"] = str(max(int(timeout_s) - 60, 60))
    t0 = time.time()
    try:
        res = subprocess.run([sys.executable, "bench.py"], env=env,
                             capture_output=True, text=True,
                             timeout=timeout_s,
                             cwd=os.path.dirname(os.path.dirname(
                                 os.path.abspath(__file__))))
    except subprocess.TimeoutExpired:
        return {"name": name, "flags": extra, "value": None, "rc": None,
                "error": "timeout", "wall_s": round(time.time() - t0, 1)}
    line = next((ln for ln in res.stdout.splitlines()
                 if ln.startswith('{"metric"')), None)
    out = {"name": name, "flags": extra, "rc": res.returncode,
           "wall_s": round(time.time() - t0, 1), "value": None}
    if line:
        try:
            out["value"] = json.loads(line).get("value")
        except ValueError:
            pass
    if out["value"] is None:
        out["stderr_tail"] = res.stderr[-300:]
    return out


def main():
    try:
        idx = [int(a) for a in sys.argv[1:]]
    except ValueError:
        sys.exit(f"usage: {sys.argv[0]} [row-index ...]  "
                 f"(0..{len(CANDIDATES) - 1})")
    if any(i < 0 or i >= len(CANDIDATES) for i in idx):
        sys.exit(f"row index out of range; valid: 0..{len(CANDIDATES) - 1}")
    rows = [CANDIDATES[i] for i in idx] if idx else CANDIDATES
    results = []
    for name, extra in rows:
        r = run_one(name, extra)
        results.append(r)
        print(json.dumps(r), flush=True)
    best = max((r for r in results if r.get("value")),
               key=lambda r: r["value"], default=None)
    if best:
        print(f"# best: {best['name']} = {best['value']}", flush=True)


if __name__ == "__main__":
    main()
