"""Benchmark: AASIST batched inference throughput (utterances/sec/chip).

Runs the flagship AASIST (pretrained-checkpoint geometry, converted
weights when available) on the attached accelerator at the reference's
fixed eval length (64,600 samples — data_utils.py:45), sweeping batch
size down from large until one fits, then timing steady-state jitted
forwards with block_until_ready.

Baseline: the reference publishes NO throughput numbers (BASELINE.md);
the driver's north-star target is 5,000 utt/s/chip on TPU v5e, so
``vs_baseline`` is value / 5000.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "utt/s/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

FIXED_LEN = 64600
TARGET_BASELINE = 5000.0

# Measured cost model for the flagship AASIST eval forward: 4.84 TFLOP per
# batch-256 forward (docs/PERF.md "Why the 5000 utt/s target is out of
# reach"), i.e. ~18.9 GFLOP per utterance; TPU v5e bf16 peak is ~197
# TFLOP/s (the same doc's 94 TF/s = 48%-of-peak arithmetic).  Used to
# report achieved TFLOP/s and MFU alongside the throughput.
AASIST_FLOPS_PER_UTT = 4.84e12 / 256
V5E_BF16_PEAK_TFLOPS = 197.0

# Committed throughput floor for the official configuration (AASIST,
# bf16): round 4 closed the perf axis at an evidence-backed ~1,980-2,000
# utt/s ceiling (docs/PERF.md); the floor guards that number — any change
# that silently regresses the bench below it fails the run (exit 1, JSON
# still printed with floor_ok=false).  BENCH_FLOOR=0 disables (e.g. for
# deliberately-crippled A/B probes).
OFFICIAL_FLOOR_UTT_S = 1900.0


def _acquire_backend():
    """``jax.devices()`` with retry/backoff on transient init failures.

    Round 2's official bench recorded 0 because the tunneled TPU backend
    failed to initialize ONCE at snapshot time (BENCH_r02.json:
    "Unable to initialize backend 'axon': UNAVAILABLE").  JAX caches
    backend-init errors, so between attempts the backend registry is
    cleared (private API, guarded); if that API ever disappears, the
    process re-execs itself for a genuinely fresh attempt, bounded by
    an env counter.  Five attempts over ~4 min by default.
    """
    import jax

    attempts = max(1, int(os.environ.get("BENCH_INIT_ATTEMPTS", 5)))
    delays = (15.0, 30.0, 60.0, 120.0)
    last = None
    for i in range(attempts):
        try:
            _HEARTBEAT[0] = time.time()
            devs = jax.devices()
            _HEARTBEAT[0] = time.time()
            return devs
        except Exception as e:  # init/tunnel errors surface here
            last = e
            msg = str(e)
            transient = ("UNAVAILABLE" in msg
                         or "Unable to initialize" in msg
                         or "DEADLINE" in msg
                         or "UNKNOWN" in msg
                         or "backend" in msg.lower())
            if not transient or i == attempts - 1:
                raise
            delay = delays[min(i, len(delays) - 1)]
            print(f"bench: backend init failed (attempt {i + 1}/{attempts}),"
                  f" retrying in {delay:.0f}s: {msg[:200]}",
                  file=sys.stderr, flush=True)
            _HEARTBEAT[0] = time.time()
            time.sleep(delay)
            try:
                import jax._src.xla_bridge as xb
                xb._clear_backends()
            except Exception:
                n = int(os.environ.get("BENCH_INIT_REEXEC", 0))
                if n >= attempts:
                    raise last
                os.environ["BENCH_INIT_REEXEC"] = str(n + 1)
                os.execv(sys.executable, [sys.executable] + sys.argv)
    raise last  # unreachable; keeps type-checkers happy


def main() -> int:
    import jax

    from aasist_tpu.registry import build_model

    _acquire_backend()

    dtype = os.environ.get("BENCH_DTYPE", "bf16")
    arch = os.environ.get("BENCH_ARCH", "AASIST")
    if arch == "AASIST":
        conf = {
            "architecture": "AASIST",
            "first_conv": 128,
            "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
            "gat_dims": [64, 32],
            "pool_ratios": [0.5, 0.7, 0.5, 0.5],
            "temperatures": [2.0, 2.0, 100.0, 100.0],
        }
    else:
        # BENCH_ARCH names a config file stem (AASIST-L, RawNet2_baseline,
        # RawGATST_baseline, ...): zoo throughput with random-init weights
        cpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "configs", f"{arch}.conf")
        conf = dict(json.load(open(cpath))["model_config"])
    conf["dtype"] = "bfloat16" if dtype == "bf16" else "float32"
    # Per-batch model flags (docs/PERF.md round 2):
    #   * batch 128 is the sweet spot — at 256 the program sits on the
    #     HBM edge and XLA schedules remat/copy fusions (~0.63 vs
    #     ~0.57 ms/utt), so 128 is tried FIRST;
    #   * the fused Pallas sinc frontend pays at every batch, but its
    #     companion 2-way block0 chunking (needed to FIT batch 256) is
    #     poison at 128 (980 utt/s) — so chunks=1 below 256;
    #   * augmented-channel block0 (use_aug_blocks) costs ~1% in-model
    #     and stays opt-in (BENCH_AUG_BLOCKS=1).
    # Best measured: batch 128 + fused fe + chunks 1 = 1840-1864 utt/s.
    # BENCH_FUSED_FE=0 opts out; compile failures fall back
    # flag-by-flag, then to smaller batches.
    # (round 5: the measured-dead variant knobs BENCH_AUG_BLOCKS /
    # BENCH_BN_FOLD / BENCH_STACKED were retired with their model flags
    # to tools/eval_variants.py — docs/PERF.md has the A/B numbers)
    want_fused_fe = (os.environ.get("BENCH_FUSED_FE", "1") != "0"
                     and dtype == "bf16")
    b0_chunks_env = os.environ.get("BENCH_B0_CHUNKS")

    def build_for_batch(batch):
        c = dict(conf)
        if want_fused_fe:
            c["use_fused_frontend"] = True
            c["b0_chunks"] = 1 if batch < 256 else 2
        if b0_chunks_env:
            c["b0_chunks"] = int(b0_chunks_env)
        return c, build_model(c)

    _, model = build_for_batch(0)

    ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "checkpoints", "AASIST.npz")
    if arch == "AASIST" and os.path.exists(ckpt):
        from aasist_tpu.train.checkpoints import load_weights
        params, state = load_weights(ckpt)
    else:
        params, state = model.init(jax.random.PRNGKey(0))

    import jax.numpy as jnp

    if dtype == "bf16":
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, t)
        params, state = cast(params), cast(state)

    # NB: the scalar reduction is the synchronisation point — on the
    # tunneled axon backend block_until_ready returns before execution
    # finishes, so timing must be bounded by a host fetch.  Two levels
    # of dispatch-cost amortization, matching a production scorer:
    # G batches are scanned inside ONE jitted call (logits for all G are
    # returned, nothing is dead-code-eliminated), and calls are
    # pipelined 2 deep so fetching call k overlaps device compute of
    # k+1.  Per-batch chaining alone is worth ~8% at batch 256
    # (tools/probe_kh_split.py base row vs the per-call number).
    G = max(1, int(os.environ.get("BENCH_CHAIN", 16)))

    def forward(p, s, xs):
        def body(_, x):
            (_, logits), _ = model.apply(p, s, x, train=False)
            return 0, logits.astype(jnp.float32)
        _, all_logits = jax.lax.scan(body, 0, xs)
        return jnp.sum(all_logits)

    rng = np.random.default_rng(0)

    value = None
    batch_used = None
    # try the architecture's measured-best serving batch first (e.g.
    # RawNet2 prefers 256 — SERVING_BATCH_DEFAULTS), then the ladder
    from aasist_tpu.serving import SERVING_BATCH_DEFAULTS
    arch_best = SERVING_BATCH_DEFAULTS.get(conf.get("architecture"), 128)
    ladder = [int(os.environ.get("BENCH_BATCH", 0)), arch_best]
    ladder += [b for b in (128, 256, 64, 32, 16) if b != arch_best]
    seen = set()
    for batch in ladder:
        if batch <= 0 or value is not None or batch in seen:
            continue
        seen.add(batch)
        bconf, model = build_for_batch(batch)
        fwd = jax.jit(forward)
        x = rng.standard_normal((G, batch, FIXED_LEN)).astype(np.float32)
        x = jax.device_put(x)
        for attempt in range(3):
            try:
                _HEARTBEAT[0] = time.time()
                # compile + warmup (first compile can take min. remotely)
                float(fwd(params, state, x))
                _HEARTBEAT[0] = time.time()
                float(fwd(params, state, x))
                n_iters = max(2, int(4096 / (G * batch)))
                import collections
                pending = collections.deque()
                t0 = time.perf_counter()
                for _ in range(n_iters):
                    pending.append(fwd(params, state, x))
                    if len(pending) > 2:
                        float(pending.popleft())
                while pending:
                    float(pending.popleft())
                dt = time.perf_counter() - t0
                value = G * batch * n_iters / dt
                batch_used = batch
                break
            except Exception as e:
                msg = str(e)
                if ("UNAVAILABLE" in msg or "DEADLINE" in msg) and attempt < 2:
                    # transient tunnel hiccup mid-run: back off and retry
                    # the SAME configuration before dropping any flag
                    print(f"bench: transient error, retrying in 15s: "
                          f"{msg[:160]}", file=sys.stderr, flush=True)
                    _HEARTBEAT[0] = time.time()
                    time.sleep(15.0)
                    continue
                if bconf.pop("use_fused_frontend", None):
                    # perf-variant trouble: drop the flag, rebuild on
                    # the plainer path and retry this batch size
                    model = build_model(bconf)
                    fwd = jax.jit(forward)
                    continue
                if ("RESOURCE_EXHAUSTED" in msg
                        or "out of memory" in msg.lower()
                        or "remote_compile" in msg):
                    break           # try a smaller batch
                raise
    if value is None:
        print(json.dumps({"metric": "aasist_eval_throughput", "value": 0,
                          "unit": "utt/s/chip", "vs_baseline": 0,
                          "error": "no batch size fit"}))
        return 1

    out = {
        "metric": "aasist_eval_throughput",
        "value": round(value, 2),
        "unit": "utt/s/chip",
        "vs_baseline": round(value / TARGET_BASELINE, 4),
        "batch": batch_used,
        "dtype": dtype,
        "device": str(jax.devices()[0]),
    }
    rc = 0
    if arch != "AASIST":
        out["metric"] = "eval_throughput"
        out["arch"] = arch
    else:
        tflops = value * AASIST_FLOPS_PER_UTT / 1e12
        out["tflops"] = round(tflops, 2)
        out["mfu"] = round(tflops / V5E_BF16_PEAK_TFLOPS, 4)
        floor = float(os.environ.get("BENCH_FLOOR", OFFICIAL_FLOOR_UTT_S))
        if dtype == "bf16" and floor > 0:
            out["floor"] = floor
            out["floor_ok"] = value >= floor
            if not out["floor_ok"]:
                rc = 1
    print(json.dumps(out))
    return rc


# progress heartbeat: main() bumps this before/after each compile
# attempt; the watchdog fires only if NO progress happens for the
# window, so a legitimate run that falls back through several
# cold-compiled batch sizes never trips it
_HEARTBEAT = [0.0]


def _safe_main() -> int:
    import os
    import threading

    # A dead tunnel HANGS jax calls rather than raising; emit the JSON
    # line and exit before any outer harness timeout loses it.  The
    # window bounds a SINGLE stalled step (one compile attempt is the
    # longest legitimate silence, ~10 min worst observed), not the
    # whole run.
    watchdog_s = float(os.environ.get("BENCH_WATCHDOG", 1800))
    _HEARTBEAT[0] = time.time()
    done = threading.Event()

    def watch():
        while not done.wait(15.0):
            if time.time() - _HEARTBEAT[0] > watchdog_s:
                print(json.dumps(
                    {"metric": "aasist_eval_throughput", "value": 0,
                     "unit": "utt/s/chip", "vs_baseline": 0,
                     "error": f"watchdog: no progress in {watchdog_s}s "
                              "(backend hang?)"}), flush=True)
                os._exit(2)

    t = threading.Thread(target=watch, daemon=True)
    t.start()
    try:
        rc = main()
        done.set()
        return rc
    except Exception as e:  # backend init / tunnel failures included
        done.set()
        print(json.dumps({"metric": "aasist_eval_throughput", "value": 0,
                          "unit": "utt/s/chip", "vs_baseline": 0,
                          "error": str(e)[:400]}))
        return 1


def _flagged_rerun():
    """Run the bench in a child process with the scoped-vmem libtpu flag.

    ``--xla_tpu_scoped_vmem_limit_kib=65536`` raises XLA's per-fusion
    VMEM budget and is worth +5.7% on the shipped config (round-3 sweep:
    none 1893 / 32768 1964 / 65536 2000 / 98304 1991 / 131072 1961
    utt/s).  A libtpu build that does not know the flag CHECK-FAILS —
    an uncatchable process abort — so the flag is tried in a child
    process; on any failure the parent falls back to the plain
    configuration in-process (a transient-zero here must never zero the
    round — the round-2 lesson).  Returns 0 when the child produced a
    nonzero measurement, else None.
    """
    import subprocess

    kib = os.environ.get("BENCH_SCOPED_VMEM_KIB", "65536")
    env = dict(os.environ)
    env["LIBTPU_INIT_ARGS"] = (env.get("LIBTPU_INIT_ARGS", "")
                               + f" --xla_tpu_scoped_vmem_limit_kib={kib}"
                               ).strip()
    env["BENCH_SCOPED_VMEM"] = "0"          # the child must not recurse
    try:
        res = subprocess.run([sys.executable] + sys.argv, env=env,
                             capture_output=True, text=True)
    except Exception as e:
        print(f"bench: scoped-vmem child failed to launch: {e}",
              file=sys.stderr, flush=True)
        return None
    if res.stderr:
        sys.stderr.write(res.stderr[-4000:])
        sys.stderr.flush()
    line = next((ln for ln in res.stdout.splitlines()
                 if ln.startswith('{"metric"')), None)
    if line and res.returncode in (0, 1):
        try:
            parsed = json.loads(line)
            # a nonzero measurement counts even when the floor gate
            # failed (rc 1) — propagate the gate verdict, don't rerun
            if parsed.get("value", 0) > 0 and (
                    res.returncode == 0 or "floor_ok" in parsed):
                print(line, flush=True)
                return res.returncode
        except ValueError:
            pass
    print("bench: scoped-vmem child did not produce a measurement; "
          "falling back to the plain configuration", file=sys.stderr,
          flush=True)
    return None


if __name__ == "__main__":
    if os.environ.get("BENCH_SCOPED_VMEM", "1") != "0":
        _rc = _flagged_rerun()
        if _rc is not None:
            sys.exit(_rc)
    sys.exit(_safe_main())
