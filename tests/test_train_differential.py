"""Train-step differential vs the PyTorch reference (VERDICT r4 item 1).

Every pre-round-5 differential was eval-only (all torch goldens captured
under ``torch.no_grad()``).  These tests compare the TRAINING math — the
part that produced the published checkpoints — against f64 goldens from
``tools/make_train_golden.py``:

  * per-leaf gradients of weighted-CCE / AM-Softmax / ALMFT through the
    full model in train mode (reference loss wiring main.py:417-439,
    AMSoftmaxLoss utils.py:163-217),
  * BatchNorm running-stat updates (torch momentum-0.1 unbiased update),
  * two Adam steps with the reference's L2-coupled weight decay
    (utils.py:72-93) under the per-batch cosine schedule,
  * lr(step) trajectories for all four schedulers (utils.py:36-69),
    SGDR over three warm restarts.

The checks run ``tools/check_train_differential.py`` in a subprocess so
JAX_ENABLE_X64 never leaks into this process (same pattern as the f64
structural parity test).  Gates: 1e-8 absolute on grads/params/stats,
1e-12 on lr — far below any f32 noise, far above real structural error.

Scheduler stepping note: the reference only ever steps cosine/keras_decay
(per batch, main.py:479-480); MultiStepLR/SGDR are constructed but never
stepped — a fork bug.  The goldens capture those two stepped once per
epoch (their designed semantics), which is what train/optim.py folds into
its global-step staircases.
"""

import os
import subprocess
import sys

import pytest

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools",
                    "check_train_differential.py")


def _run(mode, timeout):
    env = dict(os.environ, JAX_ENABLE_X64="1", JAX_PLATFORMS="cpu")
    res = subprocess.run([sys.executable, TOOL, mode], env=env,
                         capture_output=True, text=True, timeout=timeout)
    assert res.returncode == 0, res.stdout + res.stderr
    return res.stdout


def test_lr_schedule_trajectories_match_torch():
    out = _run("lr", 600)
    for name in ("cosine", "keras_decay", "multistep", "sgdr"):
        assert f"ok  lr {name}" in out, out


def test_rawnet2_train_differential():
    """Gradients (incl. the 3-layer GRU backward through lax.scan), BN
    stat updates and two Adam steps on the tiny-geometry RawNet2."""
    out = _run("rawnet2", 1200)
    assert "ok  rawnet2 grads_cce" in out, out
    assert "ok  rawnet2 adam_params2" in out, out


@pytest.mark.slow
def test_aasist_train_differential():
    """Same for AASIST under the pretrained AASIST.pth weights — all
    three losses plus the Adam protocol.  Slow tier: full-geometry f64
    backward passes on CPU."""
    out = _run("aasist", 3600)
    for label in ("grads_cce", "grads_ams", "grads_almft",
                  "bnstats_cce", "adam_params1", "adam_params2"):
        assert f"ok  aasist {label}" in out, out


@pytest.mark.slow
def test_aasist2_train_differential():
    """AASIST2's production recipe: Res2Net+SE backward, speaker-
    conditioned attention backward, and Adam driven by ALMFT with
    per-batch durations (the margins the published fork trains with).
    ~1h of f64 CPU backward passes on a 1-core host."""
    out = _run("aasist2", 7200)
    for label in ("grads_cce", "grads_almft", "bnstats_cce",
                  "adam_params1", "adam_params2"):
        assert f"ok  aasist2 {label}" in out, out


@pytest.mark.slow
def test_rawgatst_train_differential():
    """RawGAT-ST: the no-temperature GAT backward and the dual-encoder
    product fusion, weighted-CCE (its reference recipe) + Adam.
    ~1h of f64 CPU backward passes on a 1-core host (two encoders)."""
    out = _run("rawgatst", 7200)
    for label in ("grads_cce", "bnstats_cce",
                  "adam_params1", "adam_params2"):
        assert f"ok  rawgatst {label}" in out, out
