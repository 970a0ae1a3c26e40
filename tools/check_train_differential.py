"""Train-step differential vs the PyTorch reference (f64, CPU).

Counterpart of tools/make_train_golden.py: loads its committed goldens and
checks the JAX training math leaf-for-leaf —

  * per-leaf gradients of weighted-CCE / AM-Softmax / ALMFT through the
    full model in train mode (dropout off, BN batch-stats on),
  * BatchNorm running-stat updates,
  * two Adam steps with L2-coupled weight decay under the per-batch
    cosine schedule (the reference protocol: forward, backward, step,
    scheduler.step — main.py:441-480),
  * lr(step) trajectories for cosine / keras_decay / multistep / sgdr.

Run with JAX_ENABLE_X64=1 on CPU (the test suite invokes this in a
subprocess so the x64 flag never leaks).  Usage:

    python tools/check_train_differential.py \
        [aasist|rawnet2|aasist2|rawgatst|lr] ...

Exit code 0 when every checked quantity agrees within the gates
(grads/params/stats <= 1e-8 absolute; lr <= 1e-12).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402

# the axon sitecustomize force-selects the TPU backend; override (TPU has
# no f64)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import optax  # noqa: E402

from aasist_tpu.config import OptimConfig  # noqa: E402
from aasist_tpu.registry import build_model  # noqa: E402
from aasist_tpu.train.losses import weighted_cce, am_softmax  # noqa: E402
from aasist_tpu.train.optim import create_optimizer, make_schedule  # noqa: E402
from aasist_tpu.utils.pytree_io import load_tree_npz  # noqa: E402
from aasist_tpu.utils.torch_compat import (  # noqa: E402
    fill_from_state_dict, _leaf_paths, _navigate)

ROOT = os.path.join(os.path.dirname(__file__), "..")
GOLD = os.path.join(ROOT, "tests", "goldens")

# mirrored from tools/make_train_golden.py
AMS_SCALE = 15.0
AMS_MARGIN = 0.25
ALMFT_MA, ALMFT_MB = 0.06, 0.14
ADAM_OPTIM_CONFIG = {
    "optimizer": "adam", "amsgrad": "False", "base_lr": 0.0001,
    "lr_min": 0.000005, "betas": [0.9, 0.999], "weight_decay": 0.0001,
    "scheduler": "cosine", "epochs": 100, "steps_per_epoch": 7,
}
RAWNET2_TINY = {
    "architecture": "RawNet2Spoof", "nb_samp": 64600, "first_conv": 1024,
    "in_channels": 1, "filts": [20, [20, 20], [20, 32], [32, 32]],
    "blocks": [2, 4], "nb_fc_node": 24, "gru_node": 48,
    "nb_gru_layer": 3, "nb_classes": 2, "dtype": "float64",
}
AASIST_CONF = {
    "architecture": "AASIST", "first_conv": 128,
    "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
    "gat_dims": [64, 32], "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0], "dtype": "float64",
}
AASIST2_CONF = {  # ref config/AASIST2.conf model_config (fork Res2Net)
    "architecture": "AASIST", "nb_samp": 64600, "first_conv": 128,
    "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
    "gat_dims": [64, 32], "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
    "res2net_width": 14, "res2net_scale": 8,
    "speaker_conditioning": True, "spk_emb_dim": 256,
    "conditioning_level": "frame", "use_attention": True,
    "dtype": "float64",
}
RAWGATST_CONF = {
    "architecture": "RawNetGatSpoofST", "nb_samp": 64600,
    "first_conv": 128, "filts": [70, [1, 32], [32, 32], [32, 64],
                                 [64, 64]],
    "dtype": "float64",
}

GATE = 1e-8
LR_GATE = 1e-12

_failures = []


def tagged_sd(data, tag):
    pre = tag + "__"
    return {k[len(pre):]: data[k] for k in data.files if k.startswith(pre)}


def to64(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64), tree)


def compare_trees(label, mine, golden, gate=GATE):
    worst, worst_path = -1.0, "?"
    for path in _leaf_paths(golden):
        g = np.asarray(_navigate(golden, path))
        m = np.asarray(_navigate(mine, path))
        d = float(np.max(np.abs(m - g))) if g.size else 0.0
        if d > worst:
            worst, worst_path = d, ".".join(path)
    ok = worst <= gate
    print(f"{'ok ' if ok else 'FAIL'} {label}: max|diff|={worst:.3e} "
          f"at {worst_path}")
    if not ok:
        _failures.append(label)


def compare_scalar(label, mine, golden, gate=1e-10):
    d = abs(float(mine) - float(golden))
    ok = d <= gate
    print(f"{'ok ' if ok else 'FAIL'} {label}: |diff|={d:.3e}")
    if not ok:
        _failures.append(label)


def golden_trees(model, data, tag):
    """Convert one sd-shaped dump into (params_tree, state_tree)."""
    p0, s0 = model.init(jax.random.PRNGKey(0))
    return fill_from_state_dict(p0, s0, tagged_sd(data, tag))


def run_model_diff(name, model, params, state, data, spk=None,
                   adam_loss="cce"):
    """``spk``: speaker embeddings fed to every forward (AASIST2 — keeps
    all leaves on the grad path, matching the torch capture).
    ``adam_loss``: "cce" or "almft" — the loss driving the Adam steps
    (AASIST2's production recipe is ALMFT + per-batch durations)."""
    x1 = data["x1"]
    x2 = data["x2"]
    y1 = data["y1"]
    y2 = data["y2"]
    dur1 = data["dur1"]
    apply_kwargs = {} if spk is None else {"speaker_embedding": spk}

    losses = {
        "cce": lambda lg: weighted_cce(lg, y1),
        "ams": lambda lg: am_softmax(lg, y1, scale=AMS_SCALE,
                                     margin=AMS_MARGIN),
        "almft": lambda lg: am_softmax(lg, y1, scale=AMS_SCALE,
                                       margin=AMS_MARGIN, durations=dur1,
                                       margin_a=ALMFT_MA, margin_b=ALMFT_MB),
    }
    for lname, lfn in losses.items():
        tag = f"grad{lname}"
        if f"{tag}__out_layer.weight" not in data.files \
                and f"{tag}__fc2_gru.weight" not in data.files:
            continue  # this golden doesn't carry the loss (rawnet2: cce only)

        def loss_fn(p, xx):
            (_, logits), ns = model.apply(p, state, xx, train=True,
                                          dropout=False, **apply_kwargs)
            return lfn(logits), ns

        # jit: one XLA compile + run instead of op-by-op f64 dispatch
        # (unjitted, the RawGAT-ST backward alone exceeds 50 min on a
        # 1-core host; jitted the whole check is minutes).  The batch is
        # a jit ARGUMENT — baked in as a closure constant, XLA tries to
        # constant-fold the whole frontend conv at compile time.
        (val, ns), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(params, x1)
        g_params, g_state = golden_trees(model, data, tag)
        compare_scalar(f"{name} loss_{lname}", val, data[f"loss_{lname}"])
        compare_trees(f"{name} grads_{lname}", grads, g_params)
        compare_trees(f"{name} bnstats_{lname}", ns, g_state)

    # ---- Adam steps (reference protocol, cosine schedule per batch)
    if adam_loss == "almft":
        dur2 = data["dur2"]
        batches = [(x1, y1, dur1), (x2, y2, dur2)]

        def step_loss(lg, yy, dd):
            return am_softmax(lg, yy, scale=AMS_SCALE, margin=AMS_MARGIN,
                              durations=dd, margin_a=ALMFT_MA,
                              margin_b=ALMFT_MB)
    else:
        batches = [(x1, y1, None), (x2, y2, None)]

        def step_loss(lg, yy, dd):
            return weighted_cce(lg, yy)

    oc = OptimConfig.from_dict(ADAM_OPTIM_CONFIG)
    opt = create_optimizer(oc, grad_mask=model.grad_mask)
    opt_state = opt.init(params)
    p, s = params, state

    # one jitted step-gradient reused across both Adam steps (state and
    # batch are arguments, not closure constants, so step 2 hits the
    # compile cache)
    def adam_loss_fn(pp, ss, xx, yy, dd):
        (_, logits), ns = model.apply(pp, ss, xx, train=True,
                                      dropout=False, **apply_kwargs)
        return step_loss(logits, yy, dd), ns

    adam_vg = jax.jit(jax.value_and_grad(adam_loss_fn, has_aux=True))

    for i, (x, y, d) in enumerate(batches, start=1):
        (val, ns), grads = adam_vg(p, s, x, y, d)
        updates, opt_state = opt.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        s = ns
        g_params, g_state = golden_trees(model, data, f"adam{i}")
        # step-2's loss runs a full f64 forward from post-step-1 params
        # that already differ at ~1e-12 — the deeper graphs (RawGAT-ST,
        # Res2Net) amplify that to ~1e-9, so the loss scalar uses the
        # same gate as the per-leaf trees (which are the real assertion)
        compare_scalar(f"{name} adam_loss{i}", val,
                       data["adam_losses"][i - 1], gate=GATE)
        compare_trees(f"{name} adam_params{i}", p, g_params)
        compare_trees(f"{name} adam_bnstats{i}", s, g_state)


def check_aasist():
    data = np.load(os.path.join(GOLD, "train_diff_aasist.npz"))
    model = build_model(AASIST_CONF)
    model.filterbank = data["band_pass"]
    params, state = load_tree_npz(os.path.join(ROOT, "checkpoints",
                                               "AASIST.npz"))
    run_model_diff("aasist", model, to64(params), to64(state), data)


def check_rawnet2():
    data = np.load(os.path.join(GOLD, "train_diff_rawnet2.npz"))
    model = build_model(RAWNET2_TINY)
    model.filterbank = data["band_pass"]
    params, state = build_model(RAWNET2_TINY), None
    model2 = build_model(RAWNET2_TINY)
    p0, s0 = model2.init(jax.random.PRNGKey(0))
    params, state = fill_from_state_dict(p0, s0, tagged_sd(data, "sd"))
    run_model_diff("rawnet2", model, to64(params), to64(state), data)


def _sd_from_unit_golden(model, golden_name):
    """(params, state) from the seeded f32 state_dict committed in a unit
    golden — the same weights the torch capture loaded (f32 values are
    exactly representable in f64, so both sides start bit-identical)."""
    data = np.load(os.path.join(GOLD, golden_name))
    sd = {k[len("sd__"):]: data[k] for k in data.files
          if k.startswith("sd__")}
    p0, s0 = model.init(jax.random.PRNGKey(0))
    params, state = fill_from_state_dict(p0, s0, sd)
    return to64(params), to64(state)


def check_aasist2():
    data = np.load(os.path.join(GOLD, "train_diff_aasist2.npz"))
    model = build_model(AASIST2_CONF)
    model.filterbank = data["band_pass"]
    params, state = _sd_from_unit_golden(model, "aasist2_golden.npz")
    run_model_diff("aasist2", model, params, state, data,
                   spk=data["spk"], adam_loss="almft")


def check_rawgatst():
    data = np.load(os.path.join(GOLD, "train_diff_rawgatst.npz"))
    model = build_model(RAWGATST_CONF)
    model.filterbank = data["band_pass"]
    params, state = _sd_from_unit_golden(model, "rawgatst_golden.npz")
    run_model_diff("rawgatst", model, params, state, data)


def check_lr():
    data = np.load(os.path.join(GOLD, "train_diff_lr.npz"))
    spe = 7

    # per-batch schedules: golden index IS the global step
    for name, key in (("cosine", "lr_cosine"),
                      ("keras_decay", "lr_keras_decay")):
        oc = OptimConfig.from_dict({
            "scheduler": name, "base_lr": 1e-4, "lr_min": 5e-6,
            "epochs": 100, "steps_per_epoch": spe})
        sched = make_schedule(oc)
        gold = data[key]
        mine = np.array([float(sched(i)) for i in range(len(gold))])
        d = float(np.max(np.abs(mine - gold)))
        ok = d <= LR_GATE
        print(f"{'ok ' if ok else 'FAIL'} lr {name}: max|diff|={d:.3e}")
        if not ok:
            _failures.append(f"lr {name}")

    # per-epoch schedules: golden index is the EPOCH; my schedule is a
    # function of the global step and must be constant within each epoch
    for name, key, extra in (
            ("multistep", "lr_multistep",
             {"milestones": [10, 20, 30], "lr_decay": 0.5}),
            ("sgdr", "lr_sgdr",
             {"T0": 5, "Tmult": 2, "lr_min": 1e-6})):
        oc = OptimConfig.from_dict({
            "scheduler": name, "base_lr": 1e-4,
            "epochs": 40, "steps_per_epoch": spe, **extra})
        sched = make_schedule(oc)
        gold = data[key]
        worst = 0.0
        for e in range(len(gold)):
            for b in (0, spe // 2, spe - 1):
                worst = max(worst,
                            abs(float(sched(e * spe + b)) - gold[e]))
        ok = worst <= LR_GATE
        print(f"{'ok ' if ok else 'FAIL'} lr {name}: max|diff|={worst:.3e}")
        if not ok:
            _failures.append(f"lr {name}")


def main(argv):
    modes = argv[1:] or ["lr", "rawnet2", "aasist", "aasist2", "rawgatst"]
    for m in modes:
        {"aasist": check_aasist, "rawnet2": check_rawnet2,
         "aasist2": check_aasist2, "rawgatst": check_rawgatst,
         "lr": check_lr}[m]()
    if _failures:
        print("FAILURES:", ", ".join(_failures))
        return 1
    print("train differential: all checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
