"""Train-step differential goldens from the PyTorch reference (f64, CPU).

Every golden produced before round 5 was eval-only (`make_goldens.py` /
`make_e2e_golden.py` capture under ``torch.no_grad()``).  This tool captures
the TRAINING math of the reference — the part that actually produced the
published checkpoints — so the JAX stack's backward pass can be compared
leaf-for-leaf:

  (a) per-leaf gradients of the weighted-CCE and AM-Softmax/ALMFT losses
      through the full model in train mode (`/root/reference/main.py:417-439`
      loss wiring, `utils.py:163-217` AMSoftmaxLoss),
  (b) BatchNorm running-stat updates from a train-mode forward,
  (c) two Adam steps with the reference's L2-coupled weight decay
      (`utils.py:72-93`) under the per-batch cosine schedule
      (`utils.py:96-121`, stepped at `main.py:479-480`),
  (d) lr(step) trajectories for all four schedulers (`utils.py:36-69`),
      with SGDR run over >=3 warm restarts.

Everything runs in float64 (``torch.set_default_dtype``) so the comparison
tolerance (1e-8) is far below f32 accumulation noise but far above any
structural error.  Dropout is disabled by setting every ``nn.Dropout``'s
p to 0 — BatchNorm stays in train mode; the JAX side mirrors this with
``model.apply(..., train=True, dropout=False)``.

Two deliberate f64-cleanliness choices, so the differential pins the MATH
and not float32-literal rounding:
  * the CCE class weights are built as f64 tensors ([0.1, 0.9] parsed in
    f64 on both sides; the reference's ``torch.FloatTensor`` would inject
    f32-rounded constants),
  * the fixed AM-Softmax margin is 0.25 (exactly representable in both
    f32 and f64; the reference's AMSoftmaxLoss materialises the margin as
    float32 — `utils.py:203`).

Models covered (round 5 extends this to every differential-able zoo
variant — the set the 512-utt eval differential runs; AASIST-L is the
AASIST code path at a different geometry, AASIST_Robust has no runnable
torch counterpart):
  * AASIST      — pretrained AASIST.pth weights (the geometry the
                  published numbers correspond to);
  * RawNet2     — reduced tiny geometry (full-size f64 per-leaf grads
                  would be ~140 MB; the GRU backward — the riskiest
                  path — is geometry-independent);
  * AASIST2     — the fork's Res2Net+SE encoder + speaker conditioning
                  (`/root/reference/models/AASIST.py:525-670,325-415`),
                  seeded weights from aasist2_golden.npz, trained with
                  its production ALMFT loss + per-utterance durations;
                  speaker embeddings are supplied so every leaf is on
                  the grad path (torch skips None-grad leaves — the
                  differential must not depend on masking beyond the
                  structural bn1 quirk);
  * RawGAT-ST   — two-encoder GAT (`RawNetGatSpoofST.py`), seeded
                  weights from rawgatst_golden.npz, weighted-CCE (its
                  reference recipe, main.py:417-420).

Outputs (committed under tests/goldens/):
  train_diff_aasist.npz    — batches + band_pass + per-tag sd-shaped dumps
  train_diff_rawnet2.npz   — same, plus the seeded f64 init (sd__*)
  train_diff_aasist2.npz   — same (weights live in aasist2_golden.npz)
  train_diff_rawgatst.npz  — same (weights live in rawgatst_golden.npz)
  train_diff_lr.npz        — the four lr trajectories + configs
"""

import json
import os
import sys

import numpy as np
import torch
import torch.nn as nn

REF = os.environ.get("AASIST_REFERENCE_PATH", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
os.makedirs(OUT, exist_ok=True)
sys.path.insert(0, REF)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# ---------------------------------------------------------------- constants
# mirrored by tools/check_train_differential.py
BATCH = 4
SEED = 1711
AMS_SCALE = 15.0
AMS_MARGIN = 0.25            # exactly representable in f32 AND f64
ALMFT_MA, ALMFT_MB = 0.06, 0.14   # AASIST2.conf margin_a / margin_b
ADAM_OPTIM_CONFIG = {        # AASIST.conf / RawNet2_baseline.conf block
    "optimizer": "adam", "amsgrad": "False", "base_lr": 0.0001,
    "lr_min": 0.000005, "betas": [0.9, 0.999], "weight_decay": 0.0001,
    "scheduler": "cosine", "epochs": 100, "steps_per_epoch": 7,
}
RAWNET2_TINY = {             # reduced RawNet2_baseline.conf model_config
    "architecture": "RawNet2Spoof", "nb_samp": 64600, "first_conv": 1024,
    "in_channels": 1, "filts": [20, [20, 20], [20, 32], [32, 32]],
    "blocks": [2, 4], "nb_fc_node": 24, "gru_node": 48,
    "nb_gru_layer": 3, "nb_classes": 2,
}


def make_batches():
    rng = np.random.default_rng(SEED)
    x1 = rng.standard_normal((BATCH, 64600)) * 0.05
    x2 = rng.standard_normal((BATCH, 64600)) * 0.05
    y1 = np.array([1, 0, 1, 1], np.int64)
    y2 = np.array([0, 1, 0, 1], np.int64)
    dur1 = rng.uniform(1.0, 6.0, BATCH)
    return x1, x2, y1, y2, dur1


def disable_dropout(model):
    for m in model.modules():
        if isinstance(m, nn.Dropout):
            m.p = 0.0


def sd_numpy(model):
    return {k: v.detach().cpu().numpy().copy()
            for k, v in model.state_dict().items()}


def sd_tensors(model):
    return {k: v.detach().clone() for k, v in model.state_dict().items()}


def grads_as_sd(model):
    """Per-leaf grads keyed like the state dict; zeros for params with no
    grad path (e.g. the discarded-output bn1 quirk); running stats carry
    the POST-forward values so one sd-shaped dump feeds both trees."""
    out = {}
    params = dict(model.named_parameters())
    for k, v in model.state_dict().items():
        if k in params:
            g = params[k].grad
            out[k] = (np.zeros(v.shape) if g is None
                      else g.detach().numpy().copy())
        else:
            out[k] = v.detach().numpy().copy()
    return out


def default_fwd(model, xt):
    _, out = model(xt, False)
    return out


def capture_loss(model, pristine_sd, criterion_fn, x, y, fwd=default_fwd):
    """Reload pristine weights, one train-mode forward+backward, return
    (loss, sd-shaped dump of grads + post-forward running stats)."""
    model.load_state_dict(pristine_sd)
    model.train()
    model.zero_grad(set_to_none=True)
    out = fwd(model, torch.from_numpy(x).to(torch.float64))
    loss = criterion_fn(out)
    loss.backward()
    return float(loss.item()), grads_as_sd(model)


def capture_adam(model, pristine_sd, criterion_fn, batches,
                 fwd=default_fwd):
    """Reference optimizer protocol (main.py:441-480): forward, loss,
    zero_grad, backward, step, scheduler.step() — two steps.  Returns the
    post-step full state dicts and the lr in effect at each step.
    ``batches`` entries are (x, criterion_args...) tuples; the criterion
    receives (out, *criterion_args)."""
    import utils as ref_utils  # reference module

    model.load_state_dict(pristine_sd)
    model.train()
    optimizer, scheduler = ref_utils.create_optimizer(
        model.parameters(), ADAM_OPTIM_CONFIG)
    dumps, lrs, losses = [], [], []
    for x, *crit_args in batches:
        lrs.append(float(optimizer.param_groups[0]["lr"]))
        out = fwd(model, torch.from_numpy(x).to(torch.float64))
        loss = criterion_fn(out, *crit_args)
        optimizer.zero_grad(set_to_none=True)
        loss.backward()
        optimizer.step()
        scheduler.step()
        losses.append(float(loss.item()))
        dumps.append(sd_numpy(model))
    return dumps, lrs, losses


def f64_cce(weights=(0.1, 0.9)):
    w = torch.tensor(weights, dtype=torch.float64)
    return nn.CrossEntropyLoss(weight=w)


def save_captures(path, x1, x2, y1, y2, dur1, band_pass, tagged, scalars):
    arrays = {"x1": x1, "x2": x2, "y1": y1, "y2": y2, "dur1": dur1,
              "band_pass": band_pass}
    for tag, sd in tagged.items():
        for k, v in sd.items():
            if k.endswith("num_batches_tracked"):
                continue
            arrays[f"{tag}__{k}"] = v
    arrays.update(scalars)
    np.savez_compressed(path, **arrays)
    print(f"wrote {path} ({len(arrays)} arrays)")


# ------------------------------------------------------------------ AASIST
def make_aasist():
    from make_goldens import build_original_aasist

    import utils as ref_utils

    with open(os.path.join(REF, "config", "AASIST.conf")) as f:
        cfg = json.load(f)
    model = build_original_aasist(cfg["model_config"])
    sd32 = torch.load(os.path.join(REF, "models/weights/AASIST.pth"),
                      map_location="cpu")
    model.load_state_dict(sd32, strict=True)
    model.double()
    disable_dropout(model)
    pristine = sd_tensors(model)
    band_pass = model.conv_time.band_pass.detach().numpy().astype(np.float64)

    x1, x2, y1, y2, dur1 = make_batches()
    ty1 = torch.from_numpy(y1)
    ty2 = torch.from_numpy(y2)
    tdur = torch.from_numpy(dur1)

    cce = f64_cce()
    ams = ref_utils.AMSoftmaxLoss(scale=AMS_SCALE, adaptive_margin=False,
                                  m=AMS_MARGIN)
    almft = ref_utils.AMSoftmaxLoss(scale=AMS_SCALE, adaptive_margin=True,
                                    m_a=ALMFT_MA, m_b=ALMFT_MB)

    tagged, scalars = {}, {}
    scalars["loss_cce"], tagged["gradcce"] = capture_loss(
        model, pristine, lambda o: cce(o, ty1), x1, y1)
    scalars["loss_ams"], tagged["gradams"] = capture_loss(
        model, pristine, lambda o: ams(o, ty1), x1, y1)
    scalars["loss_almft"], tagged["gradalmft"] = capture_loss(
        model, pristine, lambda o: almft(o, ty1, tdur), x1, y1)

    dumps, lrs, losses = capture_adam(
        model, pristine,
        lambda o, y: cce(o, torch.from_numpy(y)), [(x1, y1), (x2, y2)])
    tagged["adam1"], tagged["adam2"] = dumps
    scalars["adam_lrs"] = np.array(lrs)
    scalars["adam_losses"] = np.array(losses)

    save_captures(os.path.join(OUT, "train_diff_aasist.npz"),
                  x1, x2, y1, y2, dur1, band_pass, tagged, scalars)


# ----------------------------------------------------------------- RawNet2
def make_rawnet2():
    from models.RawNet2Spoof import Model as RawNet2

    torch.manual_seed(2024)
    model = RawNet2(dict(RAWNET2_TINY))
    model.double()
    disable_dropout(model)
    pristine = sd_tensors(model)

    x1, x2, y1, y2, dur1 = make_batches()
    ty1 = torch.from_numpy(y1)
    cce = f64_cce()

    tagged, scalars = {}, {}
    # seeded init must transfer to the JAX side
    tagged["sd"] = {k: v.numpy().copy() for k, v in pristine.items()}
    scalars["loss_cce"], tagged["gradcce"] = capture_loss(
        model, pristine, lambda o: cce(o, ty1), x1, y1)
    dumps, lrs, losses = capture_adam(
        model, pristine,
        lambda o, y: cce(o, torch.from_numpy(y)), [(x1, y1), (x2, y2)])
    tagged["adam1"], tagged["adam2"] = dumps
    scalars["adam_lrs"] = np.array(lrs)
    scalars["adam_losses"] = np.array(losses)

    # band_pass is rebuilt inside forward (RawNet2Spoof.py:78-89); grab it
    # after the captures above have run at least one forward
    sinc = [m for m in model.modules()
            if m.__class__.__name__ == "SincConv"][0]
    band_pass = sinc.band_pass.detach().numpy().astype(np.float64)

    save_captures(os.path.join(OUT, "train_diff_rawnet2.npz"),
                  x1, x2, y1, y2, dur1, band_pass, tagged, scalars)


# ------------------------------------------------------------------ AASIST2
def _load_sd_from_golden(model, golden_name):
    """Load the seeded f32 state_dict committed in a unit golden (the same
    weights the 512-utt eval differential runs); ``load_state_dict``'s
    ``copy_`` casts into the model's f64 leaves."""
    data = np.load(os.path.join(OUT, golden_name))
    sd = {k[len("sd__"):]: torch.from_numpy(data[k])
          for k in data.files if k.startswith("sd__")}
    model.load_state_dict(sd, strict=True)
    # some fork layers force f32 via torch.FloatTensor (e.g. the GAT
    # att_weight) even under set_default_dtype(f64) — promote everything
    model.double()
    return model


def make_aasist2():
    from models.AASIST import Model as ForkAASIST

    with open(os.path.join(REF, "config", "AASIST2.conf")) as f:
        cfg = json.load(f)
    model = _load_sd_from_golden(ForkAASIST(cfg["model_config"]),
                                 "aasist2_golden.npz")
    disable_dropout(model)
    pristine = sd_tensors(model)
    band_pass = model.conv_time.band_pass.detach().numpy().astype(np.float64)

    x1, x2, y1, y2, dur1 = make_batches()
    # extra draws for the production-recipe Adam steps (ALMFT needs a
    # duration per batch) and the speaker-conditioning path
    rng2 = np.random.default_rng(SEED + 1)
    dur2 = rng2.uniform(1.0, 6.0, BATCH)
    spk = rng2.standard_normal((BATCH, 256)) * 0.1

    ty1 = torch.from_numpy(y1)
    tdur1 = torch.from_numpy(dur1)
    tspk = torch.from_numpy(spk)

    # speaker embeddings flow through every forward so no leaf is left
    # off the grad path (torch would silently skip None-grad leaves in
    # Adam; the differential must exercise them all)
    def fwd(m, xt):
        _, out = m(xt, False, speaker_embedding=tspk)
        return out

    import utils as ref_utils
    cce = f64_cce()
    almft = ref_utils.AMSoftmaxLoss(scale=AMS_SCALE, adaptive_margin=True,
                                    m_a=ALMFT_MA, m_b=ALMFT_MB)

    tagged, scalars = {}, {}
    scalars["loss_cce"], tagged["gradcce"] = capture_loss(
        model, pristine, lambda o: cce(o, ty1), x1, y1, fwd=fwd)
    scalars["loss_almft"], tagged["gradalmft"] = capture_loss(
        model, pristine, lambda o: almft(o, ty1, tdur1), x1, y1, fwd=fwd)

    # Adam under the PRODUCTION loss (ALMFT + durations), not CCE
    dumps, lrs, losses = capture_adam(
        model, pristine,
        lambda o, y, d: almft(o, torch.from_numpy(y), torch.from_numpy(d)),
        [(x1, y1, dur1), (x2, y2, dur2)], fwd=fwd)
    tagged["adam1"], tagged["adam2"] = dumps
    scalars["adam_lrs"] = np.array(lrs)
    scalars["adam_losses"] = np.array(losses)
    scalars["dur2"] = dur2
    scalars["spk"] = spk

    save_captures(os.path.join(OUT, "train_diff_aasist2.npz"),
                  x1, x2, y1, y2, dur1, band_pass, tagged, scalars)


# ----------------------------------------------------------------- RawGAT-ST
def make_rawgatst():
    from models.RawNetGatSpoofST import Model as RawGATST

    with open(os.path.join(REF, "config", "RawGATST_baseline.conf")) as f:
        cfg = json.load(f)
    model = _load_sd_from_golden(RawGATST(cfg["model_config"]),
                                 "rawgatst_golden.npz")
    disable_dropout(model)
    pristine = sd_tensors(model)
    band_pass = model.conv_time.band_pass.detach().numpy().astype(np.float64)

    x1, x2, y1, y2, dur1 = make_batches()
    ty1 = torch.from_numpy(y1)
    cce = f64_cce()

    tagged, scalars = {}, {}
    scalars["loss_cce"], tagged["gradcce"] = capture_loss(
        model, pristine, lambda o: cce(o, ty1), x1, y1)
    dumps, lrs, losses = capture_adam(
        model, pristine,
        lambda o, y: cce(o, torch.from_numpy(y)), [(x1, y1), (x2, y2)])
    tagged["adam1"], tagged["adam2"] = dumps
    scalars["adam_lrs"] = np.array(lrs)
    scalars["adam_losses"] = np.array(losses)

    save_captures(os.path.join(OUT, "train_diff_rawgatst.npz"),
                  x1, x2, y1, y2, dur1, band_pass, tagged, scalars)


# ------------------------------------------------------------ lr schedules
def make_lr_trajectories():
    import utils as ref_utils

    def dummy_optimizer(base_lr):
        p = torch.nn.Parameter(torch.zeros(1, dtype=torch.float64))
        return torch.optim.SGD([p], lr=base_lr)

    out = {}

    # cosine + keras_decay: stepped per BATCH (main.py:479-480)
    for name, steps in (("cosine", 700), ("keras_decay", 600)):
        oc = {"scheduler": name, "base_lr": 1e-4, "lr_min": 5e-6,
              "epochs": 100, "steps_per_epoch": 7}
        opt = dummy_optimizer(oc["base_lr"])
        sched = ref_utils._get_scheduler(opt, oc)
        lrs = []
        for _ in range(steps):
            lrs.append(float(opt.param_groups[0]["lr"]))
            sched.step()
        out[f"lr_{name}"] = np.array(lrs)

    # multistep + sgdr: per-EPOCH schedulers.  NOTE: the fork never steps
    # them at all (the only scheduler.step() is the per-batch one at
    # main.py:479-480, gated to cosine/keras_decay) — a fork bug, like the
    # dormant config keys.  The framework implements the schedulers'
    # DESIGNED per-epoch semantics; the golden captures torch's
    # MultiStepLR / SGDRScheduler stepped once per epoch.
    oc = {"scheduler": "multistep", "base_lr": 1e-4,
          "milestones": [10, 20, 30], "lr_decay": 0.5}
    opt = dummy_optimizer(oc["base_lr"])
    sched = ref_utils._get_scheduler(opt, oc)
    lrs = []
    for _ in range(40):
        lrs.append(float(opt.param_groups[0]["lr"]))
        sched.step()
    out["lr_multistep"] = np.array(lrs)

    oc = {"scheduler": "sgdr", "base_lr": 1e-4, "T0": 5, "Tmult": 2,
          "lr_min": 1e-6}
    opt = dummy_optimizer(oc["base_lr"])
    sched = ref_utils._get_scheduler(opt, oc)
    lrs = []
    for _ in range(40):   # restarts at epochs 5, 15, 35 — 3 full cycles
        lrs.append(float(opt.param_groups[0]["lr"]))
        sched.step()
    out["lr_sgdr"] = np.array(lrs)

    np.savez_compressed(os.path.join(OUT, "train_diff_lr.npz"), **out)
    print(f"wrote train_diff_lr.npz: "
          + ", ".join(f"{k}[{len(v)}]" for k, v in out.items()))


if __name__ == "__main__":
    torch.set_default_dtype(torch.float64)
    torch.manual_seed(0)
    targets = sys.argv[1:] or ["lr", "rawnet2", "aasist", "aasist2",
                               "rawgatst"]
    fns = {"lr": make_lr_trajectories, "rawnet2": make_rawnet2,
           "aasist": make_aasist, "aasist2": make_aasist2,
           "rawgatst": make_rawgatst}
    for t in targets:
        fns[t]()
