"""Generate golden test fixtures from the PyTorch reference.

Run once in an environment where the reference repo is available
(default path /root/reference, override with AASIST_REFERENCE_PATH).
The resulting .npz files are committed under tests/goldens/ so the test
suite never needs the reference repo or torch at test time.

Goldens produced:
  metrics_golden.npz   — synthetic CM+ASV scores with reference EER/minDCF
  aasist_golden.npz    — AASIST (pretrained AASIST.pth weights, original
                         Residual_block encoder geometry) logits on fixed
                         inputs, eval mode
  aasist_l_golden.npz  — same for AASIST-L.pth
  rawnet2_golden.npz   — RawNet2 logits under seeded random init, eval mode
  rawgatst_golden.npz  — RawGAT-ST logits under seeded random init, eval mode

Note: for AASIST the fork's models/AASIST.py Model uses a Res2Net encoder
that cannot load the shipped checkpoints (SURVEY.md "fork drift" #1), so the
AASIST goldens are produced by a faithful torch replica of the ORIGINAL
architecture assembled here from the original-geometry blocks, verified to
load both .pth files with strict=True.
"""

import os
import sys

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

REF = os.environ.get("AASIST_REFERENCE_PATH", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
os.makedirs(OUT, exist_ok=True)
sys.path.insert(0, REF)

torch.manual_seed(0)


# ---------------------------------------------------------------- metrics
def make_metrics_golden():
    import evaluation as ref_eval  # reference module

    rng = np.random.default_rng(42)
    n_bona, n_spoof = 400, 3600
    bona = rng.normal(2.0, 1.0, n_bona)
    spoof = rng.normal(-1.0, 1.5, n_spoof)
    # ASV scores
    tar = rng.normal(3.0, 1.0, 500)
    non = rng.normal(-2.0, 1.0, 500)
    spf = rng.normal(0.0, 1.5, 2000)

    eer_cm, thr_cm = ref_eval.compute_eer(bona, spoof)
    eer_asv, thr_asv = ref_eval.compute_eer(tar, non)
    pfa, pmiss, pmiss_spoof = ref_eval.obtain_asv_error_rates(
        tar, non, spf, thr_asv)
    cost_model = {
        'Pspoof': 0.05, 'Ptar': 0.95 * 0.99, 'Pnon': 0.95 * 0.01,
        'Cmiss': 1, 'Cfa': 10, 'Cmiss_asv': 1, 'Cfa_asv': 10,
        'Cmiss_cm': 1, 'Cfa_cm': 10,
    }
    tdcf_curve, thresholds = ref_eval.compute_tDCF(
        bona, spoof, pfa, pmiss, pmiss_spoof, cost_model, False)
    min_tdcf = float(tdcf_curve[np.argmin(tdcf_curve)])
    frr, far, thr = ref_eval.compute_det_curve(bona, spoof)

    np.savez(
        os.path.join(OUT, "metrics_golden.npz"),
        bona=bona, spoof=spoof, tar=tar, non=non, spf=spf,
        eer_cm=eer_cm, thr_cm=thr_cm, eer_asv=eer_asv, thr_asv=thr_asv,
        pfa_asv=pfa, pmiss_asv=pmiss, pmiss_spoof_asv=pmiss_spoof,
        min_tdcf=min_tdcf, tdcf_curve=tdcf_curve,
        frr=frr, far=far, thresholds=thr,
    )
    print(f"metrics golden: EER={eer_cm*100:.4f}% minDCF={min_tdcf:.6f}")


# ------------------------------------------------- original AASIST (torch)
# The shipped checkpoints need the ORIGINAL NAVER encoder (2,3)-kernel
# Residual_block and the original Model wiring. The fork keeps faithful
# copies of every sub-block except the encoder; the original-geometry
# Residual_block survives in models/RawNetGatSpoofST.py:225-278. We assemble
# the original Model from those faithful pieces.
def build_original_aasist(d_args):
    from models.AASIST import (GraphAttentionLayer, HtrgGraphAttentionLayer,
                               GraphPool, CONV)
    from models.RawNetGatSpoofST import Residual_block  # original geometry

    class OriginalAASIST(nn.Module):
        def __init__(self, d_args):
            super().__init__()
            filts = d_args["filts"]
            gat_dims = d_args["gat_dims"]
            pool_ratios = d_args["pool_ratios"]
            temperatures = d_args["temperatures"]
            self.conv_time = CONV(out_channels=filts[0],
                                  kernel_size=d_args["first_conv"],
                                  in_channels=1)
            self.first_bn = nn.BatchNorm2d(num_features=1)
            self.drop = nn.Dropout(0.5, inplace=True)
            self.drop_way = nn.Dropout(0.2, inplace=True)
            self.selu = nn.SELU(inplace=True)
            self.encoder = nn.Sequential(
                nn.Sequential(Residual_block(nb_filts=filts[1], first=True)),
                nn.Sequential(Residual_block(nb_filts=filts[2])),
                nn.Sequential(Residual_block(nb_filts=filts[3])),
                nn.Sequential(Residual_block(nb_filts=filts[4])),
                nn.Sequential(Residual_block(nb_filts=filts[4])),
                nn.Sequential(Residual_block(nb_filts=filts[4])))
            self.pos_S = nn.Parameter(torch.randn(1, 23, filts[-1][-1]))
            self.master1 = nn.Parameter(torch.randn(1, 1, gat_dims[0]))
            self.master2 = nn.Parameter(torch.randn(1, 1, gat_dims[0]))
            self.GAT_layer_S = GraphAttentionLayer(
                filts[-1][-1], gat_dims[0], temperature=temperatures[0])
            self.GAT_layer_T = GraphAttentionLayer(
                filts[-1][-1], gat_dims[0], temperature=temperatures[1])
            self.HtrgGAT_layer_ST11 = HtrgGraphAttentionLayer(
                gat_dims[0], gat_dims[1], temperature=temperatures[2])
            self.HtrgGAT_layer_ST12 = HtrgGraphAttentionLayer(
                gat_dims[1], gat_dims[1], temperature=temperatures[2])
            self.HtrgGAT_layer_ST21 = HtrgGraphAttentionLayer(
                gat_dims[0], gat_dims[1], temperature=temperatures[2])
            self.HtrgGAT_layer_ST22 = HtrgGraphAttentionLayer(
                gat_dims[1], gat_dims[1], temperature=temperatures[2])
            self.pool_S = GraphPool(pool_ratios[0], gat_dims[0], 0.3)
            self.pool_T = GraphPool(pool_ratios[1], gat_dims[0], 0.3)
            self.pool_hS1 = GraphPool(pool_ratios[2], gat_dims[1], 0.3)
            self.pool_hT1 = GraphPool(pool_ratios[2], gat_dims[1], 0.3)
            self.pool_hS2 = GraphPool(pool_ratios[2], gat_dims[1], 0.3)
            self.pool_hT2 = GraphPool(pool_ratios[2], gat_dims[1], 0.3)
            self.out_layer = nn.Linear(5 * gat_dims[1], 2)

        def forward(self, x, Freq_aug=False):
            x = x.unsqueeze(1)
            x = self.conv_time(x, mask=Freq_aug)
            x = x.unsqueeze(dim=1)
            x = F.max_pool2d(torch.abs(x), (3, 3))
            x = self.first_bn(x)
            x = self.selu(x)
            e = self.encoder(x)
            e_S, _ = torch.max(torch.abs(e), dim=3)
            e_S = e_S.transpose(1, 2) + self.pos_S
            gat_S = self.GAT_layer_S(e_S)
            out_S = self.pool_S(gat_S)
            e_T, _ = torch.max(torch.abs(e), dim=2)
            e_T = e_T.transpose(1, 2)
            gat_T = self.GAT_layer_T(e_T)
            out_T = self.pool_T(gat_T)
            out_T1, out_S1, master1 = self.HtrgGAT_layer_ST11(
                out_T, out_S, master=self.master1)
            out_S1 = self.pool_hS1(out_S1)
            out_T1 = self.pool_hT1(out_T1)
            out_T_aug, out_S_aug, master_aug = self.HtrgGAT_layer_ST12(
                out_T1, out_S1, master=master1)
            out_T1 = out_T1 + out_T_aug
            out_S1 = out_S1 + out_S_aug
            master1 = master1 + master_aug
            out_T2, out_S2, master2 = self.HtrgGAT_layer_ST21(
                out_T, out_S, master=self.master2)
            out_S2 = self.pool_hS2(out_S2)
            out_T2 = self.pool_hT2(out_T2)
            out_T_aug, out_S_aug, master_aug = self.HtrgGAT_layer_ST22(
                out_T2, out_S2, master=master2)
            out_T2 = out_T2 + out_T_aug
            out_S2 = out_S2 + out_S_aug
            master2 = master2 + master_aug
            out_T1 = self.drop_way(out_T1)
            out_T2 = self.drop_way(out_T2)
            out_S1 = self.drop_way(out_S1)
            out_S2 = self.drop_way(out_S2)
            master1 = self.drop_way(master1)
            master2 = self.drop_way(master2)
            out_T = torch.max(out_T1, out_T2)
            out_S = torch.max(out_S1, out_S2)
            master = torch.max(master1, master2)
            T_max, _ = torch.max(torch.abs(out_T), dim=1)
            T_avg = torch.mean(out_T, dim=1)
            S_max, _ = torch.max(torch.abs(out_S), dim=1)
            S_avg = torch.mean(out_S, dim=1)
            last_hidden = torch.cat(
                [T_max, T_avg, S_max, S_avg, master.squeeze(1)], dim=1)
            last_hidden = self.drop(last_hidden)
            output = self.out_layer(last_hidden)
            return last_hidden, output

    return OriginalAASIST(d_args)


def make_aasist_golden(conf_name, ckpt, out_name):
    import json
    with open(os.path.join(REF, "config", conf_name)) as f:
        cfg = json.load(f)
    model = build_original_aasist(cfg["model_config"])
    sd = torch.load(os.path.join(REF, ckpt), map_location="cpu")
    missing, unexpected = model.load_state_dict(sd, strict=True), None
    model.eval()
    n_params = sum(p.numel() for p in model.parameters())
    rng = np.random.default_rng(7)
    x = rng.standard_normal((4, 64600)).astype(np.float32) * 0.05
    with torch.no_grad():
        hidden, logits = model(torch.from_numpy(x))
    np.savez(os.path.join(OUT, out_name),
             x=x, hidden=hidden.numpy(), logits=logits.numpy(),
             n_params=n_params)
    print(f"{out_name}: params={n_params} logits[0]={logits[0].numpy()}")


def make_rawnet2_golden():
    import json
    from models.RawNet2Spoof import Model as RawNet2
    with open(os.path.join(REF, "config", "RawNet2_baseline.conf")) as f:
        cfg = json.load(f)
    torch.manual_seed(123)
    model = RawNet2(cfg["model_config"])
    model.eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 64600)).astype(np.float32) * 0.05
    with torch.no_grad():
        hidden, logits = model(torch.from_numpy(x))
    n_params = sum(p.numel() for p in model.parameters())
    np.savez(os.path.join(OUT, "rawnet2_golden.npz"),
             x=x, hidden=hidden.numpy(), logits=logits.numpy(),
             n_params=n_params,
             **{"sd__" + k: v for k, v in sd.items()})
    print(f"rawnet2 golden: params={n_params} logits[0]={logits[0].numpy()}")


def make_rawgatst_golden():
    import json
    from models.RawNetGatSpoofST import Model as RawGATST
    with open(os.path.join(REF, "config", "RawGATST_baseline.conf")) as f:
        cfg = json.load(f)
    torch.manual_seed(123)
    model = RawGATST(cfg["model_config"])
    model.eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 64600)).astype(np.float32) * 0.05
    with torch.no_grad():
        hidden, logits = model(torch.from_numpy(x))
    n_params = sum(p.numel() for p in model.parameters())
    np.savez(os.path.join(OUT, "rawgatst_golden.npz"),
             x=x, hidden=hidden.numpy(), logits=logits.numpy(),
             n_params=n_params,
             **{"sd__" + k: v for k, v in sd.items()})
    print(f"rawgatst golden: params={n_params} logits[0]={logits[0].numpy()}")


if __name__ == "__main__":
    make_metrics_golden()
    make_aasist_golden("AASIST.conf", "models/weights/AASIST.pth",
                       "aasist_golden.npz")
    make_aasist_golden("AASIST-L.conf", "models/weights/AASIST-L.pth",
                       "aasist_l_golden.npz")
    make_rawnet2_golden()
    make_rawgatst_golden()
