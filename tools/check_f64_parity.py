"""Float64 structural-parity check for AASIST.

Run with JAX_ENABLE_X64=1 (the test suite invokes this in a subprocess so
the x64 flag never leaks into the main test process).  In float64 the JAX
model and the PyTorch reference must agree to ~1e-9 — accumulation-order
effects vanish, so any remaining difference is a real structural bug.

Exit code 0 on success; prints the max abs diff.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402

# the axon sitecustomize force-selects the TPU backend; override (the TPU
# has no f64 — running there silently produced garbage)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from aasist_tpu.registry import build_model  # noqa: E402
from aasist_tpu.utils.pytree_io import load_tree_npz  # noqa: E402

ROOT = os.path.join(os.path.dirname(__file__), "..")

CONF = {
    "architecture": "AASIST",
    "first_conv": 128,
    "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
    "gat_dims": [64, 32],
    "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
    # the model casts inputs to its compute dtype (default float32);
    # this check needs the whole trunk in float64
    "dtype": "float64",
}


def main() -> int:
    golden = np.load(os.path.join(ROOT, "tests", "goldens",
                                  "aasist_f64_golden.npz"))
    params, state = load_tree_npz(os.path.join(ROOT, "checkpoints",
                                               "AASIST.npz"))
    to64 = lambda t: jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float64), t)
    params, state = to64(params), to64(state)

    model = build_model(CONF)
    # use the exact float64 filterbank the reference used (the reference
    # stores it as float32 and upcasts; ours is built in float64 natively,
    # so take the golden's copy to isolate the math being compared)
    model.filterbank = golden["band_pass"]

    (hidden, logits), _ = model.apply(params, state, golden["x"],
                                      train=False)
    dl = np.abs(np.asarray(logits) - golden["logits"]).max()
    dh = np.abs(np.asarray(hidden) - golden["hidden"]).max()
    print(f"f64 parity: max|dlogits|={dl:.3e} max|dhidden|={dh:.3e}")
    ok = dl < 1e-8 and dh < 1e-8
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
