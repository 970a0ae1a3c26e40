"""End-to-end pipeline tests on the synthetic FLAC corpus.

Exercises: native FLAC decode -> batchers -> jitted train step -> dev/eval
scoring -> EER/t-DCF -> checkpoints/SWA -> resume.  Uses a tiny AASIST so
the whole run takes ~a minute on CPU.
"""

import json

import numpy as np
import pytest

import jax

from aasist_tpu.config import load_config
from aasist_tpu.data import synthetic

TINY_MODEL = {
    "architecture": "AASIST",
    "first_conv": 128,
    "filts": [70, [1, 4], [4, 4], [4, 8], [8, 8]],
    "gat_dims": [8, 12],
    "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e") / "LA"
    synthetic.generate(root, n_train=8, n_dev=6, n_eval=6, seed=11,
                       min_duration_s=1.0, max_duration_s=2.0)
    return root


def _make_config(tmp_path, corpus, **overrides):
    conf = {
        "database_path": str(corpus) + "/",
        "asv_score_path": ("ASVspoof2019_LA_asv_scores/"
                           "ASVspoof2019.LA.asv.eval.gi.trl.scores.txt"),
        "model_path": "unused.npz",
        "batch_size": 4,
        "num_epochs": 1,
        "loss": "CCE",
        "track": "LA",
        "eval_all_best": "True",
        "eval_output": "eval_scores.txt",
        "model_config": TINY_MODEL,
        "optim_config": {"optimizer": "adam", "amsgrad": "False",
                         "base_lr": 1e-3, "lr_min": 5e-6,
                         "betas": [0.9, 0.999], "weight_decay": 1e-4,
                         "scheduler": "cosine"},
    }
    conf.update(overrides)
    p = tmp_path / "e2e.conf"
    p.write_text(json.dumps(conf))
    return p


@pytest.mark.slow
def test_full_training_run_and_resume(tmp_path, corpus):
    from aasist_tpu import cli
    conf_path = _make_config(tmp_path, corpus, num_epochs=2)
    rc = cli.main(["--config", str(conf_path),
                   "--output_dir", str(tmp_path / "exp"), "--seed", "7"])
    assert rc == 0
    run_dir = tmp_path / "exp" / "LA_e2e_ep2_bs4"
    assert (run_dir / "weights" / "swa.npz").exists()
    assert (run_dir / "train_state" / "meta.json").exists()
    assert (run_dir / "eval_scores.txt").exists()
    scores = (run_dir / "eval_scores.txt").read_text().strip().split("\n")
    assert len(scores) == 6
    meta = json.loads((run_dir / "train_state" / "meta.json").read_text())
    assert meta["epoch"] == 1

    # resume continues from the stored epoch without crashing
    conf_path3 = _make_config(tmp_path, corpus, num_epochs=3)
    (tmp_path / "exp" / "LA_e2e_ep3_bs4").mkdir(parents=True, exist_ok=True)
    import shutil
    shutil.copytree(run_dir / "train_state",
                    tmp_path / "exp" / "LA_e2e_ep3_bs4" / "train_state")
    rc = cli.main(["--config", str(conf_path3),
                   "--output_dir", str(tmp_path / "exp"), "--seed", "7",
                   "--resume"])
    assert rc == 0
    meta2 = json.loads((tmp_path / "exp" / "LA_e2e_ep3_bs4" / "train_state"
                        / "meta.json").read_text())
    assert meta2["epoch"] == 2


@pytest.mark.slow
def test_cli_trains_data_parallel_on_mesh(tmp_path, corpus):
    """The CLI auto-builds a data-parallel mesh (4 of the 8 virtual CPU
    devices for batch 4) and trains over it end-to-end."""
    from aasist_tpu import cli
    conf_path = _make_config(tmp_path, corpus, num_epochs=1)
    rc = cli.main(["--config", str(conf_path),
                   "--output_dir", str(tmp_path / "exp_dp"), "--seed", "3"])
    assert rc == 0
    run_dir = tmp_path / "exp_dp" / "LA_e2e_ep1_bs4"
    assert (run_dir / "eval_scores.txt").exists()


@pytest.mark.slow
def test_eval_only_path(tmp_path, corpus):
    from aasist_tpu import cli
    from aasist_tpu.registry import build_model
    from aasist_tpu.train.checkpoints import save_weights
    model = build_model(TINY_MODEL)
    params, state = model.init(jax.random.PRNGKey(0))
    w = tmp_path / "w.npz"
    save_weights(w, params, state)
    conf_path = _make_config(tmp_path, corpus, model_path=str(w))
    rc = cli.main(["--config", str(conf_path),
                   "--output_dir", str(tmp_path / "exp_eval"),
                   "--seed", "7", "--eval"])
    assert rc == 0
    run_dir = tmp_path / "exp_eval" / "LA_e2e_ep1_bs4"
    assert (run_dir / "t-DCF_EER.txt").exists()
    text = (run_dir / "t-DCF_EER.txt").read_text()
    assert "EER" in text and "min-tDCF" in text


@pytest.mark.slow
def test_training_with_chained_steps(tmp_path, corpus):
    """train_chain groups steps into one dispatch; tail runs as singles.

    batch 2 over 8 train files = 4 steps; chain 3 = one chained group of
    3 + a 1-step tail, exercising both paths through the epoch loop.
    """
    from aasist_tpu import cli
    conf_path = _make_config(tmp_path, corpus, batch_size=2,
                             train_chain=3)
    rc = cli.main(["--config", str(conf_path),
                   "--output_dir", str(tmp_path / "expc"), "--seed", "7"])
    assert rc == 0
    run_dir = tmp_path / "expc" / "LA_e2e_ep1_bs2"
    assert (run_dir / "eval_scores.txt").exists()
    scores = (run_dir / "eval_scores.txt").read_text().strip().split("\n")
    assert len(scores) == 6
    # scores are finite floats
    for line in scores:
        float(line.split()[-1])


@pytest.mark.slow
def test_fast_recipe_training_neutrality(tmp_path, corpus):
    """VERDICT r2 item 5: the promoted fast recipe (2x batch + bf16 mixed
    precision + remat; configs/AASIST_tpu_fast.conf shape) must train to
    the same synthetic-corpus quality as the reference-shaped recipe.

    The corpus is tiny so EER granularity is coarse — the assertion is
    that the fast recipe reaches an equal-or-better best-dev EER under
    the same seed and epoch budget, i.e. the throughput knobs
    (batch/mixed_precision/remat/accum) do not corrupt training.
    """
    import json as _json

    from aasist_tpu import cli

    def run(tag, **overrides):
        d = tmp_path / tag
        d.mkdir()
        conf_path = _make_config(d, corpus, num_epochs=2, **overrides)
        rc = cli.main(["--config", str(conf_path),
                       "--output_dir", str(d / "exp"), "--seed", "11"])
        assert rc == 0
        run_dir = next((d / "exp").iterdir())
        meta = _json.loads(
            (run_dir / "train_state" / "meta.json").read_text())
        return meta["best_dev_eer"]

    eer_ref = run("ref", batch_size=4)
    eer_fast = run("fast", batch_size=8, mixed_precision="True",
                   grad_accum_steps=2,
                   model_config=dict(TINY_MODEL, remat=True))
    assert np.isfinite(eer_fast) and 0.0 <= eer_fast <= 100.0
    assert eer_fast <= eer_ref + 1e-9, (eer_fast, eer_ref)
