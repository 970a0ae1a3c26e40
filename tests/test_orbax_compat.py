"""Orbax checkpoint backend round-trip."""

import numpy as np
import pytest

import jax.numpy as jnp

pytest.importorskip("orbax.checkpoint")

from aasist_tpu.train.checkpoints import TrainCheckpoint
from aasist_tpu.train import orbax_compat


def test_orbax_roundtrip(tmp_path):
    import optax
    params = {"lin": {"weight": jnp.arange(6.0).reshape(2, 3)}}
    state = {"bn": {"mean": jnp.zeros(3), "var": jnp.ones(3)}}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    ckpt = TrainCheckpoint(
        params=params, model_state=state, opt_state=opt_state,
        step=7, epoch=2, best_dev_eer=3.5, best_eval_eer=4.5,
        best_eval_tdcf=0.09, n_swa=1, swa_avg=params)
    orbax_compat.save_train_state(tmp_path / "ock", ckpt)

    template = TrainCheckpoint(
        params=params, model_state=state, opt_state=opt.init(params),
        step=0, epoch=0, best_dev_eer=0, best_eval_eer=0,
        best_eval_tdcf=0, n_swa=0, swa_avg=params)
    loaded = orbax_compat.load_train_state(tmp_path / "ock", template)
    assert loaded.step == 7 and loaded.epoch == 2
    assert loaded.best_dev_eer == 3.5
    np.testing.assert_array_equal(
        np.asarray(loaded.params["lin"]["weight"]),
        np.asarray(params["lin"]["weight"]))
    assert loaded.swa_avg is not None
