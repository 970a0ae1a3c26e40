"""SPMD data-parallel tests on the virtual 8-device CPU mesh.

The conftest forces JAX_PLATFORMS=cpu with
xla_force_host_platform_device_count=8, so a real Mesh with 8 devices is
available (SURVEY.md §4d test strategy).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from aasist_tpu.parallel import (make_mesh, batch_sharding,
                                 replicated_sharding)
from aasist_tpu.parallel.mesh import pad_batch_to_multiple
from aasist_tpu.registry import build_model
from aasist_tpu.train.losses import weighted_cce

TINY_CONF = {
    "architecture": "AASIST",
    "first_conv": 128,
    "filts": [70, [1, 8], [8, 8], [8, 12], [12, 12]],
    "gat_dims": [12, 16],
    "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
}


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    assert mesh.axis_names == ("data", "model")


def test_batch_sharding_distributes_rows():
    mesh = make_mesh()
    sh = batch_sharding(mesh)
    x = jax.device_put(np.arange(16 * 4, dtype=np.float32).reshape(16, 4),
                       sh)
    assert len(x.addressable_shards) == 8
    assert all(s.data.shape == (2, 4) for s in x.addressable_shards)


def test_pad_batch_to_multiple():
    x = np.arange(10 * 3, dtype=np.float32).reshape(10, 3)
    padded, n_real = pad_batch_to_multiple(x, 8)
    assert padded.shape == (16, 3) and n_real == 10
    np.testing.assert_array_equal(padded[10:], np.tile(x[-1:], (6, 1)))


def test_sharded_eval_matches_single_device():
    """Data-parallel forward must produce identical logits."""
    model = build_model(TINY_CONF)
    params, state = model.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).standard_normal((8, 16000)).astype(
        np.float32) * 0.05

    (_, ref), _ = jax.jit(
        lambda p, s, x: model.apply(p, s, x, train=False))(params, state, x)

    mesh = make_mesh()
    sh = batch_sharding(mesh)
    repl = replicated_sharding(mesh)
    xs = jax.device_put(x, sh)
    ps = jax.device_put(params, repl)
    ss = jax.device_put(state, repl)
    (_, sharded), _ = jax.jit(
        lambda p, s, x: model.apply(p, s, x, train=False))(ps, ss, xs)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_data_parallel_grads_match_single_device():
    """The implicit gradient psum must equal the single-device gradient."""
    model = build_model(TINY_CONF)
    params, state = model.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(1).standard_normal((8, 16000)).astype(
        np.float32) * 0.05
    y = (np.arange(8) % 2).astype(np.int32)

    def loss_fn(p, x, y):
        (_, logits), _ = model.apply(p, state, x, train=False)
        return weighted_cce(logits, y)

    g_ref = jax.jit(jax.grad(loss_fn))(params, x, y)

    mesh = make_mesh()
    sh = batch_sharding(mesh)
    repl = replicated_sharding(mesh)
    g_dp = jax.jit(jax.grad(loss_fn))(
        jax.device_put(params, repl), jax.device_put(x, sh),
        jax.device_put(y, sh))

    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_dp = jax.tree_util.tree_leaves(g_dp)
    for a, b in zip(flat_ref, flat_dp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-4)


def test_data_parallel_train_step_runs():
    model = build_model(TINY_CONF)
    params, state = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(params)
    mesh = make_mesh()
    sh = batch_sharding(mesh)
    repl = replicated_sharding(mesh)

    def step(p, s, o, x, y, rng):
        def loss_of(pp):
            (_, logits), new_s = model.apply(pp, s, x, train=True, rng=rng)
            return weighted_cce(logits, y), new_s
        (loss, new_s), grads = jax.value_and_grad(
            loss_of, has_aux=True)(p)
        updates, new_o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), new_s, new_o, loss

    jstep = jax.jit(step, in_shardings=(repl, repl, repl, sh, sh, None),
                    out_shardings=(repl, repl, repl, repl))
    x = jax.device_put(np.random.default_rng(0).standard_normal(
        (8, 16000)).astype(np.float32), sh)
    y = jax.device_put((np.arange(8) % 2).astype(np.int32), sh)
    p2, s2, o2, loss = jstep(jax.device_put(params, repl),
                             jax.device_put(state, repl),
                             jax.device_put(opt_state, repl), x, y,
                             jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    # params moved and stayed replicated
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(p2)))


def test_make_mesh_warns_on_dropped_devices():
    """A mis-sized (n_data, n_model) must not silently idle chips
    (round-2 review weak #6)."""
    import warnings

    devices = jax.devices()
    if len(devices) < 3:
        pytest.skip("needs >=3 devices")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mesh = make_mesh(n_data=2, n_model=1, devices=devices)
    assert mesh.devices.size == 2
    assert any("idle" in str(x.message) for x in w), (
        "expected a dropped-devices warning")


def test_fused_frontend_sharded_matches_plain():
    """shard_map'd fused frontend == plain kernel on the data mesh.

    Regression for the jax 0.9 shard_map signature change
    (check_rep -> check_vma), which broke the DP serving path while
    every test stayed green — nothing in the suite exercised
    fused_frontend_sharded directly (it was dryrun-phase-5 only).
    """
    from aasist_tpu.ops.fused_frontend import (fused_frontend,
                                               fused_frontend_sharded)

    mesh = make_mesh()
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((8, 2000)), jnp.float32)
    bank = jnp.asarray(rng.standard_normal((70, 129)) * 0.1, jnp.float32)
    bn_p = {"weight": jnp.ones((1,)), "bias": jnp.zeros((1,))}
    bn_s = {"mean": jnp.zeros((1,)), "var": jnp.ones((1,))}

    plain = np.asarray(fused_frontend(x, bank, bn_p, bn_s))
    sharded = np.asarray(
        fused_frontend_sharded(x, bank, bn_p, bn_s, mesh=mesh))
    assert sharded.shape == plain.shape
    np.testing.assert_allclose(sharded, plain, atol=1e-6)
