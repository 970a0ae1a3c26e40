"""Fused frontend+block0 stack vs the XLA reference chain (interpreter).

Covers pack_w_frontend / pack_w1ds / pack_w2 numerics and the full
fused_frontend_block0 path including phase-plane masking and tile halos.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aasist_tpu import nn
from aasist_tpu.models import layers as L
from aasist_tpu.models.layers import sinc_filterbank

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import fused_stack as FS  # noqa: E402

C = 32


def _mk_params(rng):
    r = np.random.default_rng(rng)
    f32 = np.float32
    p = {
        "conv1": {"weight": r.normal(0, 0.3, (C, 1, 2, 3)).astype(f32),
                  "bias": r.normal(0, 0.1, (C,)).astype(f32)},
        "conv2": {"weight": r.normal(0, 0.2, (C, C, 2, 3)).astype(f32),
                  "bias": r.normal(0, 0.1, (C,)).astype(f32)},
        "conv_downsample": {
            "weight": r.normal(0, 0.3, (C, 1, 1, 3)).astype(f32),
            "bias": r.normal(0, 0.1, (C,)).astype(f32)},
        "bn2": {"weight": 1.0 + 0.1 * r.normal(0, 1, (C,)).astype(f32),
                "bias": 0.1 * r.normal(0, 1, (C,)).astype(f32)},
    }
    s = {
        "bn2": {"mean": 0.05 * r.normal(0, 1, (C,)).astype(f32),
                "var": (1.0 + 0.2 * r.random((C,))).astype(f32)},
    }
    fe_p = {"weight": np.asarray([1.3], f32), "bias": np.asarray([0.2], f32)}
    fe_s = {"mean": np.asarray([0.1], f32), "var": np.asarray([1.5], f32)}
    return p, s, fe_p, fe_s


def _xla_chain(bank, fe_p, fe_s, p, s, x):
    h = L.sinc_frontend(bank, x)
    h = jnp.abs(h)[:, None]
    h = nn.max_pool(h, (3, 3))
    h, _ = nn.batch_norm(fe_p, fe_s, h, axis=1, train=False)
    h = jax.nn.selu(h)
    out, _ = L.residual_block_apply(p, s, h, first=True, train=False)
    return out


@pytest.mark.parametrize("length,b", [(2400, 2), (4000, 3)])
def test_fused_stack_matches_xla(length, b):
    p, s, fe_p, fe_s = _mk_params(0)
    bank = sinc_filterbank(70, 129, 16000).astype(np.float32)
    r = np.random.default_rng(1)
    x = r.normal(0, 1, (b, length)).astype(np.float32)

    ref = np.asarray(
        _xla_chain(jnp.asarray(bank), fe_p, fe_s, p, s, jnp.asarray(x)),
        np.float32)

    fsp = FS.FusedStackParams(bank, fe_p, fe_s, p, s, dtype=jnp.float32)
    got = np.asarray(
        FS.fused_frontend_block0(jnp.asarray(x), fsp), np.float32)

    assert got.shape == ref.shape, (got.shape, ref.shape)
    err = np.max(np.abs(got - ref))
    scale = np.max(np.abs(ref)) + 1e-6
    assert err / scale < 5e-5, f"rel err {err / scale:.2e}"


def test_frontend_planes_match_xla():
    """z phase planes (pre-block0) agree with the XLA pooled frontend."""
    _, _, fe_p, fe_s = _mk_params(0)
    bank = sinc_filterbank(70, 129, 16000).astype(np.float32)
    r = np.random.default_rng(2)
    b, length = 2, 2400
    x = r.normal(0, 1, (b, length)).astype(np.float32)

    h = L.sinc_frontend(jnp.asarray(bank), jnp.asarray(x))
    h = jnp.abs(h)[:, None]
    h = nn.max_pool(h, (3, 3))
    h, _ = nn.batch_norm(fe_p, fe_s, h, axis=1, train=False)
    zref = np.asarray(jax.nn.selu(h), np.float32)[:, 0]   # (B, 23, Tz)

    t1 = length - FS.KSIZE + 1
    t_z = t1 // 3
    v_z = -(-t_z // 3)
    u = 128
    nt = -(-v_z // u)
    vtot = nt * u + FS.H9
    xp = np.pad(x, ((0, 0), (0, 9 * vtot - length)))
    xq = np.transpose(xp.reshape(b, vtot, 9), (2, 0, 1))
    xt = np.stack([xq[:, :, j * u:j * u + u + FS.H9] for j in range(nt)],
                  axis=0)
    w = FS.pack_w_frontend(bank)
    from aasist_tpu.nn import BN_EPS
    inv = 1.0 / np.sqrt(fe_s["var"][0] + BN_EPS)
    sc = np.asarray([[fe_p["weight"][0] * inv,
                      fe_p["bias"][0] - fe_s["mean"][0]
                      * fe_p["weight"][0] * inv]], np.float32)
    z = np.asarray(FS._fe_run(jnp.asarray(xt, jnp.float32),
                              jnp.asarray(w, jnp.float32),
                              jnp.asarray(sc), 2, u, 70, t_z))
    # rows q'*32 + 1 + f; z[q', f, v] = zref[:, f, 3v + q']
    for qp in range(3):
        n_q = -(-(t_z - qp) // 3)
        plane = z[:, qp * 32 + 1:qp * 32 + 24, :n_q]
        expect = zref[:, :, qp::3][:, :, :n_q]
        assert np.max(np.abs(plane - expect)) < 2e-5
        # masked tail is exactly zero
        assert np.all(z[:, qp * 32 + 1:qp * 32 + 24, n_q:] == 0)
        assert np.all(z[:, qp * 32] == 0)
        assert np.all(z[:, qp * 32 + 24:(qp + 1) * 32] == 0)
