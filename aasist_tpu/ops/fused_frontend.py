"""Fused sinc-frontend Pallas kernel (inference hot path).

The AASIST frontend — sinc filterbank conv1d (70 x 129), |.|,
maxpool(3,3), BatchNorm(1), SELU (reference models/AASIST.py:823-834) —
costs ~41 ms of the 163 ms bf16 forward at batch 256 on v5e
(tools/profile_stages.py): XLA materialises the (B, 70, 64472)
pre-pool activation in HBM (~8.3 GB bf16 written + read back for the
pool) and runs the K=129 conv at partial MXU utilisation.

This kernel keeps everything in VMEM: per (batch-group, time-tile) grid
step it computes the sinc conv as ONE phase-packed matmul, then
abs / 3x3 max-pool / folded-BN / SELU on the VPU, writing only the pooled
(B, 23, T/3) output — a ~60x cut in HBM traffic for the stage.

Key formulation (the stride-3 time pool without strided lane access):
  * XLA glue pre-splits the waveform into 3 time phases with a per-tile
    halo:  xt[b, j, q, v] = x[b, 3*(j*U + v) + q], v < U + HALO.
  * For pooled output phase p: y_p[f, v] = sum_k w[k, f] x[3v + p + k].
    With k -> (q, m) via q = (p + k) % 3, m = (p + k) // 3 this is a
    contraction over A[(q, m), v] = x_q[v + m] — the SAME A for all three
    phases, built from 3*44 contiguous lane-offset slices in VMEM.
  * One dot W[(q,m), (p,f)] x A -> (3*70, G, U) covers all phases and
    filters: K = 132, N = 210 (vs K = 129, N = 70 per-phase — better MXU
    shape and one pass over A).
  * Time pool: max over p of |y_p| (elementwise across phase planes).
    Freq pool: max over leading-dim row triples (70 -> 23) — leading-dim
    strides are free (only LANE strides are restricted on TPU).
  * BN(1 channel) folds to scalar scale/shift; SELU in min/max algebra.

The frontend output feeds the encoder unchanged; numerics match the XLA
path to bf16 rounding (interpreter-tested in CI, device-tested vs goldens
through the full model).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aasist_tpu.nn import BN_EPS

_SELU_L = 1.0507009873554805
_SELU_A = 1.6732632423543772

KSIZE = 129            # sinc kernel taps
M_MAX = (KSIZE + 2) // 3 + 1   # 44: max phase offset
HALO = M_MAX + 4       # halo columns per tile (lane-aligned headroom)


def _selu(x):
    zero = jnp.zeros((), x.dtype)
    return (_SELU_L * jnp.maximum(x, zero)
            + (_SELU_L * _SELU_A) * (jnp.exp(jnp.minimum(x, zero)) - 1.0))


def pack_filterbank(bank: np.ndarray) -> np.ndarray:
    """(70, 129) filterbank -> phase-packed (132, 210) weight matrix.

    W[(q*44 + m), (p*70 + f)] = bank[f, k] where k = 3m + q - p maps the
    contraction A[(q, m)] = x_q[v + m] onto y_p = conv(x, bank[f])[3v+p].
    """
    c, k = bank.shape
    assert k == KSIZE
    w = np.zeros((3 * M_MAX, 3 * c), bank.dtype)
    for p in range(3):
        for kk in range(KSIZE):
            q = (p + kk) % 3
            m = (p + kk) // 3
            w[q * M_MAX + m, p * c:(p + 1) * c] += bank[:, kk]
    return w


def _kernel(xt, w, sc, out_ref, a_scr, *, g: int, u: int, c: int,
            acc_dtype):
    """One (batch-group, time-tile) step.

    xt:  (1, 3, G, U + HALO) phase-split waveform tile (phase-leading so
         the im2col fill is transpose-free — a dynamic fill+transpose is
         the one shape the Mosaic compiler rejects, per the round-2
         feature bisect)
    w:   (3*M_MAX, 3*C) packed filterbank
    sc:  (1, 2) folded BN scale/shift (SMEM)
    out: (32, G, U) pooled+bn+selu rows 0..22, rows 23..31 zero
    a_scr: (3*M_MAX, G, U) VMEM scratch for the phase-packed im2col
    """
    # ---- A[(q, m), g, v] = x_q[g, v + m]: statically unrolled stores
    # (static lane-offset slices compile; program stays linear in 3*M_MAX)
    for q in range(3):
        for m in range(M_MAX):
            a_scr[q * M_MAX + m, :, :] = xt[0, q, :, m:m + u]

    # ---- all phases + filters in one dot: (3C, G, U) ----
    y = lax.dot_general(w[...], a_scr[...], (((0,), (0,)), ((), ())),
                        preferred_element_type=acc_dtype)
    y = jnp.abs(y)

    # ---- time pool: max over the 3 phase planes ----
    yp = jnp.maximum(jnp.maximum(y[0:c], y[c:2 * c]), y[2 * c:3 * c])

    # ---- freq pool: max over row triples (70 -> 23) via a leading-dim
    # split reshape (leading dims are free; strided slices would lower to
    # unsupported gathers) ----
    f_out = c // 3
    yr = yp[0:3 * f_out].reshape(f_out, 3, g, u)
    pooled = jnp.maximum(jnp.maximum(yr[:, 0], yr[:, 1]), yr[:, 2])

    # ---- folded BN (single channel -> scalars) + SELU ----
    z = pooled * sc[0, 0] + sc[0, 1]
    z = _selu(z).astype(out_ref.dtype)

    # out layout (32, G, U): freq-major matches the dot output's layout
    # (no in-kernel transpose); rows 23..31 are zero padding
    out_ref[...] = jnp.pad(z, ((0, 32 - f_out), (0, 0), (0, 0)))


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _run(xt, w, sc, g: int, u: int, c: int):
    n_tiles, b = xt.shape[0], xt.shape[2]
    kernel = functools.partial(_kernel, g=g, u=u, c=c,
                               acc_dtype=jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(b // g, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 3, g, xt.shape[3]),
                         lambda bb, jj: (jj, 0, bb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((32, g, u), lambda bb, jj: (0, bb, jj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, b, n_tiles * u), xt.dtype),
        scratch_shapes=[pltpu.VMEM((3 * M_MAX, g, u), xt.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(xt, w, sc)


def fused_frontend(x: jnp.ndarray, bank: jnp.ndarray, bn_p, bn_s,
                   *, g: int = 8, u: int = 2048) -> jnp.ndarray:
    """(B, L) waveform -> (B, 1, 23, T_out) pooled/bn/selu activations.

    Exact replacement for sinc_frontend + abs + max_pool(3,3) + eval-mode
    batch_norm + selu (models/aasist.py apply steps; reference
    models/AASIST.py:823-834).  ``bank`` may carry freq-aug masking.
    """
    b, length = x.shape
    c = bank.shape[0]
    t_out = (length - KSIZE + 1) // 3       # floor maxpool semantics

    while u > 128 and u > t_out:            # small inputs (tests)
        u //= 2
    n_tiles = -(-t_out // u)
    t_pad = n_tiles * u
    g = min(g, b)
    while b % g:
        g -= 1

    # phase split with halo: xt[j, q, b, v] = x[b, 3*(j*u + v) + q]
    # (phase-leading tile layout so the kernel's im2col fill needs no
    # transpose — see _kernel)
    total = 3 * (t_pad + HALO)
    xp = jnp.pad(x, ((0, 0), (0, max(0, total - length))))[:, :total]
    xq = jnp.transpose(xp.reshape(b, t_pad + HALO, 3), (2, 0, 1))
    xt = jnp.stack([xq[:, :, j * u:j * u + u + HALO]
                    for j in range(n_tiles)], axis=0)  # (nt, 3, B, U+HALO)

    w = jnp.asarray(_pack_traced(bank), x.dtype)

    inv = lax.rsqrt(jnp.asarray(bn_s["var"], jnp.float32) + BN_EPS)
    scale = (jnp.asarray(bn_p["weight"], jnp.float32) * inv)[0]
    shift = (jnp.asarray(bn_p["bias"], jnp.float32)
             - jnp.asarray(bn_s["mean"], jnp.float32)
             * jnp.asarray(bn_p["weight"], jnp.float32) * inv)[0]
    sc = jnp.stack([scale, shift]).reshape(1, 2).astype(jnp.float32)

    out = _run(xt, w, sc, g, u, c)                    # (32, B, t_pad)
    return jnp.transpose(out[:23, :, :t_out], (1, 0, 2))[:, None]


def fused_frontend_mesh(x: jnp.ndarray, bank: jnp.ndarray, bn_p, bn_s,
                        *, mesh=None, axis: str = "data") -> jnp.ndarray:
    """Mesh-aware entry point: plain kernel on one device, shard_map'd
    over the data axis under a mesh.  Models route through this single
    call so the dispatch logic lives in one place (round-4 review)."""
    if mesh is None:
        return fused_frontend(x, bank, bn_p, bn_s)
    return fused_frontend_sharded(x, bank, bn_p, bn_s, mesh=mesh,
                                  axis=axis)


def fused_frontend_sharded(x: jnp.ndarray, bank: jnp.ndarray, bn_p, bn_s,
                           *, mesh, axis: str = "data") -> jnp.ndarray:
    """``fused_frontend`` under a data-parallel mesh.

    GSPMD cannot partition a Pallas custom call on its own, so the DP
    serving path used to fall back to the XLA frontend (round-3 VERDICT
    #3).  ``shard_map`` makes the partitioning explicit instead: each
    device runs the kernel on its local batch shard (the frontend is
    embarrassingly batch-parallel — no halo, no collectives), with the
    filterbank and BN leaves replicated.
    """
    import inspect

    try:
        from jax import shard_map  # jax >= 0.9 stable API
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def local(xl, bk, bp, bs):
        return fused_frontend(xl, bk, bp, bs)

    # Replication checking must be off: the Pallas call inside the
    # shard can't be proven replication-consistent.  The kwarg was
    # renamed check_rep -> check_vma in jax 0.9; pick whichever this
    # jax accepts.
    sig = inspect.signature(shard_map).parameters
    if "check_vma" in sig:
        check_kws = ({"check_vma": False},)
    elif "check_rep" in sig:  # pragma: no cover - older jax
        check_kws = ({"check_rep": False},)
    else:  # pragma: no cover - future jax hiding kwargs behind **kwargs
        # (ADVICE r4): don't silently drop the flag — try both spellings
        # and only then fall back to no flag (tests/test_fused_frontend
        # regression-checks the mesh path either way)
        check_kws = ({"check_vma": False}, {"check_rep": False}, {})

    last_err = None
    for check_kw in check_kws:
        try:
            return shard_map(
                local, mesh=mesh,
                in_specs=(P(axis), P(), P(), P()),
                out_specs=P(axis), **check_kw)(x, bank, bn_p, bn_s)
        except TypeError as e:  # pragma: no cover - unknown kwarg
            last_err = e
    raise last_err


def _pack_traced(bank: jnp.ndarray) -> jnp.ndarray:
    """pack_filterbank for a traced (possibly freq-aug-masked) bank: the
    index plumbing is static, so it's a gather-free scatter-add done with
    precomputed assignment matrices."""
    c, k = bank.shape
    # precompute one-hot mapping: (3*M_MAX, 3*c) <- sum over k of outer
    # assignments; build as (k, 3*M_MAX) row-selector and (k, 3*c)
    # col-selector per phase, combined via einsum
    rows = np.zeros((3, k, 3 * M_MAX), np.float32)
    for p in range(3):
        for kk in range(k):
            q = (p + kk) % 3
            m = (p + kk) // 3
            rows[p, kk, q * M_MAX + m] = 1.0
    rows = jnp.asarray(rows)                      # (3, K, 3*M_MAX)
    # W[r, p*c+f] = sum_k rows[p, k, r] * bank[f, k]
    w = jnp.einsum("pkr,fk->rpf", rows, bank.astype(jnp.float32))
    return w.reshape(3 * M_MAX, 3 * c)
