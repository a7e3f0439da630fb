"""Closed-form BatchNorm training backward with bf16 residuals.

XLA's AD through `_DetBN`/`_PackedBN` promotes to fp32 at the BN entry (the
statistics must be fp32 — torch AMP does the same, reference train.py:553)
and is then free to materialize fp32 intermediates of the full activation
size in BOTH directions; the round-4 prefix probes measured the stem BN's
backward alone at ~14 ms where its traffic bound is ~2 ms.  This module
spells the textbook BN gradient as a `jax.custom_vjp` so the residual set
is pinned to the ORIGINAL (bf16) activation plus [C]-sized statistics, and
every batch reduction keeps the mesh-invariant per-sample-partial-sum +
pairwise-tree shape of `_det_batch_moments` (the round-4 1-vs-N parity
guarantee).

Forward (given batch moments m, v over each canonical channel):
    xhat = (x - m) * rsqrt(v + eps)
    out  = xhat * scale + bias
Backward (the closed form; N = elements per canonical channel):
    dbias  = sum(dy)
    dscale = sum(dy * xhat)
    dx     = scale * rsqrt(v + eps) * (dy - dbias/N - xhat * dscale/N)

``f`` is the width-pack phase factor (snn/packed_spread.py): the input's
last axis is [f*C] phase blocks that hold disjoint strips of the same C
canonical channels, so moments and parameter grads fold the f blocks after
the per-sample tree (exactly `_PackedBN`'s reduction geometry).

`bn_train_norm` returns (out, m, v) so the caller can feed the running-stat
EMA; m/v carry no gradient (mutable state), and their incoming cotangents
are symbolic zeros which the backward ignores.

Wired into `_DetBN`/`_PackedBN` behind ``SNNConfig.bn_custom_vjp``; parity
vs the AD path is asserted in tests/test_bn_vjp.py.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _tree_fold_sum(x: jax.Array) -> jax.Array:
    """Fixed-order pairwise tree reduction over axis 0 (see nn/blocks.py —
    reshape-paired, identical (2i, 2i+1) order, no strided slices)."""
    while x.shape[0] > 1:
        n = x.shape[0]
        half = n // 2
        tail = x[2 * half :]
        r = x[: 2 * half].reshape(half, 2, *x.shape[1:])
        y = r[:, 0] + r[:, 1]
        if n % 2:
            y = jnp.concatenate([y, tail], axis=0)
        x = y
    return x[0]


def _channel_fold(x: jax.Array, f: int) -> jax.Array:
    """Mesh-invariant sum over all but the channel axis, folding the f
    width-pack phase blocks of the last axis onto the canonical channels:
    per-sample partial sums (sample-local) -> fixed pairwise tree over the
    batch -> fixed-order sum over phases.  Returns [C]."""
    spatial = tuple(range(1, x.ndim - 1))
    ps = _tree_fold_sum(jnp.sum(x, axis=spatial))  # [f*C]
    if f == 1:
        return ps
    return ps.reshape(f, ps.shape[0] // f).sum(0)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_train_norm(
    y: jax.Array, scale: jax.Array, bias: jax.Array, eps: float, f: int = 1
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Training-mode BN normalize returning (out, batch_mean, batch_var).

    ``y`` is the raw (possibly bf16) activation [B, ..., f*C]; ``scale``/
    ``bias`` are the canonical [C] parameters.  Statistics and normalization
    run in fp32 (promoted, not pinned, so f64 parity tests stay f64); the
    caller casts ``out`` back to the compute dtype as before.  Moments are
    `_det_batch_moments`/`_PackedBN`-identical.
    """
    dt = jnp.promote_types(y.dtype, jnp.float32)
    yf = y.astype(dt)
    cnt = yf.size // (yf.shape[-1] // f)
    m = _channel_fold(yf, f) / cnt
    m2 = _channel_fold(jnp.square(yf), f) / cnt
    v = m2 - jnp.square(m)
    mul = jax.lax.rsqrt(v + eps) * scale.astype(dt)
    mt = jnp.tile(m, f) if f > 1 else m
    mult = jnp.tile(mul, f) if f > 1 else mul
    bt = jnp.tile(bias.astype(dt), f) if f > 1 else bias.astype(dt)
    out = (yf - mt) * mult + bt
    return out, m, v


def _bn_fwd(y, scale, bias, eps, f):
    out, m, v = bn_train_norm(y, scale, bias, eps, f)
    # residuals: the ORIGINAL-dtype activation + [C] stats — never a
    # full-size fp32 tensor
    return (out, m, v), (y, scale, m, v)


def _bn_bwd(eps, f, res, cts):
    y, scale, m, v = res
    dout, _dm, _dv = cts  # m/v feed mutable running stats only: zero ct
    dt = jnp.promote_types(y.dtype, jnp.float32)
    yf = y.astype(dt)
    dof = dout.astype(dt)
    rstd = jax.lax.rsqrt(v + eps)  # [C] fp32
    mt = jnp.tile(m, f) if f > 1 else m
    rt = jnp.tile(rstd, f) if f > 1 else rstd
    xhat = (yf - mt) * rt
    cnt = yf.size // (yf.shape[-1] // f)
    dbias = _channel_fold(dof, f)
    dscale = _channel_fold(dof * xhat, f)
    st = jnp.tile(scale.astype(dt) * rstd, f) if f > 1 else scale.astype(dt) * rstd
    dbt = jnp.tile(dbias, f) if f > 1 else dbias
    dst = jnp.tile(dscale, f) if f > 1 else dscale
    dx = st * (dof - dbt / cnt - xhat * (dst / cnt))
    return (
        dx.astype(y.dtype),
        dscale.astype(scale.dtype),
        dbias.astype(scale.dtype),
    )


bn_train_norm.defvjp(_bn_fwd, _bn_bwd)
