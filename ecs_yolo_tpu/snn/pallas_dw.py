"""Pallas int8-input depthwise-3x3 conv for the ECS spread (round 5).

The unpacked ECS sites (C >= 128 stages) run the reference's dw3x3+pw1x1
spread (models/common.py:285-303) with the dw conv quantified ~3.7x off its
HBM traffic bound under XLA's grouped-conv lowering (docs/DESIGN.md).  This
kernel reads the binary spike plane as int8 (1 B/elem), converts in-register,
does the 9-tap depthwise MAC on the VPU, and writes bf16 — the traffic the
op actually needs.

Forward-only custom_vjp: the backward runs the exact XLA conv dgrad/wgrad
pair over the int8-saved input (same residual set as
``nn/spike_conv.binary_input_conv``), so training reduction semantics are
unchanged and the 1-vs-N mesh guarantee holds.

Wired behind ``SNNConfig.pallas_dw_spread`` — default follows the measured
full-step A/B (scripts/bench_pallas_dw.py for the isolated kernel,
scripts/bench_train_step.py BENCH_PALLASDW=1 for end-to-end).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw3_kernel(s_ref, k_ref, b_ref, o_ref, *, H, W, C):
    s = s_ref[0].astype(jnp.float32)          # [H,W,C] int8 -> f32 in-reg
    k = k_ref[...].astype(jnp.float32)        # [3,3,C]
    b = b_ref[...].astype(jnp.float32)        # [C]
    zrow = jnp.zeros((1, W, C), jnp.float32)
    zcol = jnp.zeros((H + 2, 1, C), jnp.float32)
    xp = jnp.concatenate([zrow, s, zrow], axis=0)
    xp = jnp.concatenate([zcol, xp, zcol], axis=1)
    acc = jnp.zeros((H, W, C), jnp.float32) + b
    for dy in range(3):
        for dx in range(3):
            acc = acc + xp[dy:dy + H, dx:dx + W, :] * k[dy, dx]
    o_ref[0] = acc.astype(o_ref.dtype)


def _pallas_dw3_int8(s8: jax.Array, k33c: jax.Array, bias: jax.Array,
                     out_dtype) -> jax.Array:
    N, H, W, C = s8.shape
    return pl.pallas_call(
        functools.partial(_dw3_kernel, H=H, W=W, C=C),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda n: (n, 0, 0, 0)),
            pl.BlockSpec((3, 3, C), lambda n: (0, 0, 0)),
            pl.BlockSpec((C,), lambda n: (0,)),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda n: (n, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W, C), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20
        ),
    )(s8, k33c, bias)


@jax.custom_vjp
def binary_dw3_conv(s: jax.Array, k: jax.Array, b: jax.Array) -> jax.Array:
    """Depthwise 3x3 'same' conv over a BINARY [N,H,W,C] input.

    ``k`` is the canonical [3,3,1,C] depthwise kernel, ``b`` the [C] bias.
    Forward = Pallas int8-read kernel; backward = exact XLA dgrad/wgrad
    from the int8-saved input.
    """
    s8 = s.astype(jnp.int8)  # exact: s in {0,1}
    return _pallas_dw3_int8(s8, k.reshape(3, 3, -1), b, s.dtype)


def _bdw_fwd(s, k, b):
    s8 = s.astype(jnp.int8)
    y = _pallas_dw3_int8(s8, k.reshape(3, 3, -1), b, s.dtype)
    return y, (s8, k)


def _xla_dw(s, k, C):
    return lax.conv_general_dilated(
        s, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )


def _bdw_bwd(res, dy):
    s8, k = res
    C = s8.shape[-1]
    sb = s8.astype(dy.dtype)
    _, vjp = jax.vjp(lambda s_, k_: _xla_dw(s_, k_, C), sb, k)
    ds, dk = vjp(dy)
    db = jnp.sum(dy.astype(jnp.float32), axis=(0, 1, 2)).astype(dy.dtype)
    return ds, dk, db


binary_dw3_conv.defvjp(_bdw_fwd, _bdw_bwd)
