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


def _interpret() -> bool:
    """Mosaic only exists on TPU; CPU (tests, graded dryrun) interprets."""
    return jax.default_backend() != "tpu"


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
        interpret=_interpret(),
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


# ---------------------------------------------------------------------------
# Phase-aware packed spread (round 5): the C<=64 stage's dw3x3+pw1x1 in the
# width-packed layout WITHOUT the composite's 9x FLOP blow-up.
# ---------------------------------------------------------------------------
#
# Round-3's packed composite folds dw+pw into ONE dense [3,3,fC,fC] conv —
# measured 1.404 ms at the act1 site (b16), which is 87% MFU of that
# formulation's 241 GFLOP... but the formulation itself is 2x redundant:
# the composite kernel is half structural zeros (width phases only couple
# through specific taps).  This kernel computes the TRUE math as an
# im2col matmul per phase: patches [pos, 9C] @ M [9C, C], where
# M[(dy,dx,ci), co] = dw[dy,dx,ci] * pw[ci,co] is built OUTSIDE the kernel
# (tiny, traced, differentiable -> exact wgrads to the canonical dw/pw).
# 120 GFLOP instead of 241 -> ~0.61 ms MXU bound at act1.  Input reads are
# int8 (binary spikes).  f=2 only (the production pack factor).


def _packed_spread_kernel(up_ref, mid_ref, dn_ref, m_ref, c_ref, o_ref, *,
                          BH, Wp, C, nH):
    cd = m_ref.dtype                             # compute dtype = caller's
    h = pl.program_id(1)
    izero = jnp.zeros((1, Wp, 2 * C), jnp.int8)
    top = jnp.where(h == 0, izero, up_ref[0])
    bot = jnp.where(h == nH - 1, izero, dn_ref[0])
    s = jnp.concatenate([top, mid_ref[0], bot], axis=0).astype(cd)
    # phase split WITHOUT lane-offset slices: Mosaic cannot concat values
    # whose lane offsets differ on a non-concat dim, and s[..., C:] lives
    # at lane offset C.  A lane roll re-homes the odd phase to offset 0.
    se = s[..., :C]                              # even width phase
    # Mosaic's rotate only handles 32-bit data — roll the f32 view
    so = pltpu.roll(
        s.astype(jnp.float32), shift=C, axis=2
    )[..., :C].astype(cd)                        # odd width phase
    zc = jnp.zeros((BH + 2, 1, C), cd)
    so_m1 = jnp.concatenate([zc, so[:, :-1, :]], axis=1)   # s_odd[X-1]
    se_p1 = jnp.concatenate([se[:, 1:, :], zc], axis=1)    # s_even[X+1]

    m = m_ref[...]                               # [9C, C]
    const = c_ref[...].astype(jnp.float32)       # [C] = dwb@pw + pwb

    outs = []
    # true-width taps per output phase: even x=2X -> (x-1,x,x+1) =
    # odd[X-1], even[X], odd[X]; odd x=2X+1 -> even[X], odd[X], even[X+1]
    for bufs in ((so_m1, se, so), (se, so, se_p1)):
        parts = []
        for dy in range(3):
            for buf in bufs:
                parts.append(buf[dy:dy + BH])
        patches = jnp.concatenate(parts, axis=-1).reshape(BH * Wp, 9 * C)
        y = jnp.dot(patches, m, preferred_element_type=jnp.float32) + const
        outs.append(y.reshape(BH, Wp, C))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _pallas_packed_spread(s8, m9c, const, out_dtype, bh):
    N, H, Wp, C2 = s8.shape
    C = C2 // 2
    assert H % bh == 0, (H, bh)
    nH = H // bh
    return pl.pallas_call(
        functools.partial(
            _packed_spread_kernel, BH=bh, Wp=Wp, C=C, nH=nH
        ),
        grid=(N, nH),
        in_specs=[
            # 1-row halo blocks: different block shapes over the SAME
            # array keep the read amplification at (BH+2)/BH (the 1-row
            # specs index in 1-row units)
            pl.BlockSpec((1, 1, Wp, C2),
                         lambda n, h: (n, jnp.maximum(h * bh - 1, 0), 0, 0)),
            pl.BlockSpec((1, bh, Wp, C2), lambda n, h: (n, h, 0, 0)),
            pl.BlockSpec((1, 1, Wp, C2),
                         lambda n, h: (n, jnp.minimum((h + 1) * bh, H - 1),
                                       0, 0)),
            pl.BlockSpec((9 * C, C), lambda n, h: (0, 0)),
            pl.BlockSpec((C,), lambda n, h: (0,)),
        ],
        out_specs=pl.BlockSpec((1, bh, Wp, C2), lambda n, h: (n, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, Wp, C2), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20
        ),
        interpret=_interpret(),
    )(s8, s8, s8, m9c, const)


def _compose_m(dw, dwb, pw, pwb):
    """[9C, C] matmul weights + [C] bias from the canonical dw/pw params.

    Tiny traced ops — gradients to dw/pw flow through this composition,
    so wgrad exactness never depends on the kernel."""
    c = dw.shape[-1]
    d9 = dw[:, :, 0, :].reshape(9, c)            # [9, C] taps
    p = pw[0, 0]                                  # [C, C]
    m = (d9[:, :, None] * p[None]).reshape(9 * c, c)
    const = dwb @ p + pwb
    return m, const


def _spread_block_h(h: int) -> int:
    """Largest row-block size that divides H (prefer 16/32)."""
    for bh in (32, 16, 8, 4, 2, 1):
        if h % bh == 0:
            return bh
    return 1


@jax.custom_vjp
def packed_spread_pallas(s, dw, dwb, pw, pwb):
    """Phase-aware packed ECS spread over a BINARY packed input.

    s [N,H,Wp,2C] (binary, f=2 packed layout), dw [3,3,1,C], dwb [C],
    pw [1,1,C,C], pwb [C].  Same math as the packed composite conv
    (packed_spread.build_packed_spread) at half the FLOPs; int8 input
    reads.  Backward = XLA's exact vjp of the composite formulation.
    """
    m, const = _compose_m(dw, dwb, pw, pwb)
    s8 = s.astype(jnp.int8)
    return _pallas_packed_spread(
        s8, m.astype(s.dtype), const.astype(jnp.float32), s.dtype,
        _spread_block_h(s.shape[1]),
    )


def _pps_fwd(s, dw, dwb, pw, pwb):
    y = packed_spread_pallas(s, dw, dwb, pw, pwb)
    return y, (s.astype(jnp.int8), dw, dwb, pw, pwb)


def _pps_bwd(res, dy):
    from .packed_spread import build_packed_spread

    s8, dw, dwb, pw, pwb = res

    def composite(s_, dw_, dwb_, pw_, pwb_):
        kp, bp = build_packed_spread(dw_, dwb_, pw_, pwb_, 2)
        y = lax.conv_general_dilated(
            s_, kp.astype(s_.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bp.astype(s_.dtype)

    _, vjp = jax.vjp(
        composite, s8.astype(dy.dtype), dw, dwb, pw, pwb
    )
    return vjp(dy)


packed_spread_pallas.defvjp(_pps_fwd, _pps_bwd)
