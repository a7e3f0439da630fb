"""Width-packed ECS spread convolution.

The ECS spread (reference ``InitEcsSpread``, models/common.py:285-303) is a
depthwise 3x3 + pointwise 1x1 applied to the spike map inside every scan
step.  On v5e, XLA expands the grouped depthwise conv to a dense one, and at
C <= 64 the MXU runs half-empty (128 lanes): measured 3.7x off the conv's
traffic bound at the stem (docs/DESIGN.md round-2 table).

Fix: pack f = 128//C width-phases into channels with a FREE row-major
reshape — ``x[..., W, C] -> x[..., W//f, f*C]`` maps w = f*w2 + q to channel
block q — and run the whole recurrence in packed layout (every elementwise
op is layout-invariant).  The dw+pw pair becomes ONE dense
[3, 3, f*C, f*C] conv at W/f spatial width:

  out[n, h, w2, q*C+co] = sum_{ci,dy,dx} x[n, h+dy, f*w2+q+dx, ci]
                              * dw[dy,dx,ci] * pw[ci,co]  + b[co]

where the original-width tap (q, dx) lands on packed column shift
(q+dx)//f in {-1,0,1} and input phase (q+dx) mod f.  Exact same math
(scripts/bench_spread_packed.py `cpu` asserts bit-parity in fp32), full
lane utilization, and the pointwise pass folded in for free.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def pack_factor(c: int, w: int) -> int:
    """Largest lane-filling width-pack factor: f*C <= 128 and f | W."""
    f = max(1, 128 // c)
    while w % f:
        f -= 1
    return f


def build_packed_spread(
    dw_kernel: jax.Array,  # [3, 3, 1, C]
    dw_bias: jax.Array,    # [C]
    pw_kernel: jax.Array,  # [1, 1, C, C]
    pw_bias: jax.Array,    # [C]
    f: int,
) -> Tuple[jax.Array, jax.Array]:
    """Compose dw+pw into the packed dense kernel [3, 3, f*C, f*C] + bias.

    Traced (differentiable) — gradients flow back to the dw/pw parameters.
    The scatter is kernel-sized (trivial next to the conv itself).
    """
    c = dw_kernel.shape[-1]
    dw = dw_kernel[:, :, 0, :]                     # [3, 3, C]
    pw = pw_kernel[0, 0]                           # [C(ci), C(co)]
    full = dw[:, :, :, None] * pw[None, None]      # [3, 3, ci, co]
    bias = dw_bias @ pw + pw_bias                  # [C]

    K = jnp.zeros((3, 3, f * c, f * c), full.dtype)
    for q in range(f):            # output phase
        for dx in (-1, 0, 1):     # original-width tap
            qp = (q + dx) % f
            shift = -1 if (q + dx) < 0 else (q + dx) // f
            K = K.at[
                :, shift + 1, qp * c:(qp + 1) * c, q * c:(q + 1) * c
            ].add(full[:, dx + 1])
    return K, jnp.tile(bias, f)


def pack_w(x: jax.Array, f: int) -> jax.Array:
    """[..., W, C] -> [..., W//f, f*C]: a pure reshape, no data movement."""
    *lead, w, c = x.shape
    return x.reshape(*lead, w // f, f * c)


def unpack_w(x: jax.Array, f: int) -> jax.Array:
    *lead, w2, fc = x.shape
    return x.reshape(*lead, w2 * f, fc // f)


def packed_spread_fn(kernel: jax.Array, bias: jax.Array,
                     int8_spikes: bool = False):
    """Spread closure over the packed layout (input [N, H, W//f, f*C]).

    ``int8_spikes``: the input is a binary Heaviside output — transport it
    as int8 through the conv (nn/spike_conv.py; exact, halves the input
    read and the wgrad residual)."""
    kh, kw = kernel.shape[:2]
    # stride-1 "SAME" as explicit (lo, hi) — correct for even kernels too
    same = tuple(((k - 1) // 2, k - 1 - (k - 1) // 2) for k in (kh, kw))

    def spread(s: jax.Array) -> jax.Array:
        if int8_spikes:
            from ..nn.spike_conv import binary_input_conv

            return binary_input_conv(
                s, kernel.astype(s.dtype), (1, 1), same,
            ) + bias.astype(s.dtype)
        return lax.conv_general_dilated(
            s, kernel.astype(s.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(s.dtype)

    return spread


# ---------------------------------------------------------------------------
# Segment-level packing: general conv-kernel packers (round-3, part 2).
#
# Per-site packing loses to the pack/unpack relayouts (docs/DESIGN.md
# round-3), so the production path keeps the ENTIRE C<=64 stage of a model
# packed: the stem conv EMITS packed layout directly, every conv/BN/neuron
# inside the stage operates packed, and the stage's stride-2 exit conv
# CONSUMES packed layout directly — zero relayouts except the cheap shortcut
# repack at strided blocks.  The packers below rewrite a canonical conv
# kernel for each of the three boundary cases; all are traced jnp ops, so
# gradients flow to the canonical parameters and checkpoints stay
# layout-agnostic.
#
# Index algebra (width axis only; heights are untouched): packed column w2,
# phase q holds original column w = f*w2 + q.  A stride-s conv's output
# (packed col w2, phase q) centers on original input col s*(f*w2+q), so its
# tap dx lands at t = s*q + dx within packed input col s*w2 + t//f, input
# phase t % f.
# ---------------------------------------------------------------------------


def pack_conv_kernel(full: jax.Array, f: int, s: int = 1):
    """Pack kernel [kh, kw, ci, co] (odd kw, torch-'same') for packed input
    AND packed output, stride ``s`` over original width.

    Returns (K [kh, kw', f*ci, f*co], w_stride, (pad_l, pad_r)) —
    w_stride = s over packed columns.
    """
    kh, kw, ci, co = full.shape
    r = kw // 2
    offs = sorted({(s * q + dx) // f for q in range(f) for dx in range(-r, r + 1)})
    o_min, o_max = offs[0], offs[-1]
    kwp = o_max - o_min + 1
    K = jnp.zeros((kh, kwp, f * ci, f * co), full.dtype)
    for q in range(f):
        for dx in range(-r, r + 1):
            t = s * q + dx
            col, ph = t // f - o_min, t % f
            K = K.at[:, col, ph * ci:(ph + 1) * ci, q * co:(q + 1) * co].add(
                full[:, dx + r]
            )
    pad_l = -o_min
    pad_r = max(0, kwp - s - pad_l)
    return K, s, (pad_l, pad_r)


def pack_exit_kernel(full: jax.Array, f: int):
    """Pack kernel [kh, kw, ci, co] for a stride-``f`` conv that consumes
    packed input and produces UNPACKED output — the packed stage's free
    exit (e.g. the 3x3/s2 64->128 conv ending the C=64 stage).

    Output col w' centers on original input col f*w'; tap dx lands in
    packed col w' + dx//f, phase dx % f.  Stride over packed cols = 1.
    Returns (K [kh, kw', f*ci, co], w_stride=1, (pad_l, pad_r)).
    """
    kh, kw, ci, co = full.shape
    r = kw // 2
    o_min, o_max = (-r) // f, r // f
    kwp = o_max - o_min + 1
    K = jnp.zeros((kh, kwp, f * ci, co), full.dtype)
    for dx in range(-r, r + 1):
        col, ph = dx // f - o_min, dx % f
        K = K.at[:, col, ph * ci:(ph + 1) * ci, :].add(full[:, dx + r])
    pad_l = -o_min
    pad_r = max(0, kwp - 1 - pad_l)
    return K, 1, (pad_l, pad_r)


def pack_stem_kernel(full: jax.Array, f: int, s: int):
    """Pack kernel [kh, kw, ci, co] for a stride-``s`` conv that consumes
    UNPACKED input and EMITS packed output — the stage entry (the stem),
    which makes the pack itself free.

    Output (packed col w2, phase q) centers on original input col
    s*(f*w2 + q): a width-(s*(f-1)+kw) kernel with stride s*f whose
    phase-q output-channel block holds the taps at offsets s*q + dx.
    Returns (K [kh, kw', ci, f*co], w_stride = s*f, (pad_l, pad_r)).
    """
    kh, kw, ci, co = full.shape
    r = kw // 2
    kwp = s * (f - 1) + kw
    K = jnp.zeros((kh, kwp, ci, f * co), full.dtype)
    for q in range(f):
        for dx in range(-r, r + 1):
            K = K.at[:, s * q + dx + r, :, q * co:(q + 1) * co].add(
                full[:, dx + r]
            )
    pad_l = r
    pad_r = max(0, kwp - s * f - pad_l)
    return K, s * f, (pad_l, pad_r)
