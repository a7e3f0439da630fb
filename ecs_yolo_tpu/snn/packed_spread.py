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


def packed_spread_fn(kernel: jax.Array, bias: jax.Array):
    """Spread closure over the packed layout (input [N, H, W//f, f*C])."""

    def spread(s: jax.Array) -> jax.Array:
        return lax.conv_general_dilated(
            s, kernel.astype(s.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(s.dtype)

    return spread
