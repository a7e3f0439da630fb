"""Thin-Cin convolution with an explicit im2col+dot weight grad.

NEGATIVE RESULT — NOT wired into the compute path (round 4).  The round-4
prefix decomposition (scripts/bench_bwd_prefix.py) showed freezing the stem
removes ~40 ms from the stage-1 backward, and the hypothesis was that
XLA's conv-wgrad lowering of the thin-Cin 7x7 stem was pathological.
Isolated measurement (scripts/bench_stem_wgrad.py, v5e) falsified it:

    XLA conv-wgrad, unpacked (7,7,3,64)/(2,2):   4.8 ms  — fine
    XLA conv-wgrad, packed  (7,9,3,128)/(2,4):   4.1 ms  — fine
    this im2col+dot rewrite:                    44-63 ms — far worse
    (and lax.conv_general_dilated_patches is itself a thin-Cin identity
    conv: 53 ms — it inherits the pathology it was meant to avoid)

The code stays as the documented falsification plus a mesh-invariant-wgrad
construction (per-sample batched dot + pinned tree fold, the same
determinism pattern as `_det_batch_moments` in nn/blocks.py) that a future
backend may want; `thin_conv_applicable` currently matches only shapes
where it was measured SLOWER, so nothing calls it in production.
Reference analog: none (cuDNN picks wgrad algorithms internally;
models/common.py:593-624 Snn_Conv2d).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def thin_conv_applicable(cin: int, k: Tuple[int, int], groups: int = 1,
                         dilation: Tuple[int, int] = (1, 1)) -> bool:
    """Shapes where the dot-wgrad beats XLA's conv-wgrad lowering.

    Measured crossover (v5e): the pathology is thin-Cin-large-kernel (the
    7x7 Cin=3 stem: 38 -> ~3 ms).  The patch blow-up makes the rewrite a
    LOSS for wide Cin, so gate tightly.
    """
    kh, kw = k
    return (
        groups == 1
        and tuple(dilation) == (1, 1)
        and kh >= 5
        and cin * kh * kw <= 256
    )


def _tree_fold_sum(x: jax.Array) -> jax.Array:
    """Fixed-order pairwise tree reduction over axis 0 (mesh-invariant —
    same helper as nn/blocks.py; duplicated to avoid an import cycle)."""
    while x.shape[0] > 1:
        n = x.shape[0]
        half = n // 2
        y = x[: 2 * half : 2] + x[1 : 2 * half : 2]
        if n % 2:
            y = jnp.concatenate([y, x[n - 1 :]], axis=0)
        x = y
    return x[0]


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv_thin(x: jax.Array, kernel: jax.Array,
              strides: Tuple[int, int],
              padding: Tuple[Tuple[int, int], Tuple[int, int]]) -> jax.Array:
    """`lax.conv_general_dilated` (NHWC/HWIO, g=1, d=1) with the dot wgrad."""
    return lax.conv_general_dilated(
        x, kernel, strides, padding, dimension_numbers=_DN)


def _fwd(x, kernel, strides, padding):
    return conv_thin(x, kernel, strides, padding), (x, kernel)


def _bwd(strides, padding, res, g):
    x, kernel = res
    kh, kw, cin, cout = kernel.shape

    # dgrad: XLA's own transpose lowering is fine (and DCE'd when the
    # input needs no grad, e.g. the image at the true stem)
    _, dx_vjp = jax.vjp(
        lambda xx: lax.conv_general_dilated(
            xx, kernel, strides, padding, dimension_numbers=_DN),
        x,
    )
    (dx,) = dx_vjp(g)

    # wgrad: im2col + per-sample batched dot + pinned fold.
    # NOTE the im2col is spelled as kh*kw strided SLICES, not
    # lax.conv_general_dilated_patches: patches lowers as a conv with an
    # identity kernel over the SAME thin Cin — it inherits the exact
    # pathology this vjp exists to avoid (measured 53 ms where slices+dot
    # hit the traffic bound; scripts/bench_stem_wgrad.py).
    b = x.shape[0]
    (sh, sw) = strides
    xp = jnp.pad(x, ((0, 0), padding[0], padding[1], (0, 0)))
    oh = (x.shape[1] + sum(padding[0]) - kh) // sh + 1
    ow = (x.shape[2] + sum(padding[1]) - kw) // sw + 1
    cols = jnp.concatenate(
        [
            xp[:, dy : dy + (oh - 1) * sh + 1 : sh,
               dx : dx + (ow - 1) * sw + 1 : sw, :]
            for dy in range(kh)
            for dx in range(kw)
        ],
        axis=-1,
    )  # [B, OH, OW, Kh*Kw*Cin], feature order (dy, dx, ci)
    per = lax.dot_general(
        cols.reshape(b, -1, kh * kw * cin),
        g.reshape(b, -1, cout),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [B, Kh*Kw*Cin, Cout]
    dk = _tree_fold_sum(per).reshape(kh, kw, cin, cout)
    return dx, dk.astype(kernel.dtype)


conv_thin.defvjp(_fwd, _bwd)
