"""First-match 2x2 max-pool with a recompute backward.

The EMS shortcut pool (``max_pool_t`` / ``max_pool_t_packed``) is a 2x2/s2
window.  XLA's reduce_window-max backward materializes a pad+maximum chain
at FULL input size (the round-4 HLO audit measured ~5.9 GB for the single
320px site), and the packed variant's channel-half ``jnp.maximum`` splits
tie gradients 0.5/0.5 — a deviation from torch's MaxPool2d, which routes
the gradient to the FIRST maximal element in row-major window order
(ties are common here: Concat_res2 pools binary spike tensors).

This module spells the pool as a `jax.custom_vjp`:
  forward   three fused ``maximum``s over reshape-paired slices (no
            strided slices — layout-friendly);
  residual  the input x (original dtype) + nothing else;
  backward  recompute the window candidates elementwise and route dy by
            explicit first-match masks — exact torch/reduce_window
            semantics in BOTH window dimensions, all elementwise + reshape
            (no pads, no select-and-scatter).

Reference: the MaxPool3d((1,2,2)) shortcut downsampler,
models/common.py:1068,1211,1486.  Parity: tests/test_pool_vjp.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _split2(x: jax.Array, axis: int):
    """Pair (x[2i], x[2i+1]) along ``axis`` via reshape — returns two
    arrays with that axis halved."""
    sh = x.shape
    n = sh[axis]
    assert n % 2 == 0, (axis, sh)
    r = x.reshape(sh[:axis] + (n // 2, 2) + sh[axis + 1 :])
    idx0 = (slice(None),) * (axis + 1) + (0,)
    idx1 = (slice(None),) * (axis + 1) + (1,)
    return r[idx0], r[idx1]


def _interleave2(a: jax.Array, b: jax.Array, axis: int) -> jax.Array:
    """Inverse of `_split2`: stack pairs back to the doubled axis."""
    r = jnp.stack([a, b], axis=axis + 1)
    sh = a.shape
    return r.reshape(sh[:axis] + (2 * sh[axis],) + sh[axis + 1 :])


def _candidates_hw(x: jax.Array):
    """Row-major 2x2 window candidates of [B, H, W, C]."""
    top, bot = _split2(x, 1)          # rows 2i / 2i+1
    c00, c01 = _split2(top, 2)        # cols 2j / 2j+1
    c10, c11 = _split2(bot, 2)
    return c00, c01, c10, c11


def _candidates_packed(x: jax.Array):
    """Row-major 2x2 window candidates of the width-packed [B, H, Wp, 2C]:
    the two phase blocks of the channel axis are the original columns
    (2j, 2j+1)."""
    c = x.shape[-1] // 2
    top, bot = _split2(x, 1)
    return top[..., :c], top[..., c:], bot[..., :c], bot[..., c:]


def _pool_fwd_math(cands):
    c00, c01, c10, c11 = cands
    return jnp.maximum(jnp.maximum(c00, c01), jnp.maximum(c10, c11))


def _route_first_match(cands, out, dy):
    """dy routed to the first (row-major) candidate equal to the max."""
    c00, c01, c10, c11 = cands
    w00 = c00 == out
    w01 = (c01 == out) & ~w00
    w10 = (c10 == out) & ~w00 & ~w01
    w11 = ~w00 & ~w01 & ~w10  # the max is SOME candidate
    zero = jnp.zeros_like(dy)
    return (
        jnp.where(w00, dy, zero),
        jnp.where(w01, dy, zero),
        jnp.where(w10, dy, zero),
        jnp.where(w11, dy, zero),
    )


@jax.custom_vjp
def max_pool22_first(x: jax.Array) -> jax.Array:
    """2x2/s2 max-pool of [B, H, W, C] with torch MaxPool2d gradient
    semantics (first-match tie routing)."""
    return _pool_fwd_math(_candidates_hw(x))


def _mp_fwd(x):
    return max_pool22_first(x), x


def _mp_bwd(x, dy):
    cands = _candidates_hw(x)
    out = _pool_fwd_math(cands)
    d00, d01, d10, d11 = _route_first_match(cands, out, dy)
    top = _interleave2(d00, d01, 2)
    bot = _interleave2(d10, d11, 2)
    return (_interleave2(top, bot, 1),)


max_pool22_first.defvjp(_mp_fwd, _mp_bwd)


@jax.custom_vjp
def max_pool22_first_packed(x: jax.Array) -> jax.Array:
    """2x2/s2 max-pool of the width-packed [B, H, Wp, 2C], returning the
    UNPACKED pooled [B, H//2, Wp, C] — same contract as
    ``max_pool_t_packed`` (s == f == 2), but with exact first-match tie
    routing in BOTH window dimensions (the old channel-half ``maximum``
    split width ties 0.5/0.5)."""
    return _pool_fwd_math(_candidates_packed(x))


def _mpp_fwd(x):
    return max_pool22_first_packed(x), x


def _mpp_bwd(x, dy):
    cands = _candidates_packed(x)
    out = _pool_fwd_math(cands)
    d00, d01, d10, d11 = _route_first_match(cands, out, dy)
    top = jnp.concatenate([d00, d01], axis=-1)  # phase blocks back
    bot = jnp.concatenate([d10, d11], axis=-1)
    return (_interleave2(top, bot, 1),)


max_pool22_first_packed.defvjp(_mpp_fwd, _mpp_bwd)
