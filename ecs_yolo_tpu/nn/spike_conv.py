"""int8 spike transport through spike-fed convolutions.

Spike tensors are binary {0,1} but move as bf16 — twice the HBM traffic
the information needs.  JAX cannot carry gradients through an int8 edge
(float0 tangents), so the int8 round-trip lives INSIDE a custom_vjp whose
visible edges stay bf16:

  forward   s8 = s.astype(int8)  (exact for binary s)
            y  = conv(s8.astype(s.dtype), k)   — XLA fuses the convert
            into the conv's input read (measured +23% on the isolated
            [64,320,320,64] conv, scripts/bench_int8_spike_conv.py)
  residual  (s8, k) — the wgrad reads HALF the bytes
  backward  exact conv dgrad/wgrad via jax.vjp over the same primitive
            (the unused re-forward is DCE'd; reduction semantics identical
            to plain AD, so the 1-vs-N mesh guarantee is untouched)

ONLY correct for binary inputs: the call sites gate on "this tensor is a
Heaviside output" (MemUpdate act=False).  Wired behind
``SNNConfig.int8_spike_transport``; parity in tests/test_spike_conv.py.

Reference analog: none — the reference moves spikes as fp16/fp32 cuDNN
inputs (models/common.py:621-624); this is a TPU-side traffic optimization
with bit-identical forward values.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _conv(s, k, strides, padding, dn, fgc):
    return lax.conv_general_dilated(
        s, k, strides, padding,
        dimension_numbers=dn, feature_group_count=fgc,
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def binary_input_conv(
    s: jax.Array,
    k: jax.Array,
    strides: Tuple[int, int],
    padding: Tuple[Tuple[int, int], Tuple[int, int]],
    dn: Tuple[str, str, str] = ("NHWC", "HWIO", "NHWC"),
    fgc: int = 1,
) -> jax.Array:
    """conv_general_dilated over a BINARY input, transported as int8."""
    s8 = s.astype(jnp.int8)  # exact: s in {0, 1}
    return _conv(s8.astype(s.dtype), k, strides, padding, dn, fgc)


def _bic_fwd(s, k, strides, padding, dn, fgc):
    s8 = s.astype(jnp.int8)
    y = _conv(s8.astype(s.dtype), k, strides, padding, dn, fgc)
    return y, (s8, k)


def _bic_bwd(strides, padding, dn, fgc, res, dy):
    s8, k = res
    sb = s8.astype(dy.dtype)
    # jax.vjp over the SAME primitive gives the exact dgrad/wgrad pair;
    # the primal re-forward inside is unused and DCE'd by XLA
    _, vjp = jax.vjp(
        lambda s_, k_: _conv(s_, k_, strides, padding, dn, fgc), sb, k
    )
    ds, dk = vjp(dy)
    return ds, dk


binary_input_conv.defvjp(_bic_fwd, _bic_bwd)
