"""Heaviside spike function with rectangular surrogate gradient.

TPU-native equivalent of the reference's ``ActFun`` autograd Function
(reference: models/common.py:56-82): forward is ``(u > thresh)``, backward is
``grad * 1[|u - thresh| < lens] / (2 * lens)``.  Implemented with
``jax.custom_vjp`` so it composes with jit/vmap/scan and pjit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def heaviside(u: jax.Array, thresh: float = 0.5, lens: float = 0.5) -> jax.Array:
    """Spike = 1 where membrane potential exceeds `thresh`, else 0."""
    return (u > thresh).astype(u.dtype)


def _heaviside_fwd(u, thresh, lens):
    # Residual compaction (round 4): the backward needs only the 0/1
    # rectangular window, not the membrane itself — saving it as int8
    # halves the residual HBM traffic at every neuron site AND releases
    # the membrane tensor entirely (nothing else in the backward consumes
    # it: the reset gate is stop-gradient'd and the ECS recurrence reads
    # spikes, not membranes).  Exact: the window is computed from u in the
    # forward, bit-identical to computing it in the backward.
    window = (jnp.abs(u - thresh) < lens).astype(jnp.int8)
    return heaviside(u, thresh, lens), window


def _heaviside_bwd(thresh, lens, window, g):
    return (g * window.astype(g.dtype) / (2.0 * lens),)


heaviside.defvjp(_heaviside_fwd, _heaviside_bwd)


def spike_fn(u: jax.Array, thresh: float, lens: float, act: bool) -> jax.Array:
    """The activation used inside the membrane scan.

    ``act=False`` -> Heaviside with surrogate grad (spiking path);
    ``act=True``  -> SiLU (the reference's ``mem_update(act=True)`` mode,
    models/common.py:272-276).
    """
    if act:
        return jax.nn.silu(u)
    return heaviside(u, thresh, lens)
