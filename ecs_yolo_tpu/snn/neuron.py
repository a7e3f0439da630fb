"""Membrane-potential recurrences as `lax.scan` step functions.

The reference iterates Python `for i in range(time_window)` loops around every
neuron (reference: models/common.py:252-283 ``mem_update``; :126-147
``LIFNode``).  On TPU the per-timestep convolutions are time-independent and
are folded into the batch outside these functions; only the recurrences below
are genuinely sequential, so they are the *only* `lax.scan` in the compute
path.

All functions take `x` shaped ``[T, N, ..., C]`` (channels-last) and return
the spike train with the same shape.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from functools import partial

from ..config import SNNConfig
from .surrogate import heaviside, spike_fn


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _reset_decay(mem_old, spike_prev, decay):
    """``mem_old * decay * (1 - stop_grad(spike_prev))`` with an int8
    residual.

    The reset gate multiplies the decayed membrane by ``(1 - spike_prev)``
    with the spike cotangent deliberately stopped (reference
    ``spike.detach()``, models/common.py:306-309).  The backward therefore
    needs ONLY the binary gate — but plain AD stashes it (or the spike) as
    a full-size bf16 residual at every neuron site and T-step.  Saving the
    gate as int8 is exact (it is {0,1} by construction at act=False sites)
    and halves that residual's HBM traffic — the same technique as
    ``nn/spike_conv.binary_input_conv`` (int8 spike transport), applied to
    the one remaining binary edge inside the scan itself.
    """
    return mem_old * (decay * (1.0 - spike_prev))


def _reset_decay_fwd(mem_old, spike_prev, decay):
    gate8 = (1.0 - spike_prev).astype(jnp.int8)  # exact: spike in {0,1}
    return mem_old * (decay * (1.0 - spike_prev)), gate8


def _reset_decay_bwd(decay, gate8, g):
    # d/d mem_old = decay * gate; d/d spike_prev = 0 (stop-gradient
    # semantics, matching the reference's detached reset gate)
    return g * (decay * gate8.astype(g.dtype)), jnp.zeros_like(g)


_reset_decay.defvjp(_reset_decay_fwd, _reset_decay_bwd)


def _gated_decay(mem_old, spike_prev, cfg: SNNConfig, act: bool):
    """Reset-gate term of the membrane update.  Binary-gate (act=False)
    sites route through the int8-residual custom_vjp when enabled; SiLU
    sites (continuous ``spike_prev``) keep the plain expression."""
    if cfg.int8_reset_gate and not act:
        return _reset_decay(mem_old, spike_prev, cfg.decay)
    return mem_old * cfg.decay * (1.0 - lax.stop_gradient(spike_prev))


def lif_scan(
    x: jax.Array,
    cfg: SNNConfig,
    act: bool = False,
) -> jax.Array:
    """Plain LIF recurrence (reference models/common2.py:75-106).

    mem_i = mem_{i-1} * decay * (1 - stop_grad(spike_{i-1})) + x_i
    spike_i = Heaviside(mem_i)  (or SiLU when act=True)

    The reset gate uses a stop-gradient on the previous spike, matching the
    reference's ``spike.detach()`` (models/common.py:306-309).
    """

    def step(carry, x_t):
        mem_old, spike_prev = carry
        mem = _gated_decay(mem_old, spike_prev, cfg, act) + x_t
        spike = spike_fn(mem, cfg.thresh, cfg.lens, act)
        return (mem, spike), spike

    zeros = jnp.zeros_like(x[0])
    # fully unroll: T<=8 steps become straight-line ops XLA can fuse across
    # (a rolled scan blocks fusion and costs ~2.5x wall-clock on TPU)
    (_, _), spikes = lax.scan(step, (zeros, zeros), x, unroll=True)
    return spikes


def ecs_lif_scan(
    x: jax.Array,
    spread: Callable[[jax.Array], jax.Array],
    cfg: SNNConfig,
    act: bool = False,
) -> jax.Array:
    """ECS-LIF recurrence — the reference's default activation
    (models/common.py:236-309 ``mem_update``).

    Per step i (fecs_0 = 0):
      mem_i   = mem_{i-1} * decay * (1 - stop_grad(spike_{i-1})) + x_i + fecs_{i-1}
      spike_i = Heaviside(mem_i)            (SiLU when act=True)
      ecs_i   = alpha * spread(spike_i) + (1 - 1/ecs_tau) * ecs_{i-1}
      fecs_i  = beta * tanh(ecs_i)

    `spread` is the lazily-built depthwise3x3+pointwise1x1 conv of the
    reference (``InitEcsSpread``, models/common.py:285-303), passed in here as
    a closure over its parameters so the scan stays purely functional.
    """

    leak = 1.0 - 1.0 / cfg.ecs_tau

    def step(carry, x_t):
        mem_old, spike_prev, ecs = carry
        fecs = cfg.beta * jnp.tanh(ecs)
        mem = _gated_decay(mem_old, spike_prev, cfg, act) + x_t + fecs
        spike = spike_fn(mem, cfg.thresh, cfg.lens, act)
        ecs = cfg.alpha * spread(spike) + leak * ecs
        return (mem, spike, ecs), spike

    zeros = jnp.zeros_like(x[0])
    (_, _, _), spikes = lax.scan(step, (zeros, zeros, zeros), x, unroll=True)
    return spikes


def mem_update(
    x: jax.Array,
    spread: Optional[Callable[[jax.Array], jax.Array]],
    cfg: SNNConfig,
    act: bool = False,
) -> jax.Array:
    """Dispatch between ECS-LIF (default, reference behavior) and plain LIF."""
    if cfg.ecs:
        assert spread is not None, "ECS mode requires spread conv parameters"
        return ecs_lif_scan(x, spread, cfg, act)
    return lif_scan(x, cfg, act)


def lif_node_scan(
    x: jax.Array,
    tau: float,
    v_th: float,
    cfg: SNNConfig,
) -> jax.Array:
    """`LIFNode` recurrence (reference models/common.py:126-147).

    u_i = tau * u_{i-1} * (1 - spike_{i-1}) + x_i
    spike_i = Heaviside(u_i - v_th)

    Unlike ``mem_update``, the reset gate here is NOT detached (the reference
    TorchScript ``state_update`` keeps the gradient).
    """

    def step(carry, x_t):
        u, spike_prev = carry
        u = tau * u * (1.0 - spike_prev) + x_t
        spike = heaviside(u - v_th, cfg.thresh, cfg.lens)
        return (u, spike), spike

    zeros = jnp.zeros_like(x[0])
    (_, _), spikes = lax.scan(step, (zeros, zeros), x, unroll=True)
    return spikes


def firing_rate(spikes: jax.Array) -> jax.Array:
    """Mean spike density — the quantity g1-resnet/calculate_fr.py:234-241
    computes per layer (``spikes.sum()/size``)."""
    return jnp.mean(spikes)
