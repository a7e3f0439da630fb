"""Model EMA (reference utils/torch_utils.py:286 ``ModelEMA``).

decay(t) = d * (1 - exp(-t / tau)) with d=0.9999, tau=2000 — the same ramp
the reference uses so early updates average aggressively.  Pure pytree op,
jit/pjit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_decay(updates, decay: float = 0.9999, tau: float = 2000.0):
    u = jnp.asarray(updates, jnp.float32)
    return decay * (1.0 - jnp.exp(-u / tau))


def ema_update(ema_params, params, updates, decay: float = 0.9999, tau: float = 2000.0):
    d = ema_decay(updates, decay, tau)
    return jax.tree_util.tree_map(
        lambda e, p: e * d + (1.0 - d) * p.astype(e.dtype), ema_params, params
    )
