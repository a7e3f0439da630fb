"""Optimizers and LR schedules.

Equivalent of the reference's optimizer setup (train.py:255-305,
utils/torch_utils2.py:314 ``smart_optimizer``): three param groups —
g0 BN/norm scales (no weight decay), g1 conv/dense kernels (weight decay),
g2 biases (no decay) — SGD+Nesterov / Adam / AdamW / Lion, linear or
one-cycle LR, and the 3-epoch warmup interpolation (train.py:524-540).

Built on optax; the warmup is folded into the per-step schedule instead of
mutating optimizer state in the loop.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def one_cycle(y1: float = 1.0, y2: float = 0.01, steps: int = 100):
    """Sinusoidal ramp y1->y2 (reference utils/general.py:476)."""
    return lambda x: ((1 - math.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1


def linear_lf(lrf: float, epochs: int):
    return lambda x: (1 - x / epochs) * (1.0 - lrf) + lrf


def make_lr_fn(
    lr0: float,
    lrf: float,
    epochs: int,
    steps_per_epoch: float,
    cos_lr: bool = True,
    warmup_epochs: float = 3.0,
    warmup_bias_lr: float = 0.1,
    is_bias: bool = False,
    min_warmup_steps: float = 1000.0,
):
    """Per-step LR: warmup interpolation then epoch-wise lf decay
    (reference train.py:524-540).

    ``steps_per_epoch`` counts the steps this schedule is actually evaluated
    at.  Under gradient accumulation (optax.MultiSteps) the inner schedule
    only advances once per apply, so the caller must pass
    micro_steps_per_epoch / accumulate (and scale the 1000-micro-batch warmup
    floor the same way) or warmup/decay run ``accumulate``x too slow."""
    lf = one_cycle(1, lrf, epochs) if cos_lr else linear_lf(lrf, epochs)
    # 1000-iteration warmup floor matches reference train.py:452 exactly
    nw = max(warmup_epochs * steps_per_epoch, min_warmup_steps)
    start = warmup_bias_lr if is_bias else 0.0

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / steps_per_epoch)
        # piecewise-linear epoch factor evaluated on integer epochs
        target = lr0 * _lf_jnp(epoch, lrf, epochs, cos_lr)
        frac = jnp.clip(step / nw, 0.0, 1.0)
        warm = start + frac * (target - start)
        return jnp.where(step < nw, warm, target)

    return lr_fn


def _lf_jnp(epoch, lrf, epochs, cos_lr):
    if cos_lr:
        return ((1 - jnp.cos(epoch * math.pi / epochs)) / 2) * (lrf - 1) + 1
    return (1 - epoch / epochs) * (1.0 - lrf) + lrf


def param_group_label(path: tuple, leaf) -> str:
    """Classify a param into g0 (norm scales), g1 (kernels), g2 (biases)."""
    name = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
    joined = "/".join(
        str(p.key) if hasattr(p, "key") else str(p) for p in path
    )
    if name in ("bias",) or name.endswith("_bias"):
        return "g2"
    if name == "scale" or ("bn" in joined and name in ("scale", "weight")):
        return "g0"
    if leaf.ndim <= 1:
        return "g2"  # 1-D leftovers (e.g. Conv_7 time weights) — no decay
    return "g1"


def build_optimizer(
    params,
    name: str = "SGD",
    lr0: float = 0.01,
    lrf: float = 0.01,
    momentum: float = 0.937,
    weight_decay: float = 5e-4,
    epochs: int = 300,
    steps_per_epoch: int = 1000,
    cos_lr: bool = True,
    warmup_epochs: float = 3.0,
    warmup_momentum: float = 0.8,
    warmup_bias_lr: float = 0.1,
    accumulate: int = 1,
    warmup_floor: float = 1000.0,
):
    """Three-group optimizer with warmup schedules.

    Returns an optax GradientTransformation; pass `params` for group
    labeling only.
    """
    labels = jax.tree_util.tree_map_with_path(param_group_label, params)

    # schedules are evaluated once per optimizer APPLY: under MultiSteps the
    # inner count advances every `accumulate` micro-steps, so convert the
    # micro-step epoch length (and the 1000-micro-batch warmup floor,
    # reference train.py:452) to
    # apply-steps or warmup/decay stretch by `accumulate`x.
    # warmup floor: 1000 micro-batches in the v1 trainer (train.py:452),
    # 100 in the v2/TAL trainer (train2.py:238) — caller picks
    sched_spe = steps_per_epoch / max(accumulate, 1)
    min_warmup = warmup_floor / max(accumulate, 1)

    def make_tx(is_bias: bool, decay: float):
        lr_fn = make_lr_fn(
            lr0, lrf, epochs, sched_spe, cos_lr,
            warmup_epochs, warmup_bias_lr, is_bias,
            min_warmup_steps=min_warmup,
        )
        if name.lower() == "sgd":
            # momentum warms up warmup_momentum -> momentum over the same
            # window as the LR (reference train.py:538-540), via
            # inject_hyperparams so the trace decay follows the schedule
            nw = max(warmup_epochs * sched_spe, min_warmup)

            def mom_fn(step):
                frac = jnp.clip(
                    jnp.asarray(step, jnp.float32) / nw, 0.0, 1.0
                )
                return warmup_momentum + frac * (momentum - warmup_momentum)

            tx = optax.chain(
                optax.add_decayed_weights(decay),
                optax.inject_hyperparams(
                    lambda learning_rate, momentum: optax.sgd(
                        learning_rate=learning_rate,
                        momentum=momentum,
                        nesterov=True,
                    )
                )(learning_rate=lr_fn, momentum=mom_fn),
            )
        elif name.lower() == "adam":
            tx = optax.chain(
                optax.add_decayed_weights(decay),
                optax.adam(learning_rate=lr_fn, b1=momentum, b2=0.999),
            )
        elif name.lower() == "adamw":
            tx = optax.adamw(
                learning_rate=lr_fn, b1=momentum, b2=0.999, weight_decay=decay
            )
        elif name.lower() == "lion":
            tx = optax.lion(learning_rate=lr_fn, b1=momentum, weight_decay=decay)
        else:
            raise KeyError(f"unknown optimizer {name!r}")
        return tx

    tx = optax.multi_transform(
        {
            "g0": make_tx(False, 0.0),
            "g1": make_tx(False, weight_decay),
            "g2": make_tx(True, 0.0),
        },
        labels,
    )
    # skip non-finite updates instead of poisoning the params — the
    # reference's AMP GradScaler does exactly this (inf/NaN grad steps are
    # dropped, train.py:571-576); one bad batch must not end the run
    tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx
