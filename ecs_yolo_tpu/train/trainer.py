"""jit/pjit training step.

Replaces the reference's training inner loop (train.py:490-620): AMP
GradScaler becomes straight bf16/fp32 (no loss scaling needed on TPU), DDP
all-reduce becomes XLA's automatic gradient reduction over the sharded batch,
EMA is a pytree op inside the same compiled step, and BN runs with global
statistics (SyncBN semantics) by construction.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.yolo import BuiltModel
from .ema import ema_update
from .loss_v1 import compute_loss_v1
from .loss_tal import (
    compute_loss_tal,
    compute_loss_v10,
    compute_loss_dual,
    compute_loss_triple,
)


def _sparsity_grad(srtmp, sr):
    from .sparsity import _is_bn_scale, _is_bn_bias

    def upd(path, g, p):
        if _is_bn_scale(path):
            return g + srtmp * jnp.sign(p)
        if _is_bn_bias(path):
            return g + 10.0 * sr * jnp.sign(p)
        return g

    return upd


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    step: jax.Array


def create_train_state(variables, tx) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),  # distinct buffers (donation-safe)
        step=jnp.zeros((), jnp.int32),
    )


def make_loss_fn(model: BuiltModel, hyp: Dict[str, float]):
    """Head-appropriate loss closure (v1 anchor / TAL / v10 / dual)."""
    head = model.head_name
    nc = model.nc
    strides = model.strides

    if head == "Detect":
        a = model.head["anchors_grid"]
        anchors = jnp.asarray(a).reshape(len(a), -1, 2)  # [nl, na, 2]

        def loss(out, targets, t_mask):
            return compute_loss_v1(out, targets, t_mask, anchors, hyp, nc)

    elif head in ("DDetect", "ASFF_DDetect"):

        def loss(out, targets, t_mask):
            return compute_loss_tal(
                out, targets, t_mask, strides, nc,
                gains=(hyp.get("box", 7.5), hyp.get("cls", 0.5), hyp.get("dfl", 1.5)),
            )

    elif head in ("v10Detect", "ASFF_v10Detect"):

        def loss(out, targets, t_mask):
            return compute_loss_v10(out, targets, t_mask, strides, nc)

    elif head in ("DualDetect", "DualDDetect"):

        def loss(out, targets, t_mask):
            return compute_loss_dual(
                out[0], out[1], targets, t_mask, strides, nc
            )

    elif head in ("TripleDetect", "TripleDDetect"):

        def loss(out, targets, t_mask):
            return compute_loss_triple(out, targets, t_mask, strides, nc)

    elif head in ("Segment", "Panoptic"):
        # composite detection + proto-mask loss (reference
        # utils/segment/loss_tal.py).  When the batch carries instance masks
        # (SegmentDataset, make_train_step(with_masks=True)) the full loss
        # runs; a plain detection batch falls back to the detection terms.
        # Panoptic additionally takes a semantic class-id map (SegmentDataset
        # semantic=True, make_train_step(with_semantic=True)) for the
        # focal+dice terms over the UConv branch (reference
        # utils/panoptic/loss_tal.py:252-272).
        from ..nn.segment import compute_loss_segment, compute_loss_panoptic

        def loss(out, targets, t_mask, gt_masks=None, sem_gt=None):
            if gt_masks is None:
                if isinstance(out, tuple) and isinstance(out[0], (list, tuple)):
                    return compute_loss_tal(out[0], targets, t_mask, strides, nc)
                return compute_loss_tal(out, targets, t_mask, strides, nc)
            if sem_gt is not None:
                return compute_loss_panoptic(
                    out, targets, t_mask, gt_masks, sem_gt, strides, nc,
                    mask_gain=hyp.get("mask", 2.5),
                )
            return compute_loss_segment(
                out, targets, t_mask, gt_masks, strides, nc,
                mask_gain=hyp.get("mask", 2.5),
            )

    else:
        raise KeyError(head)
    return loss


def make_train_step(
    model: BuiltModel,
    tx: optax.GradientTransformation,
    hyp: Dict[str, float],
    ema_decay: float = 0.9999,
    compute_dtype=jnp.float32,
    sr: float = 0.0,
    sr_total_steps: int = 0,
    accumulate: int = 1,
    with_masks: bool = False,
    with_semantic: bool = False,
    jit: bool = True,
):
    """Build the jitted train step.  Batch: (images [B,H,W,C] float 0-1,
    targets [B,M,5], mask [B,M]).  `sr > 0` enables network-slimming BN-L1
    sparsity (reference train_sparsity.py:570-581).  ``accumulate`` must
    match the optimizer's MultiSteps schedule: EMA then updates only on
    apply boundaries with the apply count as its decay ramp counter
    (reference ModelEMA updates once per optimizer step,
    utils/torch_utils.py:286 + train.py:567-583).  ``with_masks`` adds a
    5th batch element — per-instance masks [B, M, ph, pw] — for the
    Segment/Panoptic composite loss (SegmentDataset batches); ``with_semantic``
    a 6th — an int class-id map [B, hs, ws] — for Panoptic's semantic
    focal+dice terms."""
    loss_fn = make_loss_fn(model, hyp)

    def step_fn(state: TrainState, images, targets, t_mask, gt_masks=None,
                sem_gt=None):
        if images.dtype == jnp.uint8:
            # uint8 host->device transport (Dataset(uint8_out=True)), the
            # reference's uint8-collate + .float()/255-on-GPU (train.py:536)
            # done TPU-side: 4x less host->device traffic.  XLA lowers /255
            # to a reciprocal multiply, so pixels differ from the host-side
            # numpy divide by <=1 ulp (2^-24) — measured 126/256 values,
            # tests/test_data.py::test_uint8_out_ulp_parity
            images = images.astype(jnp.float32) / 255.0
        def losses(params):
            # bf16 compute: fp32 master params cast at the apply boundary
            # (grads accumulate back into fp32 — the TPU equivalent of the
            # reference's CUDA AMP autocast, train.py:553; no loss scaling
            # needed with bf16's fp32-range exponent).  BN statistics stay
            # fp32 inside TBatchNorm.
            if compute_dtype != jnp.float32:
                apply_params = jax.tree_util.tree_map(
                    lambda v: v.astype(compute_dtype)
                    if v.dtype == jnp.float32 else v,
                    params,
                )
            else:
                apply_params = params
            out, upd = model.module.apply(
                {"params": apply_params, "batch_stats": state.batch_stats},
                images.astype(compute_dtype),
                training=True,
                mutable=["batch_stats"],
            )
            if compute_dtype != jnp.float32:
                # head outputs to fp32 before loss/assignment numerics
                out = jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.float32)
                    if hasattr(a, "dtype") and a.dtype == compute_dtype
                    else a,
                    out,
                )
            if with_masks and with_semantic:
                total, items = loss_fn(out, targets, t_mask, gt_masks, sem_gt)
            elif with_masks:
                total, items = loss_fn(out, targets, t_mask, gt_masks)
            else:
                total, items = loss_fn(out, targets, t_mask)
            return total.astype(jnp.float32), (items, upd["batch_stats"])

        (total, (items, new_bs)), grads = jax.value_and_grad(
            losses, has_aux=True
        )(state.params)
        if sr > 0:
            from .sparsity import bn_l1_grads

            # srtmp decays linearly over training (train_sparsity.py:573)
            frac = state.step.astype(jnp.float32) / max(sr_total_steps, 1)
            srtmp = sr * (1.0 - 0.9 * jnp.clip(frac, 0.0, 1.0))
            grads = jax.tree_util.tree_map_with_path(
                _sparsity_grad(srtmp, sr), grads, state.params
            )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        step = state.step + 1
        if accumulate > 1:
            applies = step // accumulate
            ema_params = jax.lax.cond(
                step % accumulate == 0,
                lambda e: ema_update(e, params, applies, decay=ema_decay),
                lambda e: e,
                state.ema_params,
            )
        else:
            ema_params = ema_update(
                state.ema_params, params, step, decay=ema_decay
            )
        new_state = TrainState(params, new_bs, opt_state, ema_params, step)
        return new_state, {"loss": total, "items": items}

    # jit=False returns the raw step for composition inside a larger jit
    # (e.g. scripts/bench_train_step.py chains steps in-graph: per-call
    # host->TPU dispatch through the axon tunnel is comparable to the step
    # itself and would dominate host-side timing)
    return jax.jit(step_fn, donate_argnums=(0,)) if jit else step_fn
