"""Optimization sanity: single-batch overfit must drive the loss down."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.models.yolo import build_model
from ecs_yolo_tpu.train.optim import build_optimizer
from ecs_yolo_tpu.train.trainer import create_train_state, make_train_step

HYP = dict(
    box=0.05, obj=1.0, cls=0.5, cls_pw=1.0, obj_pw=1.0, anchor_t=4.0,
    fl_gamma=0.0, label_smoothing=0.0, slide_ratio=0.0,
)


@pytest.mark.slow
def test_single_batch_overfit():
    model = build_model("resnet10.yaml", nc=2, snn=SNNConfig(time_window=2))
    variables = model.init(jax.random.PRNGKey(0), imgsz=64)
    steps = 25
    tx = build_optimizer(
        variables["params"], name="Adam", lr0=2e-3, lrf=1.0,
        epochs=1, steps_per_epoch=steps, warmup_epochs=0.0, cos_lr=False,
    )
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, HYP)

    rng = np.random.RandomState(0)
    ims = rng.rand(2, 64, 64, 3).astype(np.float32) * 0.2
    # one bright box per image, matching its label
    for b in range(2):
        ims[b, 16:48, 16:48] = [0.9, 0.3, 0.3]
    targets = np.zeros((2, 4, 5), np.float32)
    targets[:, 0] = [0, 0.5, 0.5, 0.5, 0.5]
    mask = np.zeros((2, 4), bool)
    mask[:, 0] = True
    batch = (jnp.asarray(ims), jnp.asarray(targets), jnp.asarray(mask))

    losses = []
    for _ in range(steps):
        state, metrics = step(state, *batch)
        losses.append(float(metrics["loss"]))

    assert np.isfinite(losses).all()
    # optimization must make clear progress on a memorizable batch
    assert losses[-1] < losses[0] * 0.7, losses[::5]
