"""Judge probe: localize the 1-vs-8-device train-step loss mismatch.

Runs the exact test_mesh parity setup under three SNN configs:
  A) production defaults (packed_c64=True, stem_dedup=True)
  B) packed_c64=False, stem_dedup=True
  C) packed_c64=False, stem_dedup=False
and prints the single-device vs 8-device loss for each.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.models.yolo import build_model
from ecs_yolo_tpu.parallel.mesh import make_mesh, shard_batch, replicate_tree
from ecs_yolo_tpu.train.optim import build_optimizer
from ecs_yolo_tpu.train.trainer import create_train_state, make_train_step

HYP = dict(box=0.05, obj=1.0, cls=0.5, cls_pw=1.0, obj_pw=1.0, anchor_t=4.0,
           fl_gamma=0.0, label_smoothing=0.0, slide_ratio=0.0)


def batch(b=8, imgsz=64, m=8):
    rng = np.random.RandomState(3)
    images = rng.rand(b, imgsz, imgsz, 3).astype(np.float32)
    targets = np.zeros((b, m, 5), np.float32)
    targets[:, 0] = [1, 0.5, 0.5, 0.25, 0.3]
    targets[:, 1] = [0, 0.3, 0.6, 0.2, 0.2]
    mask = np.zeros((b, m), bool)
    mask[:, :2] = True
    return images, targets, mask


def run(model, variables, put):
    variables = jax.tree_util.tree_map(jnp.copy, variables)
    tx = build_optimizer(variables["params"], name="SGD", epochs=3,
                         steps_per_epoch=10)
    state = create_train_state(variables, tx)
    images, targets, mask = batch()
    state, images, targets, mask = put(state, images, targets, mask)
    step = make_train_step(model, tx, HYP)
    _, metrics = step(state, jnp.asarray(images), jnp.asarray(targets),
                      jnp.asarray(mask))
    return float(metrics["loss"])


for label, snn in [
    ("A defaults", SNNConfig()),
    ("B no-pack  ", SNNConfig(packed_c64=False)),
    ("C no-pack-no-dedup", SNNConfig(packed_c64=False, stem_dedup=False)),
]:
    model = build_model("resnet10.yaml", nc=2, snn=snn)
    variables = model.init(jax.random.PRNGKey(0), imgsz=64)
    d0 = jax.devices()[0]
    l1 = run(model, variables,
             lambda s, i, t, k: jax.tree_util.tree_map(
                 lambda x: jax.device_put(x, d0), (s, i, t, k)))
    mesh = make_mesh(jax.devices()[:8])
    with mesh:
        l8 = run(model, variables,
                 lambda s, i, t, k: (replicate_tree(mesh, s),
                                     *shard_batch(mesh, (i, t, k))))
    print(f"{label}: loss1={l1:.6f} loss8={l8:.6f} "
          f"absdiff={abs(l1 - l8):.6f} reldiff={abs(l1 - l8) / l1:.2e}")
