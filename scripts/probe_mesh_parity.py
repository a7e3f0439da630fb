"""Diagnose the round-3 test_mesh train-parity failure.

Runs the 1-vs-8-device train-step loss comparison under three setups:
  legacy  — fp32, packed_c64=False, stem_dedup=False (round-2 graph)
  default — fp32, round-3 defaults (reproduces the failure)
  x64     — float64, round-3 defaults

If x64 agrees tightly while fp32-default does not, the failure is the known
spiking-net reassociation chaos (docs/DESIGN.md round-3 part 2): the sharded
global-BN reductions round differently at ~1 ulp, which flips Heaviside
spikes.  If x64 also disagrees, there is a genuine sharding bug.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.models.yolo import build_model
from ecs_yolo_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from ecs_yolo_tpu.train.optim import build_optimizer
from ecs_yolo_tpu.train.trainer import create_train_state, make_train_step

HYP = dict(
    box=0.05, obj=1.0, cls=0.5, cls_pw=1.0, obj_pw=1.0, anchor_t=4.0,
    fl_gamma=0.0, label_smoothing=0.0, slide_ratio=0.0,
)


def run(tag, snn, dtype):
    model = build_model("resnet10.yaml", nc=2, snn=snn)
    variables = model.init(jax.random.PRNGKey(0), imgsz=64)
    if dtype == jnp.float64:
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64)
            if a.dtype == jnp.float32 else a, variables)

    rng = np.random.RandomState(3)
    images = rng.rand(8, 64, 64, 3).astype(dtype)
    targets = np.zeros((8, 8, 5), dtype)
    targets[:, 0] = [1, 0.5, 0.5, 0.25, 0.3]
    targets[:, 1] = [0, 0.3, 0.6, 0.2, 0.2]
    mask = np.zeros((8, 8), bool)
    mask[:, :2] = True

    def one(device_put_fn):
        vs = jax.tree_util.tree_map(jnp.copy, variables)
        tx = build_optimizer(vs["params"], name="SGD", epochs=3,
                             steps_per_epoch=10)
        state = create_train_state(vs, tx)
        st, i, t, k = device_put_fn(
            state, jnp.asarray(images), jnp.asarray(targets),
            jnp.asarray(mask))
        step = make_train_step(model, tx, HYP, compute_dtype=dtype)
        new_state, metrics = step(st, i, t, k)
        return float(metrics["loss"])

    d0 = jax.devices()[0]
    l1 = one(lambda s, i, t, k: jax.tree_util.tree_map(
        lambda x: jax.device_put(x, d0), (s, i, t, k)))
    mesh = make_mesh(jax.devices()[:8])
    with mesh:
        l8 = one(lambda s, i, t, k: (
            replicate_tree(mesh, s), *shard_batch(mesh, (i, t, k))))
    rel = abs(l1 - l8) / max(abs(l1), 1e-12)
    print(f"{tag}: loss1={l1:.9g} loss8={l8:.9g} rel={rel:.3g}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("legacy", "all"):
        run("legacy-fp32",
            SNNConfig(packed_c64=False, stem_dedup=False), jnp.float32)
    if which in ("default", "all"):
        run("default-fp32", SNNConfig(), jnp.float32)
    if which in ("x64", "all"):
        with jax.enable_x64():
            run("default-x64", SNNConfig(), jnp.float64)
