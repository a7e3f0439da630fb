"""Worker for the multi-host (multi-process) data-parallel test.

Run as: python tests/multihost_worker.py RANK WORLD PORT DATA_DIR NDEV
Joins a jax.distributed CPU cluster (WORLD>1) or runs single-process
(WORLD==1), executes 2 deterministic sharded train steps on a global
``data`` mesh with per-host batch slices, and prints "LOSS <v0> <v1>".
The parent test asserts the multi-process losses equal the single-process
ones — the DDP-parity evidence for SURVEY §2.10 / reference train.py:927.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

rank, world, port, data_dir, ndev = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    int(sys.argv[5]),
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", ndev)

from ecs_yolo_tpu.parallel import multihost

if world > 1:
    multihost.initialize(f"localhost:{port}", world, rank)

import numpy as np
import jax.numpy as jnp

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.data.dataset import Dataset
from ecs_yolo_tpu.models.yolo import build_model
from ecs_yolo_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from ecs_yolo_tpu.train.optim import build_optimizer
from ecs_yolo_tpu.train.trainer import create_train_state, make_train_step

HYP = dict(
    box=0.05, obj=1.0, cls=0.5, cls_pw=1.0, obj_pw=1.0, anchor_t=4.0,
    fl_gamma=0.0, label_smoothing=0.0, slide_ratio=0.0,
)
BATCH = 4

model = build_model("resnet10.yaml", nc=1, snn=SNNConfig(time_window=2))
variables = model.init(jax.random.PRNGKey(0), imgsz=64)
tx = build_optimizer(variables["params"], epochs=1, steps_per_epoch=2)
state = create_train_state(variables, tx)
step = make_train_step(model, tx, HYP)

mesh = make_mesh(jax.devices())
data_s = batch_sharding(mesh)
state = jax.device_put(state, replicated(mesh))

ds = Dataset(data_dir, img_size=64, augment=False, max_labels=4)
host_shard = (jax.process_index(), world) if world > 1 else None

losses = []
for ims, labels, masks in ds.batches(
    BATCH, shuffle=True, seed=7, host_shard=host_shard
):
    batch = (
        multihost.to_global(data_s, np.asarray(ims)),
        multihost.to_global(data_s, np.asarray(labels)),
        multihost.to_global(data_s, np.asarray(masks)),
    )
    state, metrics = step(state, *batch)
    losses.append(float(metrics["loss"]))

fit = multihost.broadcast_scalar(123.0 if multihost.is_main() else 0.0)
assert fit == 123.0, fit
print("LOSS " + " ".join(f"{v:.6f}" for v in losses), flush=True)

if world > 1:
    # reach the shutdown barrier in lockstep (the broadcast above already
    # synchronized the tasks) — leaving it to interpreter exit makes the
    # barrier sensitive to atexit/GC timing skew under host load
    jax.distributed.shutdown()
