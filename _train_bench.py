import time, json
import numpy as np
import jax, jax.numpy as jnp
from ecs_yolo_tpu.models.yolo import build_model
from ecs_yolo_tpu.train.optim import build_optimizer
from ecs_yolo_tpu.train.trainer import create_train_state, make_train_step

B, IMGSZ = 8, 640
model = build_model("resnet34.yaml", nc=80, remat=True)
variables = model.init(jax.random.PRNGKey(0), imgsz=64)
tx = build_optimizer(variables["params"], epochs=10, steps_per_epoch=100)
state = create_train_state(variables, tx)
step = make_train_step(model, tx, dict(
    box=0.05, obj=1.0, cls=0.5, cls_pw=1.0, obj_pw=1.0, anchor_t=4.0,
    fl_gamma=0.0, label_smoothing=0.0, slide_ratio=0.0), compute_dtype=jnp.bfloat16)

rng = np.random.RandomState(0)
ims = jnp.asarray(rng.rand(B, IMGSZ, IMGSZ, 3), jnp.float32)
targets = np.zeros((B, 32, 5), np.float32)
targets[:, :3] = [[1, .3, .3, .2, .2], [5, .6, .6, .3, .3], [10, .5, .8, .1, .2]]
mask = np.zeros((B, 32), bool); mask[:, :3] = True
targets = jnp.asarray(targets); mask = jnp.asarray(mask)

state, m = step(state, ims, targets, mask)
jax.block_until_ready(m["loss"])
t0 = time.perf_counter()
N = 10
for _ in range(N):
    state, m = step(state, ims, targets, mask)
jax.block_until_ready(m["loss"])
dt = time.perf_counter() - t0
print(json.dumps({"train_imgs_per_sec": round(B*N/dt, 2), "loss": float(m["loss"])}))
