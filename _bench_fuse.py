import time, json
import numpy as np
import jax, jax.numpy as jnp
from ecs_yolo_tpu.models.yolo import build_model
from ecs_yolo_tpu.models.utils import fuse_conv_bn

model = build_model("resnet34.yaml", nc=80)
variables = model.init(jax.random.PRNGKey(0), imgsz=64)
variables = fuse_conv_bn(variables)
cast = lambda t: jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16) if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x, t)
variables = {"params": cast(variables["params"]), "batch_stats": cast(variables["batch_stats"])}

@jax.jit
def fwd(x):
    z, _ = model.module.apply(variables, x, training=False)
    return z

x = jnp.asarray(np.random.rand(16, 640, 640, 3), jnp.bfloat16)
fwd(x).block_until_ready(); fwd(x).block_until_ready()
t0 = time.perf_counter()
for _ in range(10):
    out = fwd(x)
out.block_until_ready()
dt = time.perf_counter() - t0
print(json.dumps({"cfg": "fused_bn", "imgs_per_sec": round(160/dt, 2)}))
