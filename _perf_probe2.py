import time, json
import numpy as np
import jax, jax.numpy as jnp
from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.models.yolo import build_model

def bench_cfg(name, snn, batch=16, imgsz=640, iters=10):
    model = build_model("resnet34.yaml", nc=80, snn=snn)
    variables = model.init(jax.random.PRNGKey(0), imgsz=64)
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x, t)
    variables = {"params": cast(variables["params"]), "batch_stats": variables.get("batch_stats", {})}
    @jax.jit
    def fwd(x):
        z, _ = model.module.apply(variables, x, training=False)
        return z
    x = jnp.asarray(np.random.rand(batch, imgsz, imgsz, 3), jnp.bfloat16)
    fwd(x).block_until_ready()
    fwd(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(x)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    print(json.dumps({"cfg": name, "imgs_per_sec": round(batch*iters/dt, 2)}), flush=True)

bench_cfg("T4_ecs_b16_unroll", SNNConfig())
bench_cfg("T4_ecs_b32_unroll", SNNConfig(), batch=32)
bench_cfg("T4_noecs_b16_unroll", SNNConfig(ecs=False))
