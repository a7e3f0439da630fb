import time, json
import numpy as np
import jax, jax.numpy as jnp
import ecs_yolo_tpu.nn.blocks as B
from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.models.yolo import build_model

def bench(name, snn, batch=16, imgsz=640, iters=10, patch_identity=False):
    if patch_identity:
        orig = B.MemUpdate.__call__
        import flax.linen as nn
        def ident(self, x, training=False):
            return jax.nn.silu(x) if self.act else (x > snn.thresh).astype(x.dtype)
        B.MemUpdate.__call__ = ident
    try:
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
        fwd(x).block_until_ready(); fwd(x).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(x)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        print(json.dumps({"cfg": name, "imgs_per_sec": round(batch*iters/dt, 2)}), flush=True)
    finally:
        if patch_identity:
            B.MemUpdate.__call__ = orig

bench("T4_identity_act_b16", SNNConfig(), patch_identity=True)
bench("T2_ecs_b16", SNNConfig(time_window=2))
