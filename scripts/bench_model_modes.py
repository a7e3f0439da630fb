"""Full-model cost decomposition on TPU (in-graph timing).

Re-establishes the round-1 host-timed table (conv-only 333 / plain-LIF 137 /
ECS 105 img/s) with trustworthy fori_loop timing.
Usage: python scripts/bench_model_modes.py [conv|lif|ecs] [batch]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import ecs_yolo_tpu.nn.blocks as blocks_mod
from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.snn.neuron import lif_scan

mode = sys.argv[1] if len(sys.argv) > 1 else "ecs"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 8
IMGSZ, ITERS = 640, 8

if mode == "conv":
    # identity activation: measures the pure conv/BN/pool stack
    class _IdentityMem(blocks_mod.MemUpdate):
        @blocks_mod.nn.compact
        def __call__(self, x, training=False):
            return jax.nn.silu(x) if self.act else x

    blocks_mod.MemUpdate.__call__ = _IdentityMem.__call__

snn = SNNConfig(time_window=4, ecs=(mode == "ecs"))

from ecs_yolo_tpu.models.yolo import build_model  # noqa: E402

model = build_model("resnet34.yaml", nc=80, snn=snn)
variables = model.init(jax.random.PRNGKey(0), imgsz=64)
cast = lambda t: jax.tree_util.tree_map(
    lambda v: v.astype(jnp.bfloat16)
    if isinstance(v, jax.Array) and v.dtype == jnp.float32 else v, t)
variables = {"params": cast(variables["params"]),
             "batch_stats": variables.get("batch_stats", {})}


def chained(x, n):
    def body(i, x):
        z, _ = model.module.apply(variables, x, training=False)
        return x + jnp.tanh(jnp.mean(z.astype(jnp.float32))).astype(
            x.dtype) * jnp.bfloat16(1e-3)

    return jnp.mean(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))


run = jax.jit(chained, static_argnums=1)
x = jnp.asarray(np.random.RandomState(0).rand(BATCH, IMGSZ, IMGSZ, 3),
                jnp.bfloat16)
float(run(x, 1)); float(run(x, 1 + ITERS))
t0 = time.perf_counter(); float(run(x, 1)); t1 = time.perf_counter() - t0
t0 = time.perf_counter(); float(run(x, 1 + ITERS)); tn = time.perf_counter() - t0
per = (tn - t1) / ITERS
print(f"{mode} b{BATCH}: {BATCH / per:.1f} img/s  ({per * 1000:.1f} ms/batch)",
      flush=True)
