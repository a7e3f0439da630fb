"""Benchmark: flagship EMS-Res34 inference throughput on TPU.

Measures images/sec of the jitted forward (640 px, T=4, bf16 compute) on the
real chip — the BASELINE.md north-star metric (images/sec/chip vs the
reference GPU pipeline).  The reference publishes no throughput numbers
(BASELINE.md "Notes"); REF_GPU_IMGS_PER_SEC below is our documented estimate
of the reference PyTorch implementation (per-timestep Python conv loops,
T=4, 640 px, single CUDA GPU of the era, cf. environment.yml cu113) used for
the ``vs_baseline`` ratio until a measured number replaces it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

REF_GPU_IMGS_PER_SEC = 30.0  # documented estimate, see module docstring

BATCH = 8
IMGSZ = 640
WARMUP = 3
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from ecs_yolo_tpu.models.yolo import build_model

    model = build_model("resnet34.yaml", nc=80)
    variables = model.init(jax.random.PRNGKey(0), imgsz=64)

    # bf16 compute: cast params and inputs; BN running stats stay fp32
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32
        else x,
        t,
    )
    variables = {"params": cast(variables["params"]),
                 "batch_stats": variables.get("batch_stats", {})}

    @jax.jit
    def forward(images):
        z, _ = model.module.apply(variables, images, training=False)
        return z

    x = jnp.asarray(
        np.random.RandomState(0).rand(BATCH, IMGSZ, IMGSZ, 3), jnp.bfloat16
    )

    for _ in range(WARMUP):
        forward(x).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = forward(x)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    imgs_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "ems_res34_coco_inference_640_T4_bf16",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / REF_GPU_IMGS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
