"""Benchmark: flagship EMS-Res34 inference throughput on TPU.

Measures images/sec of the jitted forward (640 px, T=4, bf16 compute) on the
real chip — the BASELINE.md north-star metric (images/sec/chip vs the
reference GPU pipeline).

REF_GPU_IMGS_PER_SEC provenance (BASELINE.md §5): the reference publishes no
inference throughput, but its completed wandb run measured 300 epochs of
EMS-Res10/BDD100K/640px/b16 training in 247,083 s on an RTX 4060 Ti —
an UPPER BOUND of 85 img/s train (assumes the full 70k split; the split
list is not in the repo).  Derived upper bound for EMS-Res34 640 px T=4 GPU
inference: 85 x 3 (train ~= 3x inference) / 2.6 (res34/res10 FLOPs) ~= 100
img/s.  Using the upper bound makes ``vs_baseline`` conservative AGAINST
this framework (the round-1/2 value of 30.0 was an undocumented estimate).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REF_GPU_IMGS_PER_SEC = 100.0  # measured-anchor-derived upper bound, see
                              # module docstring + BASELINE.md §5

BATCH = int(os.environ.get("BENCH_BATCH", 8))
IMGSZ = int(os.environ.get("BENCH_IMGSZ", 640))
CFG = os.environ.get("BENCH_CFG", "resnet34.yaml")  # driver default: flagship
NC = int(os.environ.get("BENCH_NC", 80))
WARMUP = 3
ITERS = 10


_COST_CHILD = """
import json, os
import jax, jax.numpy as jnp
from ecs_yolo_tpu.models.yolo import build_model
model = build_model(os.environ["BC_CFG"], nc=int(os.environ["BC_NC"]))
variables = model.init(jax.random.PRNGKey(0), imgsz=64)

def fwd(x):
    z, _ = model.module.apply(variables, x, training=False)
    return z

x = jnp.zeros((int(os.environ["BC_B"]), int(os.environ["BC_SZ"]),
               int(os.environ["BC_SZ"]), 3), jnp.bfloat16)
ca = jax.jit(fwd).lower(x).cost_analysis() or {}
print(json.dumps({"flops": float(ca.get("flops", 0.0)),
                  "bytes": float(ca.get("bytes accessed", 0.0))}))
"""


def _cost_context(batches_per_sec: float) -> dict:
    """{'mfu', 'hbm_util'} from a scrubbed-CPU lowering of the same graph."""
    import subprocess
    import sys

    env = {
        k: v
        for k, v in os.environ.items()
        if "AXON" not in k.upper() and not k.upper().startswith("PALLAS_")
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
    env["JAX_PLATFORMS"] = "cpu"
    env.update(BC_CFG=CFG, BC_NC=str(NC), BC_B=str(BATCH), BC_SZ=str(IMGSZ))
    proc = subprocess.run(
        [sys.executable, "-c", _COST_CHILD], env=env,
        capture_output=True, text=True, timeout=900,
    )
    cost = json.loads(proc.stdout.strip().splitlines()[-1])
    out = {}
    if cost["flops"] > 0:
        out["mfu"] = round(cost["flops"] * batches_per_sec / 197e12, 4)
    if cost["bytes"] > 0:
        out["hbm_util"] = round(cost["bytes"] * batches_per_sec / 819e9, 4)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from ecs_yolo_tpu.models.yolo import build_model

    snn_kw = {}
    if "BENCH_INT8SPK" in os.environ:  # A/B the int8 spike transport
        from ecs_yolo_tpu.config import SNNConfig

        snn_kw["snn"] = SNNConfig(
            int8_spike_transport=os.environ["BENCH_INT8SPK"] == "1"
        )
    model = build_model(CFG, nc=NC, **snn_kw)
    variables = model.init(jax.random.PRNGKey(0), imgsz=64)

    if os.environ.get("BENCH_FUSE", "0") == "1":
        # fold BN scale into conv kernels (reference fuses at every load,
        # models/experimental.py:94); off by default so the graded number
        # stays comparable across rounds — measure the delta explicitly
        from ecs_yolo_tpu.models.utils import fuse_conv_bn

        variables = fuse_conv_bn(variables)

    # bf16 compute: cast params and inputs; BN running stats stay fp32
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32
        else x,
        t,
    )
    variables = {"params": cast(variables["params"]),
                 "batch_stats": variables.get("batch_stats", {})}

    # In-graph timing: chain ITERS data-dependent forwards inside ONE jit
    # call and difference two trip counts.  Host-side per-call timing
    # through the axon tunnel is unreliable — repeated identical remote
    # executions get memoized and block_until_ready returns on enqueue-ack
    # (docs/DESIGN.md round-2 findings).
    def chained(x, n):
        def body(i, x):
            z, _ = model.module.apply(variables, x, training=False)
            # tiny data-dependent perturbation: defeats loop-invariant
            # hoisting and cross-call memoization without changing the work
            return x + jnp.tanh(
                jnp.mean(z.astype(jnp.float32))
            ).astype(x.dtype) * jnp.bfloat16(1e-3)

        return jnp.mean(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    run = jax.jit(chained, static_argnums=1)
    x = jnp.asarray(
        np.random.RandomState(0).rand(BATCH, IMGSZ, IMGSZ, 3), jnp.bfloat16
    )

    for _ in range(WARMUP):
        float(run(x, 1))
        float(run(x, 1 + ITERS))

    t0 = time.perf_counter()
    float(run(x, 1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(x, 1 + ITERS))
    tn = time.perf_counter() - t0
    dt = tn - t1

    imgs_per_sec = BATCH * ITERS / dt

    # roofline context (VERDICT r4 item 9): XLA's own FLOP/byte counts for
    # the measured graph / v5e peaks (197 TFLOP/s bf16, 819 GB/s HBM).
    # The axon backend returns None from lowered.cost_analysis(), so a
    # scrubbed CPU child lowers the SAME graph (HLO-level counts are
    # backend-independent; lowering needs no XLA compile).  `mfu` uses the
    # algorithmic FLOPs (exact); `hbm_util` uses pre-fusion "bytes
    # accessed", an UPPER bound on real traffic (fusion removes
    # intermediates) — so the printed utilization brackets the truth:
    # actual compute-util >= mfu, actual HBM-util <= hbm_util.
    extra = {}
    try:
        extra.update(_cost_context(imgs_per_sec / BATCH))
    except Exception:
        pass  # best-effort context, never a bench failure

    print(
        json.dumps(
            {
                "metric": "ems_%s_coco_inference_%d_T4_bf16"
                          % (CFG.split(".")[0].replace("resnet", "res"),
                             IMGSZ),
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / REF_GPU_IMGS_PER_SEC, 2),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
