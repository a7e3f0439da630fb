"""Isolate the loss+decode share of the res10@640 b16 train-step backward.

bench_site_decomp killed the "stage-1 is 73%" reading (the prefix heads
were oversized); the remaining suspects for the 163 ms backward are the
distributed conv/neuron population vs the head+loss.  This script runs
value_and_grad on the FULL production model twice:

  sumsq  — grad of sum(out^2) over the raw head maps (no loss, no decode)
  loss   — the real ComputeLoss v1 path (what make_train_step runs)

The difference is the loss+assignment+decode cost including its backward.
Usage (TPU): python scripts/bench_loss_cost.py [sumsq|loss ...]
Env: BENCH_BATCH/BENCH_NC/BENCH_CFG as in bench_train_step.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("BENCH_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.models.yolo import build_model
from ecs_yolo_tpu.train.trainer import make_loss_fn

BATCH = int(os.environ.get("BENCH_BATCH", 16))
IMGSZ = int(os.environ.get("BENCH_IMGSZ", 640))
CFG = os.environ.get("BENCH_CFG", "resnet10.yaml")
NC = int(os.environ.get("BENCH_NC", 13))
ITERS = 5
CD = jnp.bfloat16

HYP = dict(
    box=0.05, obj=1.0, cls=0.5, cls_pw=1.0, obj_pw=1.0, anchor_t=4.0,
    fl_gamma=0.0, label_smoothing=0.0, slide_ratio=0.0,
)


def bench(mode):
    snn = SNNConfig(time_window=4)
    model = build_model(CFG, nc=NC, snn=snn)
    variables = model.init(jax.random.PRNGKey(0), imgsz=64)
    params, bstats = variables["params"], variables["batch_stats"]
    loss_fn = make_loss_fn(model, HYP) if mode == "loss" else None

    rng = np.random.RandomState(0)
    targets = jnp.asarray(
        np.tile([[1, 0.5, 0.5, 0.25, 0.3]], (BATCH, 8, 1)), jnp.float32
    )
    tmask = jnp.asarray(np.ones((BATCH, 8), bool))

    def cast(p):
        return jax.tree_util.tree_map(
            lambda v: v.astype(CD) if v.dtype == jnp.float32 else v, p)

    def forward(p, bs, x):
        out, upd = model.module.apply(
            {"params": cast(p), "batch_stats": bs},
            x.astype(CD), training=True, mutable=["batch_stats"])
        if mode == "loss":
            out32 = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32)
                if hasattr(a, "dtype") and a.dtype == CD else a, out)
            total, _ = loss_fn(out32, targets, tmask)
            return total.astype(jnp.float32), upd["batch_stats"]
        leaves = jax.tree_util.tree_leaves(out)
        s = sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)
        return s, upd["batch_stats"]

    @jax.jit
    def chained(carry, x0, scales):
        def body(c, sc):
            p, bs = c
            (s, bs2), g = jax.value_and_grad(
                forward, has_aux=True)(p, bs, x0 * sc)
            p2 = jax.tree_util.tree_map(
                lambda a, b: a - 1e-9 * b.astype(a.dtype), p, g)
            return (p2, bs2), s
        c, ss = jax.lax.scan(body, carry, scales)
        return ss

    x0 = jnp.asarray(rng.rand(BATCH, IMGSZ, IMGSZ, 3), jnp.float32)
    carry = (params, bstats)

    def run(scales):
        return float(np.asarray(chained(carry, x0, scales)).sum())

    times = {}
    for n in (1, ITERS + 1):
        scs = [jnp.linspace(1.0, 1.0 + 1e-3 * j, n).astype(jnp.float32)
               for j in (1, 2)]
        t0 = time.perf_counter()
        run(scs[0])
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(scs[1])
        times[n] = time.perf_counter() - t0
        print(f"  {mode} trip={n}: compile+run {tc:.1f}s warm {times[n]:.3f}s",
              flush=True)
    per = (times[ITERS + 1] - times[1]) / ITERS
    print(f"{mode}: {per * 1e3:.1f} ms/step = {BATCH / per:.1f} img/s",
          flush=True)
    return per


if __name__ == "__main__":
    modes = sys.argv[1:] or ["sumsq", "loss"]
    res = {m: bench(m) for m in modes}
    print({k: round(v * 1e3, 1) for k, v in res.items()}, flush=True)
