"""TPU training-step throughput: fp32-full-remat (round-1 baseline 15.6
img/s) vs bf16 + neuron-site remat (VERDICT r1 item 7).

EMS-Res34, 640 px, T=4, batch 8, loss+grads+optimizer+EMA per step.
Usage: python scripts/bench_train_step.py [fp32_remat|bf16_neuron|bf16_full]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.models.yolo import build_model
from ecs_yolo_tpu.train.optim import build_optimizer
from ecs_yolo_tpu.train.trainer import create_train_state, make_train_step

import os

BATCH = int(os.environ.get("BENCH_BATCH", 8))
IMGSZ = int(os.environ.get("BENCH_IMGSZ", 640))
CFG = os.environ.get("BENCH_CFG", "resnet34.yaml")  # resnet10.yaml matches
NC = int(os.environ.get("BENCH_NC", 80))            # the reference's wandb
                                                    # run (BDD100K nc=13)
HYP = dict(
    box=0.05, obj=1.0, cls=0.5, cls_pw=1.0, obj_pw=1.0, anchor_t=4.0,
    fl_gamma=0.0, label_smoothing=0.0, slide_ratio=0.0,
)

mode = sys.argv[1] if len(sys.argv) > 1 else "bf16_neuron"
dtype = jnp.float32 if mode.startswith("fp32") else jnp.bfloat16
remat_all = mode.endswith("_remat") or mode.endswith("_full")
remat_neuron = mode.endswith("_neuron")

snn = SNNConfig(
    time_window=4,
    remat_neuron=remat_neuron,
    # defaults track SNNConfig's production defaults; override for A/B
    bn_custom_vjp=os.environ.get("BENCH_BNVJP", "1") == "1",
    int8_spike_transport=os.environ.get("BENCH_INT8SPK", "1") == "1",
    int8_reset_gate=os.environ.get("BENCH_INT8GATE", "0") == "1",
    pallas_dw_spread=os.environ.get("BENCH_PALLASDW", "0") == "1",
)
model = build_model(CFG, nc=NC, snn=snn, remat=remat_all)
variables = model.init(jax.random.PRNGKey(0), imgsz=64)
tx = build_optimizer(variables["params"], epochs=3, steps_per_epoch=10)
state = create_train_state(variables, tx)
step = make_train_step(model, tx, HYP, compute_dtype=dtype)

rng = np.random.RandomState(0)
targets = np.zeros((BATCH, 8, 5), np.float32)
targets[:, 0] = [1, 0.5, 0.5, 0.3, 0.3]
mask = np.zeros((BATCH, 8), bool)
mask[:, 0] = True
tgt, msk = jnp.asarray(targets), jnp.asarray(mask)

# distinct inputs per step (the remote-exec layer memoizes identical calls)
ITERS = 6
xs = [jnp.asarray(rng.rand(BATCH, IMGSZ, IMGSZ, 3), jnp.float32)
      for _ in range(ITERS)]

if os.environ.get("BENCH_INGRAPH", "1") == "1":
    # In-graph timing: chain steps inside ONE jit via lax.scan (state
    # threads through, distinct inputs per step) and difference two trip
    # counts — per-call dispatch through the axon tunnel is comparable to
    # a step itself and dominates host-side loops (docs/DESIGN.md round-2).
    raw = make_train_step(model, tx, HYP, compute_dtype=dtype, jit=False)
    xstack = jnp.stack(xs)

    @jax.jit
    def chained(state, xsk):
        def body(st, x):
            st2, m = raw(st, x, tgt, msk)
            return st2, m["loss"]

        st, losses = jax.lax.scan(body, state, xsk)
        return losses

    print(f"mode={mode}: compiling (in-graph scan)...", flush=True)
    for k in (1, ITERS + 1):
        xsk = jnp.concatenate([xstack] * ((k + ITERS - 1) // ITERS))[:k]
        t0 = time.perf_counter()
        losses = jax.block_until_ready(chained(state, xsk))
        t = time.perf_counter() - t0
        print(f"trip {k}: {t:.2f}s loss0={float(losses[0]):.3f}", flush=True)
        # second call on the compiled graph for the timed run
        t0 = time.perf_counter()
        jax.block_until_ready(chained(state, xsk))
        if k == 1:
            t1 = time.perf_counter() - t0
        else:
            tn = time.perf_counter() - t0
    dt = (tn - t1) / ITERS
    print(f"{mode}: {BATCH / dt:.2f} img/s  ({dt * 1000:.0f} ms/step, "
          "in-graph)", flush=True)
else:
    print(f"mode={mode}: compiling...", flush=True)
    t0 = time.perf_counter()
    state, metrics = step(state, xs[0], tgt, msk)
    jax.block_until_ready(metrics)
    print(f"first step (compile) {time.perf_counter() - t0:.1f}s "
          f"loss={float(metrics['loss']):.3f}", flush=True)

    t0 = time.perf_counter()
    for xi in xs:
        state, metrics = step(state, xi, tgt, msk)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    print(f"{mode}: {BATCH * ITERS / dt:.2f} img/s  ({dt / ITERS * 1000:.0f} "
          f"ms/step)", flush=True)
