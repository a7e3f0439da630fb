"""Decompose the training step cost on TPU (in-graph timing).

Variants (each scan-chained inside ONE jit, per-iter = (t(N+1)-t(1))/N):
  fwd   — training-mode forward only (batch_stats threaded as the chain)
  loss  — forward + loss value (no grad)
  grad  — value_and_grad (params nudged by 1e-9*grad to chain iterations)
  full  — the production train step (grads + optimizer + EMA)

Usage: python scripts/bench_train_decomp.py [fwd|loss|grad|full] ...
Env: BENCH_CFG/BENCH_NC/BENCH_BATCH/BENCH_IMGSZ as bench_train_step.py.
"""

import os
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
from ecs_yolo_tpu.train.trainer import (
    create_train_state, make_loss_fn, make_train_step,
)

BATCH = int(os.environ.get("BENCH_BATCH", 16))
IMGSZ = int(os.environ.get("BENCH_IMGSZ", 640))
CFG = os.environ.get("BENCH_CFG", "resnet10.yaml")
NC = int(os.environ.get("BENCH_NC", 13))
ITERS = 5
HYP = dict(
    box=0.05, obj=1.0, cls=0.5, cls_pw=1.0, obj_pw=1.0, anchor_t=4.0,
    fl_gamma=0.0, label_smoothing=0.0, slide_ratio=0.0,
)

snn = SNNConfig(
    time_window=4,
    remat_neuron=os.environ.get("BENCH_REMAT", "0") == "1",
)
model = build_model(CFG, nc=NC, snn=snn)
variables = model.init(jax.random.PRNGKey(0), imgsz=64)
tx = build_optimizer(variables["params"], epochs=3, steps_per_epoch=10)
state = create_train_state(variables, tx)
loss_fn = make_loss_fn(model, HYP)

rng = np.random.RandomState(0)
targets = jnp.zeros((BATCH, 8, 5), jnp.float32).at[:, 0].set(
    jnp.asarray([1, 0.5, 0.5, 0.3, 0.3]))
t_mask = jnp.zeros((BATCH, 8), bool).at[:, 0].set(True)
xstack = jnp.asarray(rng.rand(ITERS, BATCH, IMGSZ, IMGSZ, 3), jnp.float32)

CD = jnp.bfloat16


def cast_params(p):
    return jax.tree_util.tree_map(
        lambda v: v.astype(CD) if v.dtype == jnp.float32 else v, p)


def fwd_losses(params, batch_stats, x):
    out, upd = model.module.apply(
        {"params": cast_params(params), "batch_stats": batch_stats},
        x.astype(CD), training=True, mutable=["batch_stats"])
    out32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and a.dtype == CD else a, out)
    return out, out32, upd["batch_stats"]


def bench(label, chained, init_carry):
    # protocol of scripts/bench_train_step.py: per trip count, one call to
    # compile, a second (warm) call for the timed run; per-iter =
    # (t_warm(N+1) - t_warm(1)) / N
    times = {}
    for k in (1, ITERS + 1):
        xsk = jnp.concatenate([xstack] * ((k + ITERS - 1) // ITERS))[:k]
        t0 = time.perf_counter()
        jax.block_until_ready(chained(init_carry, xsk))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(chained(init_carry, xsk))
        times[k] = time.perf_counter() - t0
        print(f"  {label} trip={k}: compile+run {tc:.2f}s warm {times[k]:.2f}s",
              flush=True)
    per = (times[ITERS + 1] - times[1]) / ITERS
    print(f"{label}: {per*1e3:.1f} ms/step = {BATCH/per:.1f} img/s", flush=True)


modes = sys.argv[1:] or ["fwd", "loss", "grad", "full"]

if "fwd" in modes:
    @jax.jit
    def chained_fwd(carry, xsk):
        def body(bs, x):
            out, _, bs2 = fwd_losses(state.params, bs, x)
            # reduce over the head outputs to a scalar dependency
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return bs2, s
        bs, ss = jax.lax.scan(body, carry, xsk)
        return ss
    print("compiling fwd...", flush=True)
    bench("fwd(train-mode)", chained_fwd, state.batch_stats)

if "loss" in modes:
    @jax.jit
    def chained_loss(carry, xsk):
        def body(bs, x):
            _, out32, bs2 = fwd_losses(state.params, bs, x)
            total, _ = loss_fn(out32, targets, t_mask)
            return bs2, total
        bs, ls = jax.lax.scan(body, carry, xsk)
        return ls
    print("compiling loss...", flush=True)
    bench("fwd+loss", chained_loss, state.batch_stats)

if "grad" in modes:
    @jax.jit
    def chained_grad(carry, xsk):
        def body(c, x):
            params, bs = c

            def lf(p):
                _, out32, bs2 = fwd_losses(p, bs, x)
                total, _ = loss_fn(out32, targets, t_mask)
                return total, bs2

            (total, bs2), g = jax.value_and_grad(lf, has_aux=True)(params)
            p2 = jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b, params, g)
            return (p2, bs2), total
        c, ls = jax.lax.scan(body, carry, xsk)
        return ls
    print("compiling grad...", flush=True)
    bench("fwd+loss+grad", chained_grad, (state.params, state.batch_stats))

if "full" in modes:
    raw = make_train_step(model, tx, HYP, compute_dtype=CD, jit=False)

    @jax.jit
    def chained_full(st, xsk):
        def body(st, x):
            st2, m = raw(st, x, targets, t_mask)
            return st2, m["loss"]
        st, losses = jax.lax.scan(body, st, xsk)
        return losses
    print("compiling full...", flush=True)
    bench("full step", chained_full, state)
