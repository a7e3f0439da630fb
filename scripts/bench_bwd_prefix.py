"""Locate the backward excess by model prefix (round 4, VERDICT item 3).

Round-4 decomposition (scripts/bench_train_decomp.py, res10@640 b16 bf16
no-remat): fwd(train) 64.0 ms, fwd+loss+grad 226.9 ms, full 232.0 ms — the
backward(+loss) is 2.55x the forward.  This script benches value_and_grad
of sum(out^2) on backbone PREFIXES of resnet10 so the per-stage fwd:bwd
ratio is visible: a stage whose grad is >>3x its fwd is off-roofline in
the backward.

Each prefix becomes a standalone model (truncated backbone + a throwaway
Detect so build_model accepts it; the grad target is the raw feature map,
not the head).  In-graph scan chaining, same protocol as the decomp
script.

Usage (TPU): python scripts/bench_bwd_prefix.py [p0 p1 p2 p3 p4 ...]
Env: BENCH_BATCH (16) / BENCH_IMGSZ (640) / BENCH_GRAD (1; 0 = fwd only) /
BENCH_FREEZE_STEM (0; "1"/"all" = freeze all stem params, "conv" = freeze
only the stem conv kernel, "bn" = freeze only the stem BN scale/bias; the
deltas vs the unfrozen run pin WHICH stem-related backward op carries the
cost — the isolated stem wgrad measured only ~4 ms, so the 40 ms frozen-
stem delta needs a finer split) / BENCH_PACKED (1) and BENCH_DEDUP (1) to
toggle the packed_c64 / stem_dedup production knobs (bisects whether the
frozen-stem delta rides the packed layout or the T-dedup broadcast) /
BENCH_DUMP_HLO (path prefix; AOT-dumps the optimized HLO per prefix
instead of benching — for op-level attribution of the backward).
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
from ecs_yolo_tpu.models.yolo import build_model, load_cfg

BATCH = int(os.environ.get("BENCH_BATCH", 16))
IMGSZ = int(os.environ.get("BENCH_IMGSZ", 640))
GRAD = os.environ.get("BENCH_GRAD", "1") == "1"
FREEZE_STEM = os.environ.get("BENCH_FREEZE_STEM", "0")
if FREEZE_STEM == "1":
    FREEZE_STEM = "all"
ITERS = 5
CD = jnp.bfloat16

BASE = load_cfg("resnet10.yaml")


def prefix_cfg(k: int):
    """Backbone rows 0..k + a throwaway single-scale Detect head."""
    d = dict(BASE)
    d["backbone"] = [list(r) for r in BASE["backbone"][: k + 1]]
    d["head"] = [[[-1], 1, "Detect", ["nc", [[10, 14, 23, 27, 37, 58]]]]]
    return d


def bench_prefix(k: int):
    snn = SNNConfig(
        time_window=4,
        packed_c64=os.environ.get("BENCH_PACKED", "1") == "1",
        stem_dedup=os.environ.get("BENCH_DEDUP", "1") == "1",
        bn_custom_vjp=os.environ.get("BENCH_BNVJP", "0") == "1",
    )
    model = build_model(prefix_cfg(k), nc=13, snn=snn)
    variables = model.init(jax.random.PRNGKey(0), imgsz=64)
    params, bstats = variables["params"], variables["batch_stats"]

    def cast(p):
        return jax.tree_util.tree_map(
            lambda v: v.astype(CD) if v.dtype == jnp.float32 else v, p)

    # grad target: the BACKBONE feature map (last save or final), i.e. the
    # head conv contributes but its cost is one thin conv
    def forward(p, bs, x):
        out, upd = model.module.apply(
            {"params": cast(p), "batch_stats": bs},
            x.astype(CD), training=True, mutable=["batch_stats"])
        leaves = jax.tree_util.tree_leaves(out)
        # nonlinear target so the cotangent is input-dependent and XLA
        # cannot fold the dgrad away (round-3 lesson)
        s = sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)
        return s, upd["batch_stats"]

    rng = np.random.RandomState(0)
    xstack = jnp.asarray(
        rng.rand(ITERS, BATCH, IMGSZ, IMGSZ, 3), jnp.float32)

    if GRAD:
        if FREEZE_STEM != "0":
            stem = params["layers_0"]
            rest = {n: v for n, v in params.items() if n != "layers_0"}
            if FREEZE_STEM == "all":
                frozen_stem, live_stem = stem, {}
            elif FREEZE_STEM == "conv":
                frozen_stem = {"conv": stem["conv"]}
                live_stem = {"bn": stem["bn"]}
            elif FREEZE_STEM == "bn":
                frozen_stem = {"bn": stem["bn"]}
                live_stem = {"conv": stem["conv"]}
            else:
                raise SystemExit(f"bad BENCH_FREEZE_STEM {FREEZE_STEM}")
            live0 = dict(rest)
            if live_stem:
                live0["layers_0"] = live_stem

            def split_fwd(live, bs, x):
                live = dict(live)
                l0 = {**frozen_stem, **live.pop("layers_0", {})}
                return forward({**live, "layers_0": l0}, bs, x)
        else:
            live0 = params
            split_fwd = forward

        @jax.jit
        def chained(carry, xsk):
            def body(c, x):
                p, bs = c
                (s, bs2), g = jax.value_and_grad(
                    split_fwd, has_aux=True)(p, bs, x)
                p2 = jax.tree_util.tree_map(
                    lambda a, b: a - 1e-9 * b.astype(a.dtype), p, g)
                return (p2, bs2), s
            c, ss = jax.lax.scan(body, carry, xsk)
            return ss
        carry = (live0, bstats)
        label = f"p{k} grad" + (
            f" (stem {FREEZE_STEM} frozen)" if FREEZE_STEM != "0" else "")
    else:
        @jax.jit
        def chained(carry, xsk):
            def body(bs, x):
                s, bs2 = forward(params, bs, x)
                return bs2, s
            bs, ss = jax.lax.scan(body, carry, xsk)
            return ss
        carry = bstats
        label = f"p{k} fwd"

    dump = os.environ.get("BENCH_DUMP_HLO", "")
    if dump:
        compiled = chained.lower(carry, xstack[:1]).compile()
        path = f"{dump}_{label.replace(' ', '_')}.txt"
        Path(path).write_text(compiled.as_text())
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        print(f"{label}: HLO -> {path}  flops={ca.get('flops', 0):.3e} "
              f"bytes={ca.get('bytes accessed', 0):.3e}", flush=True)
        return 0.0

    def run(xsk):
        # force a SCALAR TRANSFER: through the axon tunnel
        # block_until_ready returns on enqueue-ack and identical calls get
        # memoized — float() of the result is the only reliable fence
        # (scripts/bench_pallas_v3.py bench)
        return float(np.asarray(chained(carry, xsk)).sum())

    times = {}
    for n in (1, ITERS + 1):
        # distinct input VALUES per call — the remote-exec layer memoizes
        # identical (executable, args) pairs (bench_train_step.py lesson)
        xs = [jnp.concatenate(
                  [xstack + jnp.float32(i * 1e-4)]
                  * ((n + ITERS - 1) // ITERS))[:n]
              for i in (1, 2)]
        t0 = time.perf_counter()
        run(xs[0])
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(xs[1])
        times[n] = time.perf_counter() - t0
        print(f"  {label} trip={n}: compile+run {tc:.1f}s warm {times[n]:.3f}s",
              flush=True)
    per = (times[ITERS + 1] - times[1]) / ITERS
    print(f"{label}: {per * 1e3:.1f} ms/step = {BATCH / per:.1f} img/s",
          flush=True)
    return per


if __name__ == "__main__":
    cuts = [int(a[1:]) for a in (sys.argv[1:] or ["p0", "p1", "p2", "p4"])]
    results = {}
    for k in cuts:
        results[k] = bench_prefix(k)
    print({k: round(v * 1e3, 1) for k, v in results.items()}, flush=True)
