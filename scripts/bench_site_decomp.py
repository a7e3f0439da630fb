"""Attribute the stage-1 backward op-by-op (round 4, VERDICT item 3).

The prefix probes localize 73% of the res10@640 b16 backward to
stem+BasicBlock_2 (165 ms grad vs 45 ms fwd), but the HLO's own traffic
accounting (~9 GB of materialized outputs) predicts ~30-50 ms — the
execution is several x off roofline and the freeze deltas don't decompose
linearly.  This script measures each stage-1 SITE in isolation at the exact
production shapes/layouts so the 165 ms can be reconstructed bottom-up:

  act1   ECS MemUpdate, packed=2, x [4,16,320,160,128]   (320px, T=4)
  act2   ECS MemUpdate, packed=2, x [4,16,160,80,128]    (160px, T=4)
  conv1  SnnConv 3x3 s2 packed->packed, 64->64 @320px
  conv2  SnnConv 3x3 s1 packed->packed, 64->64 @160px
  bn     TBatchNorm packed @ conv1 output [4,16,160,80,128]
  pool   max_pool_t_packed(x, 2, 2) @320px (the shortcut)
  stem   Conv_1 7x7 s2 3->64 packed entry @640px, T=1 (dedup) + BN

For each site: fwd-only and value_and_grad of sum(out^2) w.r.t. params AND
input (the in-situ backward computes the input cotangent chain).  In-graph
scan chaining, same protocol as bench_bwd_prefix.

Usage (TPU): python scripts/bench_site_decomp.py [site ...]
Env: BENCH_GRAD=0 for fwd-only, BENCH_BNVJP=1 for the custom BN backward.
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

B = 16
GRAD = os.environ.get("BENCH_GRAD", "1") == "1"
ITERS = 5
CD = jnp.bfloat16

SNN = SNNConfig(
    time_window=4,
    bn_custom_vjp=os.environ.get("BENCH_BNVJP", "0") == "1",
)


def sites():
    from ecs_yolo_tpu.nn.blocks import (
        MemUpdate,
        SnnConv,
        TBatchNorm,
        max_pool_t_packed,
    )
    import flax.linen as nn

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x, training=True):
            y = SnnConv(64, 7, 2, packed_in=1, packed_out=2, name="conv")(x)
            return TBatchNorm(1.0, SNN, packed=2, name="bn")(y, training)

    class PoolM(nn.Module):
        @nn.compact
        def __call__(self, x, training=True):
            return max_pool_t_packed(x, 2, 2)

    class ConvM(nn.Module):
        s: int

        @nn.compact
        def __call__(self, x, training=True):
            return SnnConv(64, 3, self.s, 1, packed_in=2, packed_out=2,
                           name="conv")(x)

    class ActM(nn.Module):
        @nn.compact
        def __call__(self, x, training=True):
            return MemUpdate(act=False, snn=SNN, packed=2, name="act")(
                x, training)

    class ActU(nn.Module):
        """UNPACKED ECS site (C>64 stages run the plain dw3x3+pw1x1
        spread) — quantifies the remaining dw-conv opportunity (round 5)."""

        @nn.compact
        def __call__(self, x, training=True):
            return MemUpdate(act=False, snn=SNN, packed=1, name="act")(
                x, training)

    class BnM(nn.Module):
        @nn.compact
        def __call__(self, x, training=True):
            return TBatchNorm(1.0, SNN, packed=2, name="bn")(x, training)

    return {
        # name: (module ctor, input shape [T,N,H,Wp,fC])
        "act1": (lambda: ActM(), (4, B, 320, 160, 128)),
        "act2": (lambda: ActM(), (4, B, 160, 80, 128)),
        "conv1": (lambda: ConvM(s=2), (4, B, 320, 160, 128)),
        "conv2": (lambda: ConvM(s=1), (4, B, 160, 80, 128)),
        "bn": (lambda: BnM(), (4, B, 160, 80, 128)),
        "pool": (lambda: PoolM(), (4, B, 320, 160, 128)),
        "stem": (lambda: Stem(), (1, B, 640, 640, 3)),
        # unpacked ECS sites of the C>=128 stages (res10@640 production
        # shapes; each Concat_res2 runs ~2 of these per block)
        "act3u": (lambda: ActU(), (4, B, 80, 80, 128)),
        "act4u": (lambda: ActU(), (4, B, 40, 40, 256)),
        "act5u": (lambda: ActU(), (4, B, 20, 20, 512)),
    }


def bench_site(name):
    ctor, shape = sites()[name]
    module = ctor()
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(*shape) - 0.2, CD)
    variables = module.init(
        jax.random.PRNGKey(0), x0.astype(jnp.float32), training=True
    )
    params = variables.get("params", {})
    bstats = variables.get("batch_stats", {})

    def cast(p):
        return jax.tree_util.tree_map(
            lambda v: v.astype(CD) if v.dtype == jnp.float32 else v, p)

    def forward(p, bs, x):
        out, upd = module.apply(
            {"params": cast(p), "batch_stats": bs}, x, training=True,
            mutable=["batch_stats", "spike_stats"])
        s = jnp.sum(jnp.square(out.astype(jnp.float32)))
        return s, upd.get("batch_stats", bs)

    # iteration inputs are derived IN-GRAPH (x0 * (1 + i*1e-4)): a host-side
    # stack of N full-size activations OOMs the chip at the 320px shapes
    if GRAD:
        @jax.jit
        def chained(carry, x0, scales):
            def body(c, sc):
                p, bs = c
                (s, bs2), g = jax.value_and_grad(
                    forward, argnums=(0, 2), has_aux=True)(p, bs, x0 * sc)
                gp, gx = g
                p2 = jax.tree_util.tree_map(
                    lambda a, b: a - 1e-9 * b.astype(a.dtype), p, gp)
                return (p2, bs2), s + jnp.sum(gx.astype(jnp.float32)[:1, :1])
            c, ss = jax.lax.scan(body, carry, scales)
            return ss
        label = f"{name} grad"
    else:
        @jax.jit
        def chained(carry, x0, scales):
            def body(bs, sc):
                s, bs2 = forward(params, bs, x0 * sc)
                return bs2, s
            bs, ss = jax.lax.scan(body, carry, scales)
            return ss
        label = f"{name} fwd"

    carry = (params, bstats) if GRAD else bstats

    def run(x, scales):
        return float(np.asarray(chained(carry, x, scales)).sum())

    times = {}
    for n in (1, ITERS + 1):
        # distinct values per call — the remote-exec layer memoizes
        scs = [jnp.linspace(1.0, 1.0 + 1e-3 * j, n).astype(CD)
               for j in (1, 2)]
        t0 = time.perf_counter()
        run(x0, scs[0])
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(x0, scs[1])
        times[n] = time.perf_counter() - t0
        print(f"  {label} trip={n}: compile+run {tc:.1f}s warm {times[n]:.3f}s",
              flush=True)
    per = (times[ITERS + 1] - times[1]) / ITERS
    print(f"{label}: {per * 1e3:.1f} ms", flush=True)
    return per


if __name__ == "__main__":
    names = sys.argv[1:] or ["act1", "conv1", "bn", "pool", "stem", "act2",
                             "conv2"]
    results = {}
    for n in names:
        results[n] = bench_site(n)
    print({k: round(v * 1e3, 1) for k, v in results.items()}, flush=True)
