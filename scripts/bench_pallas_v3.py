"""TPU micro-benchmark: fused Pallas v3 ECS kernel vs the XLA scan.

Stem-sized site [4,16,320,320,64] bf16 — round-1 XLA baseline: 32.0 ms.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.snn.neuron import ecs_lif_scan
from ecs_yolo_tpu.snn.pallas_ecs_v3 import ecs_lif_pallas

cfg = SNNConfig(time_window=4)
T, N, H, W, C = 4, 16, 320, 320, 64
DT = jnp.bfloat16

rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(T, N, H, W, C), DT)
dwk = jnp.asarray((rng.rand(3, 3, 1, C) - 0.5) * 0.2, DT)
dwb = jnp.asarray((rng.rand(C) - 0.5) * 0.1, DT)
pwk = jnp.asarray((rng.rand(1, 1, C, C) - 0.5) * 0.05, DT)
pwb = jnp.asarray((rng.rand(C) - 0.5) * 0.1, DT)


def spread(s):
    d = jax.lax.conv_general_dilated(
        s, dwk, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    ) + dwb
    return jax.lax.conv_general_dilated(
        d, pwk, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + pwb


@jax.jit
def xla_fn(x):
    return ecs_lif_scan(x, spread, cfg, act=False)


def pallas_fn(x):
    return ecs_lif_pallas(x, dwk, dwb, pwk, pwb, cfg, act=False)


def bench(fn, iters=10, warmup=2):
    for _ in range(warmup):
        fn(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1000


def main():
    ya = np.asarray(xla_fn(x), np.float32)
    yp = np.asarray(pallas_fn(x), np.float32)
    print(f"spike mismatch: {(ya != yp).mean():.6f}")
    ta = bench(xla_fn)
    tp = bench(pallas_fn)
    print(f"XLA scan:      {ta:.2f} ms")
    print(f"Pallas v3:     {tp:.2f} ms   ({ta / tp:.2f}x)")


if __name__ == "__main__":
    main()
