"""Isolate the spread-conv cost outside the scan (round 3).

Measures, at stem-site dims, the standalone per-call cost of:
  dw        — grouped depthwise 3x3, [16,320,320,64]
  dense64   — dense 3x3 64->64, [16,320,320,64]
  packed128 — dense 3x3 128->128 over the width-packed [16,320,160,128]
  pw        — pointwise 1x1 64->64
  copy      — elementwise scale (traffic floor: read+write once)

If dw ~= dense64 ~= packed128 >> copy*~2.2 (the 9-tap re-read bound), the
conv emitter is input-re-read bound and lane packing cannot help; the
remaining lever is a halo-reusing kernel.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N, H, W, C = 16, 320, 320, 64
DT = jnp.bfloat16
rng = np.random.RandomState(0)
dwk = jnp.asarray((rng.rand(3, 3, 1, C) - 0.5) * 0.2, DT)
dk64 = jnp.asarray((rng.rand(3, 3, C, C) - 0.5) * 0.05, DT)
dk128 = jnp.asarray((rng.rand(3, 3, 2 * C, 2 * C) - 0.5) * 0.05, DT)
pwk = jnp.asarray((rng.rand(1, 1, C, C) - 0.5) * 0.05, DT)


def bench(fn, x, iters=10):
    def chained(x, n):
        def body(i, x):
            y = fn(x)
            return y * x.dtype.type(0.5) + x * x.dtype.type(0.25)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    run = jax.jit(chained, static_argnums=1)
    float(run(x, 1)); float(run(x, 1 + iters))
    t0 = time.perf_counter(); float(run(x, 1)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(x, 1 + iters)); tn = time.perf_counter() - t0
    return (tn - t1) / iters * 1000


def conv(x, k, groups=1):
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    x = jnp.asarray(rng.rand(N, H, W, C), DT)
    xp = x.reshape(N, H, W // 2, 2 * C)
    cases = {
        "copy": (lambda a: a * DT(0.7), x),
        "dw": (lambda a: conv(a, dwk, groups=C), x),
        "dense64": (lambda a: conv(a, dk64), x),
        "packed128": (lambda a: conv(a, dk128), xp),
        "pw": (lambda a: conv(a, pwk), x),
    }
    for name, (fn, inp) in cases.items():
        if which != "all" and which != name:
            continue
        t = bench(fn, inp)
        print(f"{name:>10s}: {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
