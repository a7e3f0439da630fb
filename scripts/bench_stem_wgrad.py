"""Isolate the stem-conv WGRAD cost and validate the thin-Cin dot rewrite.

Round-4 findings (res10@640 b16, in-graph):
* prefix decomposition: freezing the stem removes ~40 ms from the 120 ms
  stage-1 backward (scripts/bench_bwd_prefix.py BENCH_FREEZE_STEM=1);
* the UNPACKED 7x7/s2 Cin=3 wgrad in isolation is ~5 ms — the pathology
  lives at the PRODUCTION shape: the packed stem entry, kernel (7,9,3,128)
  strides (2,4) (snn/packed_spread.pack_stem_kernel);
* lax.conv_general_dilated_patches is itself a thin-Cin conv (identity
  kernel) and measured 53 ms — the production rewrite in nn/thin_conv.py
  uses kh*kw strided slices + one per-sample batched dot instead.

Cases (bf16):
  parity           — grad equivalence vs XLA at small dims
  fwd / grad_xla / grad_dot           — unpacked [16,640,640,3] 7x7/s2 ->64
  fwdp / gradp_xla / gradp_dot        — PRODUCTION packed (7,9,3,128)/(2,4)

Usage (TPU): python scripts/bench_stem_wgrad.py [case ...]
"""

import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("BENCH_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax import lax

from ecs_yolo_tpu.nn.thin_conv import conv_thin

B = int(os.environ.get("BENCH_BATCH", 16))
SZ = int(os.environ.get("BENCH_IMGSZ", 640))
DT = jnp.bfloat16
DN = ("NHWC", "HWIO", "NHWC")

rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.rand(B, SZ, SZ, 3), DT)

SHAPES = {
    # (kernel shape, strides, padding)
    "unpacked": ((7, 7, 3, 64), (2, 2), ((3, 3), (3, 3))),
    "packed": ((7, 9, 3, 128), (2, 4), ((3, 3), (3, 2))),
}
KERNS = {
    n: jnp.asarray((rng.rand(*ks) - 0.5) * 0.1, DT)
    for n, (ks, _, _) in SHAPES.items()
}


def conv_ref(x, k, strides, padding):
    return lax.conv_general_dilated(
        x, k, strides, padding, dimension_numbers=DN)


def bench(fn, iters=6):
    def chained(x, n):
        def body(i, c):
            x_i, acc = c
            y = fn(x_i)
            acc = acc + jnp.sum(y.astype(jnp.float32))
            return (x_i * DT(0.999) + DT(1e-3), acc)

        _, acc = lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))
        return acc

    run = jax.jit(chained, static_argnums=1)
    float(run(x0, 1)); float(run(x0, 1 + iters))
    # median of 3 trips per count: remote variance through the tunnel is
    # large enough to produce negative differences on single shots
    def t_of(n, j):
        t0 = time.perf_counter()
        float(run(x0 * DT(1.0 + 1e-3 * j), n))
        return time.perf_counter() - t0

    t1 = np.median([t_of(1, j) for j in (1, 2, 3)])
    tn = np.median([t_of(1 + iters, j) for j in (4, 5, 6)])
    return (tn - t1) / iters * 1e3


def grad_fn(impl, variant):
    ks, strides, padding = SHAPES[variant]
    k0 = KERNS[variant]

    def f(x):
        def loss(k):
            if impl == "dot":
                y = conv_thin(x, k, strides, padding)
            else:
                y = conv_ref(x, k, strides, padding)
            return jnp.sum(jnp.square(y.astype(jnp.float32)))

        return jax.grad(loss)(k0)

    return f


if __name__ == "__main__":
    modes = sys.argv[1:] or ["parity", "gradp_xla", "gradp_dot",
                             "grad_xla", "grad_dot"]
    if "parity" in modes:
        for variant in ("unpacked", "packed"):
            ks, strides, padding = SHAPES[variant]
            xs = x0[:2, :128, :128].astype(jnp.float32)
            k0 = KERNS[variant].astype(jnp.float32)

            def loss(k, impl):
                y = (conv_thin(xs, k, strides, padding) if impl == "dot"
                     else conv_ref(xs, k, strides, padding))
                return jnp.sum(jnp.sin(y))

            d1 = jax.grad(partial(loss, impl="xla"))(k0)
            d2 = jax.grad(partial(loss, impl="dot"))(k0)
            err = float(jnp.max(jnp.abs(d1 - d2)))
            rel = err / float(jnp.max(jnp.abs(d1)))
            print(f"parity[{variant}]: max abs {err:.3e} rel {rel:.3e}",
                  flush=True)
    for mode in modes:
        if mode == "parity":
            continue
        variant = "packed" if mode.startswith(("fwdp", "gradp")) else "unpacked"
        ks, strides, padding = SHAPES[variant]
        if mode.startswith("fwd"):
            fn = lambda x: conv_ref(x, KERNS[variant], strides, padding)
        else:
            fn = grad_fn("dot" if mode.endswith("dot") else "xla", variant)
        print(f"{mode}: {bench(fn):.2f} ms", flush=True)
