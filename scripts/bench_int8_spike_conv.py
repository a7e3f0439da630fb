"""Does XLA:TPU fuse an int8->bf16 convert into conv operands? (round 4)

Spikes are binary but travel as bf16 (2 B/elt).  If a conv can read an
int8 spike tensor with the dequant convert fused into its input pipeline,
every spike-consuming conv (fwd) and its wgrad (bwd) halves its activation
read traffic — the VERDICT r3 item-3 lever.  If XLA instead materializes
a bf16 copy, the int8 form costs an extra pass and the idea is dead.

Cases at stem-stage dims [T*N, H, W, C] = [64, 320, 320, 64] bf16/int8:
  conv_bf16      — baseline: conv3x3 64->64, bf16 input
  conv_i8        — same conv, input stored int8, .astype(bf16) at the call
  wgrad_bf16     — d/dW of the conv, bf16 saved activations
  wgrad_i8       — d/dW with int8 saved activations (custom residual)
  ew_bf16/ew_i8  — elementwise read floor for each dtype (traffic bound)

Usage (TPU): python scripts/bench_int8_spike_conv.py [case ...]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

import jax

if os.environ.get("BENCH_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax import lax

N = int(os.environ.get("BENCH_N", 64))
H = W = int(os.environ.get("BENCH_HW", 320))
C = int(os.environ.get("BENCH_C", 64))
DT = jnp.bfloat16
rng = np.random.RandomState(0)

spikes_f = jnp.asarray(rng.rand(N, H, W, C) < 0.2, DT)
spikes_i8 = spikes_f.astype(jnp.int8)
kern = jnp.asarray((rng.rand(3, 3, C, C) - 0.5) * 0.05, DT)
DN = ("NHWC", "HWIO", "NHWC")


def conv(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=DN)


def bench(fn, x, iters=6):
    """In-graph fori_loop chaining with a DATA-DEPENDENT perturbation so
    iterations can't collapse; scalar-transfer fence (bench_pallas_v3)."""

    def chained(x0, n):
        def body(i, c):
            x_i, acc = c
            y = fn(x_i)
            acc = acc + jnp.sum(y.astype(jnp.float32))
            # perturb the input so the next iter differs (keeps dtype)
            if x_i.dtype == jnp.int8:
                x_i = (x_i + jnp.int8(1)) % jnp.int8(2)
            else:
                x_i = (x_i + DT(1.0)) % DT(2.0)
            return (x_i, acc)

        _, acc = lax.fori_loop(0, n, body, (x0, jnp.float32(0.0)))
        return acc

    run = jax.jit(chained, static_argnums=1)
    float(run(x, 1)); float(run(x, 1 + iters))
    t0 = time.perf_counter(); float(run(x, 1)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(x, 1 + iters)); tn = time.perf_counter() - t0
    return (tn - t1) / iters * 1e3


def wgrad_fn(dtype_i8):
    """grad w.r.t. the KERNEL with the activation saved in each dtype.
    Both variants pay the same fwd conv + nonlinear cotangent; the i8-vs-
    bf16 DIFFERENCE isolates the saved-activation read."""
    x_saved = spikes_i8 if dtype_i8 else spikes_f

    def f(xs):
        def loss(k):
            x = xs.astype(DT) if xs.dtype == jnp.int8 else xs
            y = conv(x, k)
            return jnp.sum(jnp.square(y.astype(jnp.float32)))

        return jax.grad(loss)(kern)

    return f, x_saved


CASES = {
    "conv_bf16": (lambda x: conv(x, kern), spikes_f),
    "conv_i8": (lambda x: conv(x.astype(DT), kern), spikes_i8),
    "ew_bf16": (lambda x: x * DT(0.5) + DT(0.1), spikes_f),
    "ew_i8": (lambda x: x.astype(DT) * DT(0.5) + DT(0.1), spikes_i8),
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["ew_bf16", "ew_i8", "conv_bf16", "conv_i8",
                             "wgrad_bf16", "wgrad_i8"]
    for name in names:
        if name.startswith("wgrad"):
            fn, x = wgrad_fn(name.endswith("i8"))
        else:
            fn, x = CASES[name]
        ms = bench(fn, x)
        print(f"{name}: {ms:.2f} ms", flush=True)
