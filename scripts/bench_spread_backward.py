"""Isolate the BACKWARD cost of the ECS spread convs at stem dims (round 3).

Training is ~3.8x inference; the backward of each spread site pays a
data-grad (conv-transpose) and a weight-grad conv.  TPU wgrad for grouped/
depthwise convs historically lowers poorly — if dw-wgrad is far off the
dense-wgrad cost, a custom_vjp spread (manual einsum wgrad) is a concrete
training lever.

Cases at [16, 320, 320, 64] bf16 (in-graph chained, ms/iter):
  fwd_dw / fwd_dense  — forward conv (baseline, matches bench_conv_isolation)
  vjp_dw / vjp_dense  — forward + full vjp (d_input AND d_kernel)
  wgrad-only derived  = vjp - fwd - dgrad(≈fwd cost for SAME 3x3)
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


def conv(x, k, groups=1):
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def bench(fn, x, iters=8):
    """fn: x -> x-like (dependent chaining defeats memoization/hoisting)."""

    def chained(x, n):
        return jnp.sum(
            lax.fori_loop(0, n, lambda i, a: fn(a), x).astype(jnp.float32)
        )

    run = jax.jit(chained, static_argnums=1)
    float(run(x, 1)); float(run(x, 1 + iters))
    t0 = time.perf_counter(); float(run(x, 1)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(x, 1 + iters))
    tn = time.perf_counter() - t0
    return (tn - t1) / iters * 1000


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    x = jnp.asarray(rng.rand(N, H, W, C), DT)

    def vjp_case(k, groups):
        def fn(a):
            def f(inp, kk):
                # NONLINEAR loss: a linear sum() makes the cotangent a
                # constant, letting XLA fold dgrad and reduce wgrad to a
                # window-sum — measured 2.5 ms for a "vjp" that never ran
                # the forward.  squaring forces a data-dependent cotangent.
                y = conv(inp, kk, groups)
                return jnp.sum(y.astype(jnp.float32) ** 2)

            gx, gk = jax.grad(f, argnums=(0, 1))(a, k.astype(DT))
            # fold kernel grad back into the chain so neither grad is DCE'd
            return (gx.astype(DT) * DT(0.01) + a * DT(0.5)
                    + jnp.sum(gk.astype(jnp.float32)).astype(DT))

        return fn

    cases = {
        "fwd_dw": lambda a: conv(a, dwk, groups=C) * DT(0.1) + a * DT(0.5),
        "fwd_dense": lambda a: conv(a, dk64) * DT(0.1) + a * DT(0.5),
        "vjp_dw": vjp_case(dwk, C),
        "vjp_dense": vjp_case(dk64, 1),
    }
    for name, fn in cases.items():
        if which != "all" and which != name:
            continue
        t = bench(fn, x)
        print(f"{name:>10s}: {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
