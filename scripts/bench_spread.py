"""TPU micro-benchmark: ECS spread-conv variants at one stem-sized site.

Round-1 data (docs/DESIGN.md): ECS scan w/ dw3x3+pw1x1 spread = 32.0 ms at
[4,16,320,320,64] bf16; the recurrence (not the conv stack) dominates the
full model.  Hypothesis for round 2: composing the depthwise 3x3 and the
pointwise 1x1 into ONE dense 3x3 conv (W[o,i,ky,kx] = pw[o,i]*dw[i,ky,kx],
exactly equivalent) removes one kernel launch AND one full feature-map HBM
round-trip per scan step — in a memory-bound regime that should beat the
9x FLOP increase (64ch dense 3x3 is tiny for the MXU).

Run:  python scripts/bench_spread.py   (on the TPU; one experiment per run)
"""

import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

T, N, H, W, C = 4, 16, 320, 320, 64
DTYPE = jnp.bfloat16
DECAY, THRESH, LENS, ALPHA, BETA, TAU = 0.25, 0.5, 0.5, 0.75, 0.25, 5.0

rng = np.random.RandomState(0)
x_host = rng.rand(T, N, H, W, C).astype(np.float32)
dw_k = (rng.rand(3, 3, 1, C).astype(np.float32) - 0.5) * 0.2
dw_b = (rng.rand(C).astype(np.float32) - 0.5) * 0.1
pw_k = (rng.rand(1, 1, C, C).astype(np.float32) - 0.5) * 0.05
pw_b = (rng.rand(C).astype(np.float32) - 0.5) * 0.1


def heaviside(u):
    return (u > THRESH).astype(u.dtype)


def scan_ecs(x, spread):
    leak = 1.0 - 1.0 / TAU

    def step(carry, x_t):
        mem_old, spike_prev, ecs = carry
        fecs = BETA * jnp.tanh(ecs)
        mem = mem_old * DECAY * (1.0 - lax.stop_gradient(spike_prev)) + x_t + fecs
        spike = heaviside(mem)
        ecs = ALPHA * spread(spike) + leak * ecs
        return (mem, spike, ecs), spike

    zeros = jnp.zeros_like(x[0])
    (_, _, _), spikes = lax.scan(step, (zeros, zeros, zeros), x, unroll=True)
    return spikes


def make_variant(kind):
    dwk = jnp.asarray(dw_k, DTYPE)
    dwb = jnp.asarray(dw_b, DTYPE)
    pwk = jnp.asarray(pw_k, DTYPE)
    pwb = jnp.asarray(pw_b, DTYPE)

    if kind == "baseline":  # dw3x3 + pw1x1, two convs per step
        def spread(s):
            d = lax.conv_general_dilated(
                s, dwk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C,
            ) + dwb
            return lax.conv_general_dilated(
                d, pwk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + pwb
    elif kind == "composed":  # one dense 3x3: W[ky,kx,i,o] = dw[ky,kx,i]*pw[i,o]
        wk = (dwk[:, :, 0, :, None] * pwk[0, 0]).astype(DTYPE)  # [3,3,C,C]
        wb = (dwb @ pwk[0, 0] + pwb).astype(DTYPE)

        def spread(s):
            return lax.conv_general_dilated(
                s, wk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + wb
    else:
        raise KeyError(kind)

    @jax.jit
    def fn(x):
        return scan_ecs(x, spread)

    return fn


def bench(fn, x, iters=10, warmup=2):
    for _ in range(warmup):
        fn(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1000


def main():
    x = jnp.asarray(x_host, DTYPE)
    base = make_variant("baseline")
    comp = make_variant("composed")

    # parity first (bf16 tolerance)
    yb = np.asarray(base(x), np.float32)
    yc = np.asarray(comp(x), np.float32)
    mismatch = float(np.mean(yb != yc))  # spikes are binary
    print(f"spike mismatch rate baseline vs composed: {mismatch:.6f}")

    tb = bench(base, x)
    tc = bench(comp, x)
    print(f"baseline (dw+pw, 2 convs/step): {tb:.2f} ms")
    print(f"composed (1 dense 3x3 /step):  {tc:.2f} ms   ({tb / tc:.2f}x)")


if __name__ == "__main__":
    main()
