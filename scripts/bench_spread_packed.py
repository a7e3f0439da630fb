"""Width-packed ECS spread conv experiment (round 3).

Hypothesis: the C=64 depthwise spread conv is 3.7x off its traffic bound
because XLA expands grouped convs to dense and C=64 fills only half the
128-lane MXU width.  Packing f=128//C width-phases into channels via a FREE
row-major reshape [*, W, C] -> [*, W/f, f*C] (w = f*w2 + q  =>  cc = q*C + c)
turns the dw3x3(+pw1x1) into ONE dense [3,3,fC,fC] conv at W/f spatial with
full lane utilization — same expanded-FLOP count, ~2x better MXU shapes, and
the pointwise pass folded in for free.  The whole ECS scan runs in packed
layout (elementwise ops are layout-invariant), so pack/unpack are reshapes.

Modes:
  cpu   — exactness check vs the baseline dw+pw on small fp32 dims
  tpu   — in-graph timing at the stem site [4,16,320,320,64] bf16
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.snn.neuron import ecs_lif_scan


def pack_spread_kernel(dw_k, dw_b, pw_k, pw_b, f):
    """Fold dw[3,3,1,C] + pw[1,1,C,C] into one packed dense kernel
    [3, 3, f*C, f*C] acting on the blocked width-packed layout
    packed[..., w2, q*C + c] = x[..., f*w2 + q, c].

    Returns (K_p, bias_p) in fp32.
    """
    dw_k = np.asarray(dw_k, np.float64)[:, :, 0, :]  # [3,3,C]
    pw = np.asarray(pw_k, np.float64)[0, 0]          # [C,C] (ci,co)
    C = dw_k.shape[-1]
    full = dw_k[:, :, :, None] * pw[None, None]      # [3,3,ci,co]
    bias = np.asarray(dw_b, np.float64) @ pw + np.asarray(pw_b, np.float64)

    K = np.zeros((3, 3, f * C, f * C))
    for q in range(f):           # output phase
        for dx in (-1, 0, 1):    # original-width tap
            qp = (q + dx) % f
            shift = (q + dx) // f if (q + dx) >= 0 else -1
            # (q+dx) in [-1, f] => shift in {-1, 0, +1}
            for dy in range(3):
                K[dy, shift + 1, qp * C:(qp + 1) * C, q * C:(q + 1) * C] += \
                    full[dy, dx + 1]
    bias_p = np.tile(bias, f)
    return K.astype(np.float32), bias_p.astype(np.float32)


def pack_w(x, f):
    """[..., W, C] -> [..., W//f, f*C] — a pure reshape (no data movement)."""
    *lead, W, C = x.shape
    return x.reshape(*lead, W // f, f * C)


def unpack_w(x, f):
    *lead, W2, fC = x.shape
    return x.reshape(*lead, W2 * f, fC // f)


def make_fns(T, N, H, W, C, dtype, cfg):
    rng = np.random.RandomState(0)
    dw_k = (rng.rand(3, 3, 1, C).astype(np.float32) - 0.5) * 0.2
    dw_b = (rng.rand(C).astype(np.float32) - 0.5) * 0.1
    pw_k = (rng.rand(1, 1, C, C).astype(np.float32) - 0.5) * 0.05
    pw_b = (rng.rand(C).astype(np.float32) - 0.5) * 0.1

    dwk = jnp.asarray(dw_k, dtype)
    dwb = jnp.asarray(dw_b, dtype)
    pwk = jnp.asarray(pw_k, dtype)
    pwb = jnp.asarray(pw_b, dtype)

    def spread_base(s):
        d = lax.conv_general_dilated(
            s, dwk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        ) + dwb
        return lax.conv_general_dilated(
            d, pwk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + pwb

    f = max(1, 128 // C)
    while W % f:
        f -= 1
    Kp_np, bp_np = pack_spread_kernel(dw_k, dw_b, pw_k, pw_b, f)
    Kp = jnp.asarray(Kp_np, dtype)
    bp = jnp.asarray(bp_np, dtype)

    def spread_packed(s):  # s is [N,H,W//f,f*C]
        return lax.conv_general_dilated(
            s, Kp, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bp

    @jax.jit
    def baseline(x):
        return ecs_lif_scan(x, spread_base, cfg, act=False)

    @jax.jit
    def packed(x):
        xp = pack_w(x, f)
        sp = ecs_lif_scan(xp, spread_packed, cfg, act=False)
        return unpack_w(sp, f)

    return baseline, packed, f


def bench(fn, x, iters=8):
    """In-graph timing (docs/DESIGN.md round-2): N dependent iterations
    inside one jit; per-iter = (t(N+1) - t(1)) / N."""

    def chained(x, n):
        def body(i, x):
            y = fn(x)
            return y * x.dtype.type(0.5) + x * x.dtype.type(0.25)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    run = jax.jit(chained, static_argnums=1)
    float(run(x, 1)); float(run(x, 1 + iters))
    t0 = time.perf_counter(); float(run(x, 1)); t_1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(x, 1 + iters)); t_n = time.perf_counter() - t0
    return (t_n - t_1) / iters * 1000


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    cfg = SNNConfig(time_window=4)

    if mode == "cpu":
        jax.config.update("jax_platforms", "cpu")
        for T, N, H, W, C in [(3, 2, 8, 12, 4), (4, 2, 6, 10, 64),
                              (4, 1, 5, 16, 32), (2, 2, 7, 20, 8)]:
            baseline, packed, f = make_fns(T, N, H, W, C, jnp.float32, cfg)
            x = jnp.asarray(
                np.random.RandomState(1).randn(T, N, H, W, C), jnp.float32)
            yb = np.asarray(baseline(x))
            yp = np.asarray(packed(x))
            mism = (yb != yp).mean()
            print(f"C={C:3d} W={W:3d} f={f:2d}  spike mismatch: {mism:.6f}")
            assert mism < 0.01, "packed spread is NOT equivalent"
        print("CPU exactness: OK")
    else:
        # one experiment per run: `tpu baseline` | `tpu packed`
        which = sys.argv[2] if len(sys.argv) > 2 else "packed"
        T, N, H, W, C = 4, 16, 320, 320, 64
        baseline, packed, f = make_fns(T, N, H, W, C, jnp.bfloat16, cfg)
        x = jnp.asarray(
            np.random.RandomState(1).rand(T, N, H, W, C), jnp.bfloat16)
        fn = {"baseline": baseline, "packed": packed}[which]
        t = bench(fn, x, iters=6)
        print(f"{which:>8s} scan [4,16,320,320,64] bf16: {t:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
