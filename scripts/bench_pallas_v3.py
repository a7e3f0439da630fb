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


def bench(fn, iters=8):
    """In-graph timing: chain `iters` dependent executions inside ONE jit
    call and force completion with a scalar transfer.  Host-side per-call
    timing through the axon tunnel is unreliable (block_until_ready returns
    on enqueue-ack; identical remote calls get memoized)."""

    def chained(x, n):
        def body(i, x):
            y = fn(x)
            return y * jnp.bfloat16(0.5) + x * jnp.bfloat16(0.25)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    run1 = jax.jit(chained, static_argnums=1)
    # warm both trip counts' compiles, then time
    float(run1(x, 1)); float(run1(x, 1 + iters))
    t0 = time.perf_counter(); float(run1(x, 1)); t_1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run1(x, 1 + iters)); t_n = time.perf_counter() - t0
    return (t_n - t_1) / iters * 1000


def main():
    import sys

    mode = sys.argv[1] if len(sys.argv) > 1 else "compare"
    if mode == "compare":
        ya = np.asarray(xla_fn(x), np.float32)
        yp = np.asarray(pallas_fn(x), np.float32)
        print(f"spike mismatch: {(ya != yp).mean():.6f}")
        ta = bench(xla_fn)
        tp = bench(pallas_fn)
        print(f"XLA scan:      {ta:.2f} ms")
        print(f"Pallas v3:     {tp:.2f} ms   ({ta / tp:.2f}x)")
    elif mode == "ablate":
        for ab in ("copyonly", "nospread", "nopw", "nodw", ""):
            fn = lambda x, ab=ab: ecs_lif_pallas(
                x, dwk, dwb, pwk, pwb, cfg, act=False, ablate=ab)
            t = bench(fn)
            print(f"ablate={ab or 'full':<10s}: {t:7.2f} ms", flush=True)
    elif mode == "parts":
        # decompose the XLA-scan cost structure with trustworthy timing
        from ecs_yolo_tpu.snn.neuron import lif_scan

        def elementwise(x):
            return x * jnp.bfloat16(0.7) + jnp.bfloat16(0.1)

        def spread4(x):  # 4 independent dw+pw conv pairs (no recurrence)
            return jnp.stack([spread(x[t]) for t in range(T)])

        def dw4(x):
            return jnp.stack([
                jax.lax.conv_general_dilated(
                    x[t], dwk, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=C) + dwb
                for t in range(T)
            ])

        def lif(x):
            return lif_scan(x, cfg, act=False)

        for name, fn in [("elementwise", elementwise), ("dw4", dw4),
                         ("spread4", spread4), ("plain-lif", lif),
                         ("ecs-scan", lambda x: ecs_lif_scan(
                             x, spread, cfg, act=False))]:
            t = bench(fn)
            print(f"{name:<12s}: {t:7.2f} ms", flush=True)
    elif mode == "composite":
        # rank-1 composite 3x3 conv (MXU) vs depthwise+pointwise (VPU-bound)
        comp = (dwk.reshape(3, 3, C, 1) * pwk.reshape(1, 1, C, C)).astype(DT)
        cbias = (dwb.reshape(1, C) @ pwk.reshape(C, C) + pwb).reshape(C)

        def cspread(s):
            return jax.lax.conv_general_dilated(
                s, comp, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + cbias

        def cspread4(x):
            return jnp.stack([cspread(x[t]) for t in range(T)])

        def ecs_comp(x):
            return ecs_lif_scan(x, cspread, cfg, act=False)

        # numerical sanity vs the two-conv spread
        a = np.asarray(spread(x[0]), np.float32)
        b = np.asarray(cspread(x[0]), np.float32)
        print(f"composite max|diff| {np.abs(a - b).max():.3e}")
        for name, fn in [("cspread4", cspread4), ("ecs-composite", ecs_comp)]:
            t = bench(fn)
            print(f"{name:<13s}: {t:7.2f} ms", flush=True)
    elif mode == "shift":
        # depthwise 3x3 as 9 fused shift-multiply-adds (pure elementwise,
        # XLA-fusable) vs the conv lowering — re-test with in-graph timing
        # (round-1 rejected it on host-timed full-model numbers)
        dwk9 = dwk.reshape(3, 3, C)

        def dw_shift(s):
            p = jnp.pad(s, ((0, 0), (1, 1), (1, 1), (0, 0)))
            H_ = s.shape[1]
            W_ = s.shape[2]
            acc = None
            for dy in range(3):
                for dx in range(3):
                    term = p[:, dy:dy + H_, dx:dx + W_, :] * dwk9[dy, dx]
                    acc = term if acc is None else acc + term
            return acc + dwb

        def spread_shift(s):
            return jax.lax.conv_general_dilated(
                dw_shift(s), pwk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + pwb

        a = np.asarray(spread(x[0]), np.float32)
        b = np.asarray(spread_shift(x[0]), np.float32)
        print(f"shift max|diff| {np.abs(a - b).max():.3e}")

        def dw4s(x):
            return jnp.stack([dw_shift(x[t]) for t in range(T)])

        def ecs_shift(x):
            return ecs_lif_scan(x, spread_shift, cfg, act=False)

        for name, fn in [("dw4-shift", dw4s), ("ecs-shift", ecs_shift)]:
            t = bench(fn)
            print(f"{name:<10s}: {t:7.2f} ms", flush=True)
    elif mode == "bw":
        # platform HBM roof probes: XLA copy / scaled copy at 840 MB
        def xla_copy(x):
            return x * jnp.bfloat16(1.0000305)  # non-identity, 1R+1W

        def xla_sum(x):
            # read-only reduce: 1R
            return jnp.zeros_like(x) + jnp.sum(
                x.astype(jnp.float32)
            ).astype(x.dtype)

        gb = x.size * x.dtype.itemsize / 1e9
        for name, fn, passes in [("copy(R+W)", xla_copy, 2),
                                 ("sum(R)", xla_sum, 1 + 1)]:
            t = bench(fn)
            print(f"{name:<10s}: {t:7.2f} ms  -> {gb * passes / (t / 1e3):.0f} GB/s",
                  flush=True)
    elif mode == "rb":
        for rb in (8, 10, 16, 20, 32, 40):
            try:
                fn = lambda x, rb=rb: ecs_lif_pallas(
                    x, dwk, dwb, pwk, pwb, cfg, act=False, rb_override=rb)
                t = bench(fn)
                print(f"rb={rb:<3d}: {t:7.2f} ms", flush=True)
            except Exception as e:
                print(f"rb={rb:<3d}: FAIL {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
