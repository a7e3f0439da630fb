"""Pallas v4: int8-input depthwise-3x3 spread conv vs XLA (round 5).

Round-2 quantified the dw spread conv 3.7x off its HBM traffic bound; all
three bf16 Pallas formulations lost (docs/DESIGN.md).  Round-4's int8 spike
transport halves the input bytes — this prototype reads the binary spike
plane as int8 INSIDE a Pallas kernel (convert in-register), does the 9-tap
depthwise MAC on the VPU, and writes bf16.  Traffic target per element:
1 B read + 2 B write vs the XLA path's measured ~11 B.

Shapes = the UNPACKED ECS sites of res10@640 b16 (C>=128 stages; the C<=64
stage runs the packed dense composite instead).  Forward AND backward
(dgrad via the same kernel with flipped taps; wgrad left to XLA) timed
in-graph.

Usage (TPU): python scripts/bench_pallas_dw.py [site ...]
  sites: c128 (16,80,80,128)  c256 (16,40,40,256)  c512 (16,20,20,512)
Env: BENCH_CPU=1 (parity check on host), BENCH_GRAD=1 (time fwd+bwd pair).
"""

import functools
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: per-op cost at these shapes is 0.02-2 ms while one remote dispatch
#: through the axon tunnel costs ~25 ms — only hundreds of in-graph
#: iterations make the trip-difference method trustworthy (the first
#: 6-iter attempt produced negative times; docs/DESIGN.md round-5)
ITERS = int(os.environ.get("BENCH_ITERS", "400"))
INTERPRET = os.environ.get("BENCH_CPU", "0") == "1"

SITES = {
    "c128": (16, 80, 80, 128),
    "c256": (16, 40, 40, 256),
    "c512": (16, 20, 20, 512),
    # packed composite dense-spread dims (act1/act2 of the C<=64 stage):
    # ONE dense 3x3 128->128 conv replaces dw+pw there (snn/packed_spread)
    "act1": (16, 320, 160, 128),
    "act2": (16, 160, 80, 128),
}


def _dw3_kernel(s_ref, k_ref, b_ref, o_ref, *, H, W, C):
    s = s_ref[0].astype(jnp.float32)          # [H,W,C] int8 -> f32 in-reg
    k = k_ref[...].astype(jnp.float32)        # [3,3,C] (dw taps per lane)
    b = b_ref[...].astype(jnp.float32)        # [C]
    zrow = jnp.zeros((1, W, C), jnp.float32)
    zcol = jnp.zeros((H + 2, 1, C), jnp.float32)
    xp = jnp.concatenate([zrow, s, zrow], axis=0)
    xp = jnp.concatenate([zcol, xp, zcol], axis=1)
    acc = jnp.zeros((H, W, C), jnp.float32) + b
    for dy in range(3):
        for dx in range(3):
            acc = acc + xp[dy:dy + H, dx:dx + W, :] * k[dy, dx]
    o_ref[0] = acc.astype(o_ref.dtype)


def pallas_dw3(s8, k33c, bias, out_dtype=jnp.bfloat16):
    """Depthwise 3x3 'same' conv; s8 [N,H,W,C] int8, k33c [3,3,C], bias [C]."""
    N, H, W, C = s8.shape
    return pl.pallas_call(
        functools.partial(_dw3_kernel, H=H, W=W, C=C),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda n: (n, 0, 0, 0)),
            pl.BlockSpec((3, 3, C), lambda n: (0, 0, 0)),
            pl.BlockSpec((C,), lambda n: (0,)),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda n: (n, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W, C), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20
        ),
        interpret=INTERPRET,
    )(s8, k33c, bias)


def _dense3_kernel(up_ref, mid_ref, dn_ref, k_ref, b_ref, o_ref, *,
                   BH, W, C, nH):
    """Dense 3x3 'same' conv as an MXU matmul over im2col patches.

    Row-block gridding with the 3-spec halo trick: `up`/`dn` are the
    neighbouring row blocks (index maps clamp at the edges; the first/last
    halo rows are masked to zero via the program id)."""
    h = pl.program_id(1)
    top = jnp.where(h == 0,
                    jnp.zeros((1, W, C), jnp.bfloat16),
                    up_ref[0, BH - 1:BH].astype(jnp.bfloat16))
    bot = jnp.where(h == nH - 1,
                    jnp.zeros((1, W, C), jnp.bfloat16),
                    dn_ref[0, 0:1].astype(jnp.bfloat16))
    rows = jnp.concatenate(
        [top, mid_ref[0].astype(jnp.bfloat16), bot], axis=0
    )  # [BH+2, W, C]
    # ALIGNED column-shift buffers (Mosaic cannot concat vregs whose
    # offsets differ on a non-concat dim; concatenating along the SHIFTED
    # dim W produces aligned layouts — same trick as the round-2 v3
    # kernel's "3 column-shifted spike buffers")
    zc = jnp.zeros((BH + 2, 1, C), jnp.bfloat16)
    xr = jnp.concatenate([zc, rows[:, :-1, :]], axis=1)   # x[w-1]
    xl = jnp.concatenate([rows[:, 1:, :], zc], axis=1)    # x[w+1]
    parts = []
    for dy in range(3):
        for buf in (xr, rows, xl):   # dx = 0, 1, 2
            parts.append(buf[dy:dy + BH])
    patches = jnp.concatenate(parts, axis=-1).reshape(BH * W, 9 * C)
    acc = jnp.dot(patches, k_ref[...].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)  # [BH*W, C]
    acc = acc + b_ref[...].astype(jnp.float32)
    o_ref[0] = acc.reshape(BH, W, C).astype(o_ref.dtype)


def pallas_dense3(s8, k9c, bias, out_dtype=jnp.bfloat16, bh=16):
    """Dense 3x3 'same' conv; s8 [N,H,W,C] int8, k9c [9C,C], bias [C]."""
    N, H, W, C = s8.shape
    assert H % bh == 0, (H, bh)
    nH = H // bh
    return pl.pallas_call(
        functools.partial(_dense3_kernel, BH=bh, W=W, C=C, nH=nH),
        grid=(N, nH),
        in_specs=[
            pl.BlockSpec((1, bh, W, C),
                         lambda n, h: (n, jnp.maximum(h - 1, 0), 0, 0)),
            pl.BlockSpec((1, bh, W, C), lambda n, h: (n, h, 0, 0)),
            pl.BlockSpec((1, bh, W, C),
                         lambda n, h: (n, jnp.minimum(h + 1, nH - 1), 0, 0)),
            pl.BlockSpec((9 * C, C), lambda n, h: (0, 0)),
            pl.BlockSpec((C,), lambda n, h: (0,)),
        ],
        out_specs=pl.BlockSpec((1, bh, W, C), lambda n, h: (n, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W, C), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20
        ),
        interpret=INTERPRET,
    )(s8, s8, s8, k9c, bias)


def xla_dense3(s8, k, bias, dtype=jnp.bfloat16):
    """XLA dense 3x3 (the packed composite spread path); k [3,3,C,C]."""
    return lax.conv_general_dilated(
        s8.astype(dtype), k.astype(dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias.astype(dtype)


def xla_dw3(s8, k, bias, dtype=jnp.bfloat16):
    """The production path: int8 transported input, XLA depthwise conv."""
    C = s8.shape[-1]
    return lax.conv_general_dilated(
        s8.astype(dtype), k.astype(dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    ) + bias.astype(dtype)


def parity_check(shape):
    rng = np.random.RandomState(0)
    N, H, W, C = shape
    s = (rng.rand(N, H, W, C) > 0.7).astype(np.int8)
    k = ((rng.rand(3, 3, 1, C) - 0.5) * 0.2).astype(np.float32)
    b = ((rng.rand(C) - 0.5) * 0.1).astype(np.float32)
    ref = np.asarray(
        xla_dw3(jnp.asarray(s), jnp.asarray(k), jnp.asarray(b),
                jnp.float32))
    got = np.asarray(
        pallas_dw3(jnp.asarray(s), jnp.asarray(k).reshape(3, 3, C),
                   jnp.asarray(b), jnp.float32))
    err = np.abs(got - ref).max()
    print(f"parity {shape}: max abs err {err:.2e}")
    assert err < 1e-4, err


def bench(shape, name):
    rng = np.random.RandomState(0)
    N, H, W, C = shape
    dense = name.startswith("act")
    s0 = jnp.asarray((rng.rand(N, H, W, C) > 0.7), jnp.int8)
    if dense:
        kd = jnp.asarray((rng.rand(3, 3, C, C) - 0.5) * 0.05, jnp.bfloat16)
        k9 = kd.reshape(9 * C, C)
    else:
        k4 = jnp.asarray((rng.rand(3, 3, 1, C) - 0.5) * 0.2, jnp.bfloat16)
        k3 = k4.reshape(3, 3, C)
    b = jnp.asarray((rng.rand(C) - 0.5) * 0.1, jnp.bfloat16)

    def variant(kind):
        if dense:
            if kind == "xla":
                f = lambda s8: xla_dense3(s8, kd, b)
            else:
                f = lambda s8: pallas_dense3(s8, k9, b)
        elif kind == "xla":
            f = lambda s8: xla_dw3(s8, k4, b)
        else:
            f = lambda s8: pallas_dw3(s8, k3, b)

        @jax.jit
        def chained(s8, n):
            def body(i, carry):
                y = f(carry)
                # re-binarize so the loop stays int8-in (data dependence);
                # fixed threshold — a mean() would add a full extra read
                return (y > 0).astype(jnp.int8)

            return jnp.sum(
                lax.fori_loop(0, n, body, s8).astype(jnp.float32))

        times = {}
        for n in (1, ITERS + 1):
            t0 = time.perf_counter()
            float(chained(s0, n))
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(chained(s0, n))
            times[n] = time.perf_counter() - t0
            print(f"  {name}/{kind} trip={n}: compile+run {tc:.1f}s "
                  f"warm {times[n]:.4f}s", flush=True)
        dt = (times[ITERS + 1] - times[1]) / ITERS * 1000
        bytes_ideal = N * H * W * C * (1 + 2)  # int8 read + bf16 write
        print(f"  {name}/{kind}: {dt:.3f} ms  (traffic bound "
              f"{bytes_ideal / 819e9 * 1e3:.3f} ms)", flush=True)
        return dt

    t_x = variant("xla")
    t_p = variant("pallas")
    print(f"{name}: XLA {t_x:.3f} ms vs Pallas {t_p:.3f} ms "
          f"({t_x / max(t_p, 1e-9):.2f}x)", flush=True)


def bench_phase_spread(shape, name):
    """A/B the phase-aware Pallas packed spread (snn/pallas_dw) against the
    production composite conv at bf16/binary-input production conditions."""
    from ecs_yolo_tpu.snn.pallas_dw import packed_spread_pallas
    from ecs_yolo_tpu.snn.packed_spread import build_packed_spread

    rng = np.random.RandomState(0)
    N, H, Wp, C2 = shape
    C = C2 // 2
    s0 = jnp.asarray((rng.rand(N, H, Wp, C2) > 0.7), jnp.bfloat16)
    dw = jnp.asarray((rng.rand(3, 3, 1, C) - 0.5) * 0.2, jnp.bfloat16)
    dwb = jnp.asarray((rng.rand(C) - 0.5) * 0.1, jnp.bfloat16)
    pw = jnp.asarray((rng.rand(1, 1, C, C) - 0.5) * 0.05, jnp.bfloat16)
    pwb = jnp.asarray((rng.rand(C) - 0.5) * 0.1, jnp.bfloat16)

    def variant(kind):
        if kind == "composite":
            kp, bp = build_packed_spread(dw, dwb, pw, pwb, 2)

            def f(s):
                s8 = s.astype(jnp.int8)  # int8 transport like production
                y = lax.conv_general_dilated(
                    s8.astype(s.dtype), kp, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                return y + bp
        else:
            def f(s):
                return packed_spread_pallas(s, dw, dwb, pw, pwb)

        @jax.jit
        def chained(s, n):
            def body(i, carry):
                y = f(carry)
                return (y > 0).astype(jnp.bfloat16)

            return jnp.sum(
                lax.fori_loop(0, n, body, s).astype(jnp.float32))

        times = {}
        for n in (1, ITERS + 1):
            t0 = time.perf_counter()
            float(chained(s0, n))
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(chained(s0, n))
            times[n] = time.perf_counter() - t0
            print(f"  {name}/{kind} trip={n}: compile+run {tc:.1f}s "
                  f"warm {times[n]:.4f}s", flush=True)
        dt = (times[ITERS + 1] - times[1]) / ITERS * 1000
        print(f"  {name}/{kind}: {dt:.3f} ms", flush=True)
        return dt

    t_c = variant("composite")
    t_p = variant("pallas")
    print(f"{name}: composite {t_c:.3f} ms vs phase-Pallas {t_p:.3f} ms "
          f"({t_c / max(t_p, 1e-9):.2f}x)", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or list(SITES)
    for nm in names:
        if os.environ.get("BENCH_CPU", "0") == "1":
            parity_check((2, 16, 16, 128))
        elif nm.startswith("spread"):
            # spread_act1 / spread_act2: phase-aware packed spread A/B
            site = {"spread_act1": (16, 320, 160, 128),
                    "spread_act2": (16, 160, 80, 128),
                    "spread_act1b8": (8, 320, 160, 128)}[nm]
            bench_phase_spread(site, nm)
        else:
            bench(SITES[nm], nm)
