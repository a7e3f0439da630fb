"""Segment-level width-packing experiment (round 3, part 2).

Round-3 part 1 (bench_spread_packed.py) showed per-site packing of the ECS
spread wins 1.13x at an isolated stem site but LOSES 14% full-model because
every neuron site pays a pack+unpack relayout ([.., W, 64] -> [.., W/2, 128]
is a genuine tiled-layout shuffle, not a free reshape, since C=64 is already
padded to the 128-lane minor tile).

This script tests the fix suggested in docs/DESIGN.md: keep the ENTIRE C=64
stage of EMS-Res34 (stem output -> first 128-channel conv: 7 neuron sites,
7 convs at 640px input) in packed layout.  Then the segment pays ONE pack
relayout at entry, and the exit is FREE because the stride-2 64->128 conv
can consume the packed layout directly (its stride-2 width sampling maps to
phase selection inside a width-2 packed kernel).

Everything inside the segment is exactly representable packed:
  * elementwise (scan, BN, residual add): layout-invariant;
  * dense/dw 3x3 s1 conv 64->64: packed block-dense [3,3,128,128] kernel
    (same FLOPs as the orig dense 3x3 64->64 per original pixel, full MXU
    lanes instead of half);
  * 3x3 s2 conv 64->64 (L1 entry): packed kernel, stride 2 over packed cols;
  * MaxPool3d(1,2,2) shortcut (k=1 stride-sample): select phase-0 channels.

Modes:
  cpu        — fp32 exactness of the packed segment vs baseline (small dims)
  tpu SPEC   — in-graph timing; SPEC in {baseline,packed} x {160,320}
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


# ---------------------------------------------------------------- kernels

def pack_dense_kernel(full, f):
    """Pack a dense s1 conv kernel full[kh,3,Ci,Co] (SAME) for the width-
    packed layout  packed[..., w2, q*C + c] = x[..., f*w2 + q, c].

    Output kernel [kh, 3, f*Ci, f*Co]: output phase q at packed col w2 is
    orig col w = f*w2 + q; its tap at dx reads orig col w+dx = phase
    (q+dx) mod f of packed col w2 + (q+dx)//f.
    """
    kh = full.shape[0]
    Ci, Co = full.shape[2], full.shape[3]
    K = np.zeros((kh, 3, f * Ci, f * Co), full.dtype)
    for q in range(f):
        for dx in (-1, 0, 1):
            t = q + dx
            qp, shift = t % f, t // f  # python floordiv: -1//2 = -1
            K[:, shift + 1, qp * Ci:(qp + 1) * Ci, q * Co:(q + 1) * Co] += \
                full[:, dx + 1]
    return K


def pack_strided_exit_kernel(full, f):
    """Pack a dense 3x3 s2 conv kernel for packed input -> UNPACKED output
    (the segment exit, e.g. 64->128).  Orig output col w_out reads orig
    input cols 2*w_out + dx; with f=2, those are phase1 of packed col
    w_out-1 (dx=-1), phase0 and phase1 of packed col w_out (dx=0,+1).
    Returns kernel [kh, 2, f*Ci, Co], stride 1 over packed cols,
    explicit width padding (1, 0).
    """
    assert f == 2, "exit packing implemented for f=2"
    kh = full.shape[0]
    Ci, Co = full.shape[2], full.shape[3]
    K = np.zeros((kh, 2, f * Ci, Co), full.dtype)
    K[:, 0, Ci:] = full[:, 0]   # dx=-1 -> phase1, col-1
    K[:, 1, :Ci] = full[:, 1]   # dx= 0 -> phase0, col 0
    K[:, 1, Ci:] = full[:, 2]   # dx=+1 -> phase1, col 0
    return K


def pack_w(x, f):
    *lead, W, C = x.shape
    return x.reshape(*lead, W // f, f * C)


def unpack_w(x, f):
    *lead, W2, fC = x.shape
    return x.reshape(*lead, W2 * f, fC // f)


def dwpw_full(dw_k, pw_k):
    """Compose depthwise [3,3,1,C] + pointwise [1,1,C,C] into a dense
    [3,3,C,C] (the ECS spread pair as one kernel)."""
    return dw_k[:, :, 0, :, None] * pw_k[0, 0][None, None]


# ---------------------------------------------------------------- segment

def make_segment(C, n_blocks, dtype, cfg, f=2, seed=0):
    """A C-channel EMS stage: n_blocks x [scan -> conv3x3 -> scale/shift]x2
    with residual, then a stride-2 exit conv C -> 2C.  Returns
    (baseline_fn, packed_fn) mapping [T,N,H,W,C] -> [T,N,H/2,W/2,2C]."""
    rng = np.random.RandomState(seed)

    def mk(*s):
        return (rng.rand(*s).astype(np.float32) - 0.5) * (0.5 / np.sqrt(np.prod(s[:-1])))

    blocks = []
    for _ in range(n_blocks):
        blk = dict(
            dw1=mk(3, 3, 1, C), pw1=mk(1, 1, C, C), b1=mk(C),
            k1=mk(3, 3, C, C), g1=1.0 + mk(C), be1=mk(C),
            dw2=mk(3, 3, 1, C), pw2=mk(1, 1, C, C), b2=mk(C),
            k2=mk(3, 3, C, C), g2=1.0 + mk(C), be2=mk(C),
        )
        blocks.append(blk)
    k_exit = mk(3, 3, C, 2 * C)

    def conv(x, k, stride=1, pad="SAME"):
        return lax.conv_general_dilated(
            x, jnp.asarray(k, dtype), (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def spread_fn(dw, pw, b):
        dwj, pwj, bj = (jnp.asarray(a, dtype) for a in (dw, pw, b))

        def spread(s):
            d = lax.conv_general_dilated(
                s, dwj, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C)
            return lax.conv_general_dilated(
                d, pwj, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bj
        return spread

    def packed_spread_fn(dw, pw, b):
        Kp = jnp.asarray(pack_dense_kernel(dwpw_full(dw, pw), f), dtype)
        bp = jnp.asarray(np.tile(b, f), dtype)

        def spread(s):
            return lax.conv_general_dilated(
                s, Kp, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bp
        return spread

    def affine(y, g, b):
        return y * jnp.asarray(g, dtype) + jnp.asarray(b, dtype)

    def baseline(x):
        T = x.shape[0]
        for blk in blocks:
            r = x
            s = ecs_lif_scan(x, spread_fn(blk["dw1"], blk["pw1"], blk["b1"]),
                             cfg, act=False)
            y = conv(s.reshape((-1,) + s.shape[2:]), blk["k1"])
            y = affine(y, blk["g1"], blk["be1"])
            y = y.reshape(s.shape[:2] + y.shape[1:])
            s = ecs_lif_scan(y, spread_fn(blk["dw2"], blk["pw2"], blk["b2"]),
                             cfg, act=False)
            y = conv(s.reshape((-1,) + s.shape[2:]), blk["k2"])
            y = affine(y, blk["g2"], blk["be2"])
            x = y.reshape(s.shape[:2] + y.shape[1:]) + r
        # torch-style centered s2 padding (the packed exit mapping assumes
        # output o taps orig cols 2o-1, 2o, 2o+1; XLA "SAME" s2 is (0,1))
        y = conv(x.reshape((-1,) + x.shape[2:]), k_exit, stride=2,
                 pad=[(1, 1), (1, 1)])
        return y.reshape(x.shape[:2] + y.shape[1:])

    def packed(x):
        xp = pack_w(x, f)
        for blk in blocks:
            r = xp
            s = ecs_lif_scan(
                xp, packed_spread_fn(blk["dw1"], blk["pw1"], blk["b1"]),
                cfg, act=False)
            Kp = pack_dense_kernel(blk["k1"], f)
            y = conv(s.reshape((-1,) + s.shape[2:]), Kp)
            y = affine(y, np.tile(blk["g1"], f), np.tile(blk["be1"], f))
            y = y.reshape(s.shape[:2] + y.shape[1:])
            s = ecs_lif_scan(
                y, packed_spread_fn(blk["dw2"], blk["pw2"], blk["b2"]),
                cfg, act=False)
            Kp = pack_dense_kernel(blk["k2"], f)
            y = conv(s.reshape((-1,) + s.shape[2:]), Kp)
            y = affine(y, np.tile(blk["g2"], f), np.tile(blk["be2"], f))
            xp = y.reshape(s.shape[:2] + y.shape[1:]) + r
        # exit: stride-2 64->128 consumes packed directly (free unpack)
        Ke = pack_strided_exit_kernel(k_exit, f)
        y = lax.conv_general_dilated(
            xp.reshape((-1,) + xp.shape[2:]), jnp.asarray(Ke, dtype),
            (2, 1), [(1, 1), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.reshape(xp.shape[:2] + y.shape[1:])

    return baseline, packed


def bench(fn, x, iters=6):
    def chained(x, n):
        def body(i, x):
            y = fn(x)
            # feed a (shape-restoring) function of y back into x to chain
            up = jax.image.resize(y[..., : x.shape[-1]],
                                  y.shape[:2] + x.shape[2:], "nearest")
            return x * x.dtype.type(0.75) + up * x.dtype.type(0.01)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    run = jax.jit(chained, static_argnums=1)
    float(run(x, 1)); float(run(x, 1 + iters))
    t0 = time.perf_counter(); float(run(x, 1)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(x, 1 + iters)); tn = time.perf_counter() - t0
    return (tn - t1) / iters * 1000


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    cfg = SNNConfig(time_window=4)

    if mode == "cpu":
        jax.config.update("jax_platforms", "cpu")
        for C, H, W, nb in [(4, 8, 12, 2), (8, 6, 20, 1)]:
            base, packed = make_segment(C, nb, jnp.float32, cfg)
            x = jnp.asarray(
                np.random.RandomState(1).randn(3, 2, H, W, C), jnp.float32)
            yb, yp = np.asarray(base(x)), np.asarray(packed(x))
            err = np.abs(yb - yp).max()
            print(f"C={C} H={H} W={W} blocks={nb}  max|diff|={err:.2e}")
            assert err < 1e-4, "packed segment is NOT equivalent"
        print("CPU exactness: OK")
    else:
        which, size = sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 160
        T, N, C = 4, 8, 64
        nb = 3 if size == 160 else 1
        base, packed = make_segment(C, nb, jnp.bfloat16, cfg)
        x = jnp.asarray(
            np.random.RandomState(1).rand(T, N, size, size, C), jnp.bfloat16)
        fn = {"baseline": base, "packed": packed}[which]
        t = bench(fn, x, iters=6)
        print(f"{which:>8s} segment C=64 {size}px x{nb} blocks "
              f"[T4,N8] bf16: {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
