"""Stem conv micro-benchmark: direct 7x7/s2 Cin=3 vs space-to-depth.

The flagship stem (Conv_1 [64,7,2] on 640 px) convolves Cin=3 — 3/128 MXU
lanes.  Space-to-depth(2) is an exact transform: x[N,H,W,3] ->
[N,H/2,W/2,12], 7x7/s2 kernel zero-padded to 8x8 and re-indexed to a
4x4/s1 kernel over 12 input channels.  Same math, 4x denser input lanes.

Modes: cpu (exactness) | tpu (in-graph timing at [32,640,640,3]).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def s2d_kernel(k7):
    """[7,7,3,Co] 7x7/s2 kernel -> [4,4,12,Co] space-to-depth(2) kernel.

    x_s2d[n, h2, w2, q*3 + c] = x[n, 2*h2 + qh, 2*w2 + qw, c], q = 2*qh + qw.
    out[h,w] = sum_{dy,dx} x[2h+dy-3, 2w+dx-3] k[dy,dx]  (SAME pad 3).
    With dy = 2*ty + qh + r, matching phases: out[h,w] =
      sum_{ty,tx,qh,qw} x_s2d[h + ty - off, w + tx - off, phase] k8[...]
    where k8 is k7 zero-padded to 8x8 at the front (shift by 1) so the
    7x7 SAME-pad-3 alignment becomes 4x4 with pad 1.
    """
    co = k7.shape[-1]
    k8 = np.zeros((8, 8, 3, co), k7.dtype)
    k8[1:, 1:] = k7  # pad=3 on an even grid == pad=4 with a leading zero row
    k4 = np.zeros((4, 4, 12, co), k7.dtype)
    for qh in range(2):
        for qw in range(2):
            # taps with dy = 2*ty + qh land on input phase (qh, qw)
            # (shifted by the leading pad row/col)
            q = 2 * qh + qw
            k4[:, :, q * 3:(q + 1) * 3, :] = k8[qh::2, qw::2].transpose(
                0, 1, 2, 3)
    return k4


def space_to_depth(x):
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def make_fns(dtype, co=64):
    rng = np.random.RandomState(0)
    k7 = ((rng.rand(7, 7, 3, co) - 0.5) * 0.1).astype(np.float32)
    k4 = s2d_kernel(k7)
    k7j = jnp.asarray(k7, dtype)
    k4j = jnp.asarray(k4, dtype)

    @jax.jit
    def direct(x):
        return lax.conv_general_dilated(
            x, k7j, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def s2d(x):
        return lax.conv_general_dilated(
            space_to_depth(x), k4j, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    return direct, s2d


def bench(fn, x, iters=16):
    def chained(x, n):
        def body(i, carry):
            x, acc = carry
            y = fn(x)
            return (x + (acc * 1e-6).astype(x.dtype),
                    acc + jnp.mean(y.astype(jnp.float32)))

        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
        return acc

    run = jax.jit(chained, static_argnums=1)
    float(run(x, 1)); float(run(x, 1 + iters))
    t0 = time.perf_counter(); float(run(x, 1)); t_1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(x, 1 + iters)); t_n = time.perf_counter() - t0
    return (t_n - t_1) / iters * 1000


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    if mode == "cpu":
        jax.config.update("jax_platforms", "cpu")
        direct, s2d = make_fns(jnp.float32, co=8)
        x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 20, 3),
                        jnp.float32)
        yd = np.asarray(direct(x))
        ys = np.asarray(s2d(x))
        err = np.abs(yd - ys).max() / (np.abs(yd).max() + 1e-9)
        print(f"shapes {yd.shape} vs {ys.shape}, rel err {err:.2e}")
        assert yd.shape == ys.shape and err < 1e-5
        print("CPU exactness: OK")
    else:
        direct, s2d = make_fns(jnp.bfloat16)
        x = jnp.asarray(np.random.RandomState(1).rand(32, 640, 640, 3),
                        jnp.bfloat16)
        td = bench(direct, x)
        print(f"direct 7x7/s2 Cin=3 : {td:7.2f} ms", flush=True)
        ts = bench(s2d, x)
        print(f"space-to-depth 4x4  : {ts:7.2f} ms   ({td / ts:.2f}x)",
              flush=True)


if __name__ == "__main__":
    main()
