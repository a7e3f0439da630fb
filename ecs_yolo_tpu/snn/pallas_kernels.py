"""Fused Pallas TPU kernels for the membrane recurrence.

Why: profiling EMS-Res34 at 640px/T=4/bf16 on v5e shows the conv stack alone
runs at 333 img/s, but adding the plain-LIF recurrence drops throughput to
137 img/s and ECS-LIF to 96 img/s — i.e. the *elementwise* neuron dynamics
cost more than all convolutions, because every `lax.scan` step round-trips
carries and x through HBM for each of the ~33 neuron sites.

These kernels keep the whole T-step recurrence in VMEM:

* ``lif_fused``     — plain LIF: one read of x, one write of spikes.
* ``ecs_lif_fused`` — ECS-LIF with the depthwise-3x3 + pointwise-1x1 spread
  conv *inside* the kernel.  H is tiled in row blocks with a (T-1)-row halo
  that is recomputed: the spread conv grows the receptive field by 1 row per
  step, so interior rows of each block are exact; halo rows are discarded.
  The pointwise C x C mix runs on the MXU via `jnp.dot`.

Both are inference-path kernels (used when ``training=False``); training
keeps the `lax.scan` formulation whose VJP implements the reference's
surrogate/stop-gradient semantics (snn/neuron.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SNNConfig


def _spike(mem, thresh: float, act: bool):
    if act:
        return jax.nn.silu(mem)
    # Mosaic lacks bf16 compare on some targets — compare in f32
    return (mem.astype(jnp.float32) > thresh).astype(mem.dtype)


# ---------------------------------------------------------------------------
# plain LIF: elementwise over flattened pixels
# ---------------------------------------------------------------------------


def _lif_kernel(x_ref, out_ref, *, t_steps, decay, thresh, act):
    mem = jnp.zeros_like(x_ref[0])
    spike = jnp.zeros_like(mem)
    for t in range(t_steps):
        mem = mem * decay * (1.0 - spike) + x_ref[t]
        spike = _spike(mem, thresh, act)
        out_ref[t] = spike


def lif_fused(x: jax.Array, cfg: SNNConfig, act: bool = False,
              interpret: bool = False) -> jax.Array:
    """Fused plain-LIF over [T, ...]; one HBM read of x, one write out."""
    import numpy as _np

    t = x.shape[0]
    orig_shape = x.shape
    m = int(_np.prod(x.shape[1:]))
    lanes = 128
    sub = 8
    block = sub * lanes * 32  # 32k elements per program
    m_pad = ((m + block - 1) // block) * block
    xf = x.reshape(t, m)
    if m_pad != m:
        xf = jnp.pad(xf, ((0, 0), (0, m_pad - m)))
    xf = xf.reshape(t, m_pad // lanes, lanes)

    grid = (m_pad // block,)
    rows = block // lanes
    out = pl.pallas_call(
        functools.partial(
            _lif_kernel, t_steps=t, decay=cfg.decay, thresh=cfg.thresh, act=act
        ),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (t, rows, lanes), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (t, rows, lanes), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xf)
    return out.reshape(t, m_pad)[:, :m].reshape(orig_shape)


# ---------------------------------------------------------------------------
# ECS-LIF: row-tiled with halo recompute, spread conv in-kernel
# ---------------------------------------------------------------------------


def _ecs_kernel(
    xw_ref,  # [T, 1, 1, RB, W, C] VMEM block (pre-built overlapping window)
    dwk_ref,  # [3, 3, C]
    dwb_ref,  # [1, C]
    pwk_ref,  # [C, C]
    pwb_ref,  # [1, C]
    out_ref,  # [T, 1, BR, W, C] VMEM block
    *,
    t_steps: int,
    halo: int,
    br: int,
    h_img: int,
    decay: float,
    thresh: float,
    alpha: float,
    beta: float,
    leak: float,
    act: bool,
):
    j = pl.program_id(1)
    rb, w, c = xw_ref.shape[3], xw_ref.shape[4], xw_ref.shape[5]

    # compute in the input dtype (bf16 at inference) — the same precision the
    # lax.scan path uses; the pointwise matmul still accumulates in f32
    f32 = xw_ref.dtype
    mem = jnp.zeros((rb, w, c), f32)
    spike = jnp.zeros((rb, w, c), f32)
    ecs = jnp.zeros((rb, w, c), f32)
    # rows outside the real image (halo padding) stay zero in the spike map
    # so the in-kernel 3x3 sees true zero padding at image edges
    grow = jax.lax.broadcasted_iota(jnp.int32, (rb, 1, 1), 0) + j * br
    rowmask = ((grow >= halo) & (grow < halo + h_img)).astype(f32)
    dwk = dwk_ref[...].astype(f32)
    dwb = dwb_ref[0].astype(f32)
    pwk = pwk_ref[...].astype(f32)
    pwb = pwb_ref[0].astype(f32)

    def shift(a, dy, dx):
        # zero-filled shift along rows (dy) and width (dx)
        if dy > 0:
            a = jnp.concatenate([jnp.zeros((dy, w, c), f32), a[:-dy]], 0)
        elif dy < 0:
            a = jnp.concatenate([a[-dy:], jnp.zeros((-dy, w, c), f32)], 0)
        if dx > 0:
            a = jnp.concatenate([jnp.zeros((rb, dx, c), f32), a[:, :-dx]], 1)
        elif dx < 0:
            a = jnp.concatenate([a[:, -dx:], jnp.zeros((rb, -dx, c), f32)], 1)
        return a

    # rolled T loop (fori_loop) keeps only ONE step's buffers live in VMEM;
    # a python-unrolled loop made Mosaic stack-allocate every step's
    # temporaries simultaneously (~26 live (rb,W,C) buffers -> VMEM OOM)
    def body(t, carry):
        mem, spike, ecs = carry
        fecs = beta * jnp.tanh(ecs)
        mem = mem * decay * (1.0 - spike) + xw_ref[t, 0, 0] + fecs
        spike = _spike(mem, thresh, act)
        # zero out padded (non-image) rows so the 3x3 sees true zero padding
        spike = spike * rowmask
        # depthwise 3x3 as 9 shifted multiply-adds on the VPU
        # cross-correlation (lax.conv semantics): out[r,w] += in[r+dy, w+dx] *
        # k[dy+1, dx+1]; shift(a, s) yields a[r-s], so negate the offsets
        d = jnp.zeros((rb, w, c), f32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                d += shift(spike, -dy, -dx) * dwk[dy + 1, dx + 1]
        d = d + dwb
        # pointwise 1x1 = (rb*w, C) @ (C, C) on the MXU
        p = jnp.dot(
            d.reshape(rb * w, c), pwk, preferred_element_type=jnp.float32
        ).astype(f32).reshape(rb, w, c) + pwb
        ecs = alpha * p + leak * ecs
        out_ref[t, 0] = spike[halo : rb - halo].astype(out_ref.dtype)
        return mem, spike, ecs

    jax.lax.fori_loop(0, t_steps, body, (mem, spike, ecs))


def _ecs_kernel_v2(
    xw_ref,  # [T, 1, 1, RB, W, C] VMEM block (overlapping window)
    dwk_ref,  # [3, 3, C]
    dwb_ref,  # [1, C]
    pwk_ref,  # [C, C]
    pwb_ref,  # [1, C]
    out_ref,  # [T, 1, BR, W, C]
    mem_s,  # scratch [RB, W, C]
    spike_s,  # scratch [RB+2, W+2, C]  (1-px halo for the 3x3)
    ecs_s,  # scratch [RB, W, C]
    *,
    t_steps: int,
    halo: int,
    br: int,
    h_img: int,
    decay: float,
    thresh: float,
    alpha: float,
    beta: float,
    leak: float,
    act: bool,
):
    """v2: unrolled steps with STATE IN SCRATCH REFS (so Mosaic reuses the
    buffers across steps instead of stack-allocating every step's SSA
    temporaries) and slice-reads of a halo-padded spike buffer instead of
    concatenation shifts."""
    j = pl.program_id(1)
    rb, w, c = mem_s.shape
    cdt = mem_s.dtype

    grow = jax.lax.broadcasted_iota(jnp.int32, (rb, 1, 1), 0) + j * br
    rowmask = ((grow >= halo) & (grow < halo + h_img)).astype(cdt)
    dwk = dwk_ref[...]
    dwb = dwb_ref[0]
    pwk = pwk_ref[...]
    pwb = pwb_ref[0]

    mem_s[...] = jnp.zeros((rb, w, c), cdt)
    ecs_s[...] = jnp.zeros((rb, w, c), cdt)
    spike_s[...] = jnp.zeros((rb + 2, w + 2, c), cdt)

    for t in range(t_steps):
        fecs = beta * jnp.tanh(ecs_s[...])
        mem = (
            mem_s[...] * decay * (1.0 - spike_s[1 : rb + 1, 1 : w + 1])
            + xw_ref[t, 0, 0]
            + fecs
        )
        sp = _spike(mem, thresh, act) * rowmask
        mem_s[...] = mem
        spike_s[1 : rb + 1, 1 : w + 1] = sp
        # depthwise 3x3 = 9 slice-reads of the halo-padded spike buffer
        d = jnp.zeros((rb, w, c), cdt)
        for dy in range(3):
            for dx in range(3):
                d += spike_s[dy : dy + rb, dx : dx + w] * dwk[dy, dx]
        d = d + dwb
        p = jnp.dot(
            d.reshape(rb * w, c), pwk, preferred_element_type=jnp.float32
        ).astype(cdt).reshape(rb, w, c) + pwb
        ecs_s[...] = alpha * p + leak * ecs_s[...]
        out_ref[t, 0] = sp[halo : rb - halo].astype(out_ref.dtype)


def ecs_lif_fused_v2(
    x: jax.Array,
    dw_kernel: jax.Array,
    dw_bias: jax.Array,
    pw_kernel: jax.Array,
    pw_bias: jax.Array,
    cfg: SNNConfig,
    act: bool = False,
    interpret: bool = False,
    block_rows: int = 0,
) -> jax.Array:
    """Scratch-state variant of :func:`ecs_lif_fused` (see kernel docstring)."""
    t, n, h, w, c = x.shape
    halo = t - 1
    leak = 1.0 - 1.0 / cfg.ecs_tau

    br = block_rows or _pick_block_rows(
        h, w, c, t, budget_bytes=int(9 * 2**20),
        halo=halo, dtype_bytes=x.dtype.itemsize,
    )
    n_blocks = (h + br - 1) // br
    h_pad = n_blocks * br
    rb = br + 2 * halo

    x_p = jnp.pad(x, ((0, 0), (0, 0), (halo, halo + h_pad - h), (0, 0), (0, 0)))
    xw = jnp.stack(
        [x_p[:, :, j * br : j * br + rb] for j in range(n_blocks)], axis=2
    )

    kernel = functools.partial(
        _ecs_kernel_v2,
        t_steps=t, halo=halo, br=br, h_img=h,
        decay=cfg.decay, thresh=cfg.thresh, alpha=cfg.alpha, beta=cfg.beta,
        leak=leak, act=act,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t, n, h_pad, w, c), x.dtype),
        grid=(n, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (t, 1, 1, rb, w, c), lambda i, j: (0, i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, 3, c), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (t, 1, br, w, c), lambda i, j: (0, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((rb, w, c), x.dtype),
            pltpu.VMEM((rb + 2, w + 2, c), x.dtype),
            pltpu.VMEM((rb, w, c), x.dtype),
        ],
        interpret=interpret,
    )(
        xw,
        dw_kernel.reshape(3, 3, c).astype(x.dtype),
        dw_bias.reshape(1, c).astype(x.dtype),
        pw_kernel.reshape(c, c).astype(x.dtype),
        pw_bias.reshape(1, c).astype(x.dtype),
    )
    return out[:, :, :h]


def _pick_block_rows(h, w, c, t, budget_bytes=int(6.5 * 2**20), halo=3,
                     dtype_bytes=2):
    """Largest row block whose VMEM footprint fits.

    The unrolled T-step body keeps ~8 live (rb, W, C) buffers in the compute
    dtype (x step, mem, spike, ecs, fecs, conv accumulators, matmul
    operands).  In the EMS backbones W*C is constant (W halves while C
    doubles), so this lands on the same block size at every depth.
    """
    per_row = 8 * dtype_bytes * w * c
    br = max(4, int(budget_bytes / max(per_row, 1)) - 2 * halo)
    return min(br, h)


def ecs_lif_fused(
    x: jax.Array,  # [T, N, H, W, C]
    dw_kernel: jax.Array,  # [3, 3, 1, C]
    dw_bias: jax.Array,  # [C]
    pw_kernel: jax.Array,  # [1, 1, C, C]
    pw_bias: jax.Array,  # [C]
    cfg: SNNConfig,
    act: bool = False,
    interpret: bool = False,
) -> jax.Array:
    t, n, h, w, c = x.shape
    halo = t - 1
    leak = 1.0 - 1.0 / cfg.ecs_tau

    br = _pick_block_rows(h, w, c, t, halo=halo, dtype_bytes=x.dtype.itemsize)
    n_blocks = (h + br - 1) // br
    h_pad = n_blocks * br
    rb = br + 2 * halo

    # pad rows: halo on top, halo + block alignment on the bottom (zeros;
    # the in-kernel row mask keeps them out of the conv's receptive field)
    x_p = jnp.pad(x, ((0, 0), (0, 0), (halo, halo + h_pad - h), (0, 0), (0, 0)))

    kernel = functools.partial(
        _ecs_kernel,
        t_steps=t,
        halo=halo,
        br=br,
        h_img=h,
        decay=cfg.decay,
        thresh=cfg.thresh,
        alpha=cfg.alpha,
        beta=cfg.beta,
        leak=leak,
        act=act,
    )
    # pre-build overlapping row windows [T, N, n_blocks, RB, W, C]; XLA pays
    # ~rb/br extra read+write on x once, versus the scan's ~10x round trips
    xw = jnp.stack(
        [x_p[:, :, j * br : j * br + rb] for j in range(n_blocks)], axis=2
    )

    grid = (n, n_blocks)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t, n, h_pad, w, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (t, 1, 1, rb, w, c), lambda i, j: (0, i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, 3, c), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (t, 1, br, w, c), lambda i, j: (0, i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(
        xw,
        dw_kernel.reshape(3, 3, c),
        dw_bias.reshape(1, c),
        pw_kernel.reshape(c, c),
        pw_bias.reshape(1, c),
    )
    return out[:, :, :h]
