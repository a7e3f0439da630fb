"""Fused ECS-LIF recurrence — Pallas v3 (the DESIGN.md round-1 plan).

Why: the ECS-LIF scan is the model's wall-clock bottleneck (conv stack alone
333 img/s → ECS-LIF 105, docs/DESIGN.md).  XLA materializes the carry
(mem/ecs/spike) and the spread-conv intermediates in HBM every step; this
kernel keeps ALL state in VMEM for a full T-step recurrence over a row tile,
touching HBM only for x reads and spike writes.

Design (one grid step = one (image, row-tile) pair, row innermost):
  * halo recompute: spike_t has a receptive field of t rows (the 3x3
    depthwise spread grows it 1 row/step), so a tile computed on a window
    with HALO = T-1 extra rows on each side is exact on its interior for
    every step.
  * overlapping windows can't be expressed as BlockSpecs, and manual HBM
    DMA with dynamic row starts fails to lower for lane-padded (C=64)
    memrefs — so x is passed THREE times with the same tile-sized block at
    row-blocks (r-1, r, r+1) (clamped); the kernel assembles the halo
    window from the neighbor tiles.  Pallas pipelines all three streams.
  * at true image boundaries the 3x3 spread must see SAME zero-padding:
    forcing the out-of-image halo spikes to zero each step reproduces it
    exactly (interior spikes depend on x only through in-window spikes).
  * the depthwise 3x3 runs as 9 static slices of a zero-padded spike
    buffer (no concats/rolls on the hot path); the pointwise 1x1 is one
    [rows*W, C] @ [C, C] MXU matmul per step.

Forward-only: training keeps the XLA scan (`snn/neuron.py`); inference and
the bench route through this via ``ecs_lif_pallas`` when enabled.
Reference semantics: models/common.py:236-309 ``mem_update``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SNNConfig


def _pick_rb(h: int, w: int, c: int, t: int, itemsize: int,
             budget_bytes: int = 11 * 1024 * 1024) -> int:
    """Largest row-tile rb dividing h whose buffers fit the VMEM budget."""
    halo = t - 1
    for rb in range(h, 0, -1):
        if h % rb:
            continue
        rbe = rb + 2 * halo
        tile = t * rb * w * c * itemsize
        xbufs = 3 * 2 * tile          # three pipelined input streams
        out2 = 2 * tile
        scr = (2 * rbe * w * c + (rbe + 2) * (w + 2) * c) * itemsize
        if xbufs + out2 + scr <= budget_bytes:
            return rb
    raise ValueError(f"no row tile fits VMEM for {(t, h, w, c)}")


def _kernel(xp_ref, xt_ref, xn_ref, dwk_ref, dwb_ref, pwk_ref, pwb_ref,
            out_ref, mem, ecs, spk_pad,
            *, T, W, C, rb, halo, cfg: SNNConfig, act: bool):
    r = pl.program_id(1)
    RT = pl.num_programs(1)
    rbe = rb + 2 * halo

    dtype = out_ref.dtype
    leak = jnp.asarray(1.0 - 1.0 / cfg.ecs_tau, dtype)
    decay = jnp.asarray(cfg.decay, dtype)
    alpha = jnp.asarray(cfg.alpha, dtype)
    beta = jnp.asarray(cfg.beta, dtype)

    mem[...] = jnp.zeros_like(mem)
    ecs[...] = jnp.zeros_like(ecs)
    spk_pad[...] = jnp.zeros_like(spk_pad)

    dwk = dwk_ref[...]  # [3, 3, C]
    dwb = dwb_ref[...]  # [C]
    pwk = pwk_ref[...]  # [C, C]
    pwb = pwb_ref[...]

    at_top = r == 0
    at_bot = r == RT - 1

    for t in range(T):
        # assemble the halo window for this step's input
        xw = jnp.concatenate(
            [
                xp_ref[t, 0, rb - halo :],  # tail of previous tile
                xt_ref[t, 0],
                xn_ref[t, 0, :halo],        # head of next tile
            ],
            axis=0,
        )
        spike_prev = spk_pad[1 : 1 + rbe, 1 : 1 + W, :]
        fecs = beta * jnp.tanh(ecs[...])
        m = mem[...] * decay * (1.0 - spike_prev) + xw + fecs
        if act:
            spike = jax.nn.silu(m)
        else:
            # compare in f32: Mosaic cannot lower cmpf on packed bf16 vectors
            spike = (m.astype(jnp.float32) > cfg.thresh).astype(dtype)
        mem[...] = m
        spk_pad[1 : 1 + rbe, 1 : 1 + W, :] = spike

        # true image boundary: out-of-image halo spikes must be zero so the
        # 3x3 spread sees SAME zero-padding
        @pl.when(at_top)
        def _():
            spk_pad[1 : 1 + halo, :, :] = jnp.zeros_like(
                spk_pad[1 : 1 + halo, :, :]
            )

        @pl.when(at_bot)
        def _():
            spk_pad[1 + halo + rb :, :, :] = jnp.zeros_like(
                spk_pad[1 + halo + rb :, :, :]
            )

        out_ref[t, 0] = spk_pad[1 + halo : 1 + halo + rb, 1 : 1 + W, :]

        if t < T - 1:  # the last step's ecs update is unobservable
            acc = None
            for dy in range(3):
                for dx in range(3):
                    term = (
                        spk_pad[dy : dy + rbe, dx : dx + W, :] * dwk[dy, dx]
                    )
                    acc = term if acc is None else acc + term
            d = acc + dwb
            e = jax.lax.dot_general(
                d.reshape(rbe * W, C), pwk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype).reshape(rbe, W, C) + pwb
            ecs[...] = alpha * e + leak * ecs[...]


@functools.partial(jax.jit, static_argnames=("cfg", "act", "interpret"))
def ecs_lif_pallas(
    x: jax.Array,  # [T, N, H, W, C]
    dw_kernel: jax.Array,  # [3, 3, 1, C] (HWIO depthwise)
    dw_bias: jax.Array,  # [C]
    pw_kernel: jax.Array,  # [1, 1, C, C]
    pw_bias: jax.Array,  # [C]
    cfg: SNNConfig,
    act: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in fused forward for ``ecs_lif_scan`` (same weights/semantics)."""
    T, N, H, W, C = x.shape
    halo = T - 1
    rb = _pick_rb(H, W, C, T, x.dtype.itemsize)
    if rb <= halo:
        raise ValueError(f"row tile {rb} <= halo {halo} for {(T, H, W, C)}")
    RT = H // rb

    dwk = dw_kernel.reshape(3, 3, C).astype(x.dtype)
    dwb = dw_bias.astype(x.dtype)
    pwk = pw_kernel.reshape(C, C).astype(x.dtype)
    pwb = pw_bias.astype(x.dtype)

    rbe = rb + 2 * halo
    kernel = functools.partial(
        _kernel, T=T, W=W, C=C, rb=rb, halo=halo, cfg=cfg, act=act,
    )
    tile = (T, 1, rb, W, C)
    x_spec = lambda rof: pl.BlockSpec(
        tile,
        lambda n, r, rof=rof: (0, n, jnp.clip(r + rof, 0, RT - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(N, RT),
        in_specs=[
            x_spec(-1), x_spec(0), x_spec(+1),
            pl.BlockSpec((3, 3, C), lambda n, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda n, r: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda n, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda n, r: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            tile, lambda n, r: (0, n, r, 0, 0), memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((rbe, W, C), x.dtype),          # mem
            pltpu.VMEM((rbe, W, C), x.dtype),          # ecs
            pltpu.VMEM((rbe + 2, W + 2, C), x.dtype),  # zero-padded spikes
        ],
        interpret=interpret,
    )(x, x, x, dwk, dwb, pwk, pwb)
