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


# v5e cores have 128 MB of VMEM; the default 16 MB scoped limit is far too
# small for this kernel because Mosaic stack-allocates the unrolled T-loop's
# temporaries WITHOUT reusing them across steps (measured: rb=5 tile -> 21 MB
# stack).  We raise the per-kernel limit and budget for those temporaries.
VMEM_LIMIT = 100 * 1024 * 1024


def _pick_rb(h: int, w: int, c: int, t: int, itemsize: int,
             budget_bytes: int = int(VMEM_LIMIT * 0.8)) -> int:
    """Largest row-tile rb dividing h whose buffers fit the VMEM budget."""
    halo = t - 1
    for rb in range(h, 0, -1):
        if h % rb:
            continue
        rbe = rb + 2 * halo
        tile = t * rb * w * c * itemsize
        xbufs = 3 * 2 * tile          # three pipelined input streams
        out2 = 2 * tile
        scr = (2 * rbe * w * c + 3 * (rbe + 2) * w * c) * itemsize
        # Mosaic stack temporaries: ~6 live rbe-row buffers per unrolled step
        stack = 6 * t * rbe * w * c * itemsize
        if xbufs + out2 + scr + stack <= budget_bytes:
            return rb
    raise ValueError(f"no row tile fits VMEM for {(t, h, w, c)}")


def _kernel(xp_ref, xt_ref, xn_ref, dwk_ref, dwb_ref, pwk_ref, pwb_ref,
            out_ref, mem, ecs, spkC, spkL, spkR,
            *, T, W, C, rb, halo, cfg: SNNConfig, act: bool,
            ablate: str = ""):
    if ablate == "copyonly":  # DMA floor: stream x in, write it straight out
        for t in range(T):
            out_ref[t, 0] = xt_ref[t, 0]
        return
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
    # three column-shifted spike copies (1-row zero padding top/bottom):
    #   spkC[r+1, x] = spike[r, x]
    #   spkL[r+1, x] = spike[r, x+1]   (left-shifted; col W-1 stays 0)
    #   spkR[r+1, x] = spike[r, x-1]   (right-shifted; col 0 stays 0)
    # The 9 depthwise taps then become ROW-offset-only reads (free address
    # offsets in the outer dim) — the naive 9 sublane-misaligned slices of a
    # (W+2)-wide buffer measured +27 ms/site on v5e (Mosaic materializes a
    # shifted copy per tap); this form pays only 2 shifted copies per step.
    spkC[...] = jnp.zeros_like(spkC)
    spkL[...] = jnp.zeros_like(spkL)
    spkR[...] = jnp.zeros_like(spkR)

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
        spike_prev = spkC[1 : 1 + rbe]
        fecs = beta * jnp.tanh(ecs[...])
        m = mem[...] * decay * (1.0 - spike_prev) + xw + fecs
        if act:
            spike = jax.nn.silu(m)
        else:
            # compare in f32: Mosaic cannot lower cmpf on packed bf16 vectors
            spike = (m.astype(jnp.float32) > cfg.thresh).astype(dtype)
        mem[...] = m
        spkC[1 : 1 + rbe] = spike
        spkL[1 : 1 + rbe, : W - 1] = spike[:, 1:]
        spkR[1 : 1 + rbe, 1:] = spike[:, : W - 1]

        # true image boundary: out-of-image halo spikes must be zero so the
        # 3x3 spread sees SAME zero-padding
        @pl.when(at_top)
        def _():
            for buf in (spkC, spkL, spkR):
                buf[1 : 1 + halo] = jnp.zeros_like(buf[1 : 1 + halo])

        @pl.when(at_bot)
        def _():
            for buf in (spkC, spkL, spkR):
                buf[1 + halo + rb :] = jnp.zeros_like(buf[1 + halo + rb :])

        out_ref[t, 0] = spkC[1 + halo : 1 + halo + rb]

        if t < T - 1 and ablate != "nospread":
            # the last step's ecs update is unobservable
            if ablate == "nodw":
                d = spike + dwb
            else:
                acc = None
                for dy in range(3):
                    for buf, dx in ((spkR, 0), (spkC, 1), (spkL, 2)):
                        term = buf[dy : dy + rbe] * dwk[dy, dx]
                        acc = term if acc is None else acc + term
                d = acc + dwb
            if ablate == "nopw":
                e = d
            else:
                e = jax.lax.dot_general(
                    d.reshape(rbe * W, C), pwk,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dtype).reshape(rbe, W, C) + pwb
            ecs[...] = alpha * e + leak * ecs[...]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "act", "interpret", "ablate", "rb_override"),
)
def ecs_lif_pallas(
    x: jax.Array,  # [T, N, H, W, C]
    dw_kernel: jax.Array,  # [3, 3, 1, C] (HWIO depthwise)
    dw_bias: jax.Array,  # [C]
    pw_kernel: jax.Array,  # [1, 1, C, C]
    pw_bias: jax.Array,  # [C]
    cfg: SNNConfig,
    act: bool = False,
    interpret: bool = False,
    ablate: str = "",       # dev-only micro-bench ablations, see _kernel
    rb_override: int = 0,   # dev-only row-tile override
) -> jax.Array:
    """Drop-in fused forward for ``ecs_lif_scan`` (same weights/semantics)."""
    T, N, H, W, C = x.shape
    halo = T - 1
    rb = rb_override or _pick_rb(H, W, C, T, x.dtype.itemsize)
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
        ablate=ablate,
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
            pltpu.VMEM((rbe, W, C), x.dtype),        # mem
            pltpu.VMEM((rbe, W, C), x.dtype),        # ecs
            pltpu.VMEM((rbe + 2, W, C), x.dtype),    # spikes (center)
            pltpu.VMEM((rbe + 2, W, C), x.dtype),    # spikes shifted left
            pltpu.VMEM((rbe + 2, W, C), x.dtype),    # spikes shifted right
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(x, x, x, dwk, dwb, pwk, pwb)
