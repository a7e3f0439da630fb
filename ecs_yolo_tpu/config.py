"""Global spiking-neuron configuration.

TPU-native re-design of the reference globals (reference: models/common.py:37-40
``thresh=0.5, lens=0.5, decay=0.25, time_window=4``).  Instead of module-level
mutable globals, the framework threads an immutable :class:`SNNConfig` through
model construction, so two models with different T (the reference has T=4 in
models/yolo_snn.py:31 and T=8 in models/yolo.py:42) can coexist in one process.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SNNConfig:
    """Spiking neuron hyper-parameters.

    Attributes:
      thresh: firing threshold of the Heaviside spike function.
      lens: half-width of the rectangular surrogate-gradient window.
      decay: membrane leak factor applied between timesteps.
      time_window: number of timesteps T every feature map carries.
      ecs: enable the ECS-LIF extracellular field (reference
        models/common.py:236-309 applies it unconditionally in ``mem_update``;
        plain-LIF variant lives in models/common2.py:75-106).
      alpha: ECS spread gain.
      beta: ECS feedback gain (through tanh).
      ecs_tau: ECS field time constant.
    """

    thresh: float = 0.5
    lens: float = 0.5
    decay: float = 0.25
    time_window: int = 4
    ecs: bool = True
    alpha: float = 0.75
    beta: float = 0.25
    ecs_tau: float = 5.0
    # experimental: fused Pallas recurrence kernels (snn/pallas_kernels.py).
    # Currently OFF the hot path — measured slower than XLA's fused unrolled
    # scan on v5e (see docs/DESIGN.md); kept for further Mosaic tuning.
    fused_inference: bool = False
    # width-packed ECS spread (snn/packed_spread.py): at C <= 64 sites the
    # dw3x3+pw1x1 spread runs as ONE dense conv over the width-packed
    # [.., W//f, f*C] layout, filling all 128 MXU lanes.  Exact same math;
    # 1.13x at an isolated stem site but a NET FULL-MODEL REGRESSION
    # (110 -> 95 img/s): the logical reshape is a real relayout in TPU tiled
    # layout (C=64 pads to 128 lanes), paid at every site boundary — see
    # docs/DESIGN.md round-3.  OFF the hot path; kept for packed-segment
    # experiments.
    packed_spread: bool = False
    # SEGMENT-level width packing (round-3 part 2): keep the entire C<=64
    # stage of the model in the width-packed [.., W//2, 2C] layout — the
    # stem conv emits packed directly (pack folded into its stride), every
    # conv/BN/neuron in the stage runs packed (full 128 MXU lanes), and the
    # stage's stride-2 exit conv consumes packed directly.  Fixes the
    # per-site relayout cost that sank `packed_spread`: measured 1.81x on
    # the isolated C=64 segment (scripts/bench_packed_segment.py).  Exact
    # same math; canonical parameters (checkpoints are layout-agnostic).
    packed_c64: bool = True
    # T-invariant stem dedup: a STATIC image is replicated T times at the
    # model entrance (reference models/yolo.py:247-251), so every layer
    # before the first T-coupled op (the neuron scan — BasicBlock_2 and
    # friends all START with mem_update) computes the identical value for
    # all T copies.  Run that prefix once at T=1 and broadcast after: the
    # stem Conv_1 — the single most expensive conv (full 640px input) —
    # does 1/T of the work.  Exact: BN statistics over (N,1,H,W) of one
    # copy equal statistics over (N,T,H,W) of T identical copies, and the
    # broadcast's backward sums the T cotangents, matching the replicated
    # forward's weight gradients.  Event-mode (5-D) input is genuinely
    # T-varying and bypasses this automatically.
    stem_dedup: bool = True
    # closed-form BN training backward (nn/bn_vjp.py): pins the BN residual
    # set to the bf16 activation + [C] stats instead of letting XLA's AD
    # materialize full-size fp32 intermediates, with the same mesh-invariant
    # per-sample/tree reductions in the backward.  Identical math to AD up
    # to float reassociation (ulps); 1-vs-N parity unaffected (both sides
    # use the same fold; tests/test_bn_vjp.py).  Measured on v5e (round 4):
    # p1-prefix grad 165.2 -> 160.4 ms, full res10@640 b16 train step
    # 71.2 -> 71.65 img/s.  Default ON.
    bn_custom_vjp: bool = True
    # int8 spike transport (nn/spike_conv.py): spike-fed convolutions
    # materialize their binary input as int8 inside a custom_vjp — the
    # convert fuses into the conv read (isolated conv +23%,
    # scripts/bench_int8_spike_conv.py) and the wgrad residual halves.
    # Exact (int8 round-trip of {0,1}) with unchanged reduction semantics.
    # Applied where binariness is structural: the EMS block convs fed by
    # Heaviside MemUpdate outputs and the ECS spread convs (act=False
    # sites only).  Measured on v5e (round 4): res10@640 b16 train step
    # 70.0 -> 75.05 img/s (+7.2%, in-graph).  Default ON.
    int8_spike_transport: bool = True
    # int8 reset-gate residual (snn/neuron.py _reset_decay): the membrane
    # reset gate (1 - spike_prev) is binary with a stop-gradient'd spike
    # cotangent, yet plain AD saves it bf16 at every neuron site and
    # T-step; a custom_vjp saves it int8 instead (exact for Heaviside
    # sites; SiLU sites keep plain AD; bitwise parity tests in
    # tests/test_snn.py).  MEASURED NEGATIVE on v5e (round 5): the
    # custom_vjp boundary forces the gated-decay product to materialize
    # per step per site (XLA can no longer fuse the membrane chain and
    # pick its own minimal residual set) — res10@640 b16 no-remat OOMs
    # where the plain path trains at 75.05 img/s.  Same lesson as the
    # first-match pool VJP: a smaller residual inside a fusion-breaking
    # boundary can cost more than it saves.  Kept opt-in.
    int8_reset_gate: bool = False
    # Pallas int8-read depthwise spread (snn/pallas_dw.py): the unpacked
    # ECS sites' dw3x3 runs as a Pallas VPU kernel reading the binary
    # spike plane as int8 (XLA's grouped-conv lowering measured ~3.7x off
    # its traffic bound).  Backward = exact XLA dgrad/wgrad from the
    # int8-saved input (reduction semantics unchanged).  Default follows
    # the measured full-step A/B (scripts/bench_train_step.py
    # BENCH_PALLASDW).
    pallas_dw_spread: bool = False
    # Phase-aware packed spread (snn/pallas_dw.packed_spread_pallas): the
    # C<=64 stage's dw+pw in packed layout as an im2col matmul per width
    # phase — HALF the FLOPs of the round-3 packed composite (which XLA
    # already runs at 87% MFU: the waste is in the formulation, not the
    # execution — measured 1.404 ms at act1 vs its 1.22 ms compute bound,
    # scripts/bench_pallas_dw.py round-5) with int8 input reads.  Exact
    # same math (fp32 parity ~1e-7 incl. all 5 grads); backward = XLA's
    # composite vjp.  Default follows the measured A/B.
    pallas_packed_spread: bool = False
    # selective rematerialization: checkpoint ONLY the neuron recurrences
    # (the T-step scan materializes ~3 state tensors per step per site for
    # the backward — the dominant training-memory term).  Much cheaper to
    # recompute than whole layers (convs are not re-run), so this is the
    # preferred way to fit T=4/640px training in HBM; ``remat=True`` on
    # build_model remains the big hammer (every layer).
    remat_neuron: bool = False

    def replace(self, **kw: Any) -> "SNNConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_SNN = SNNConfig()

# Compute dtype policy: params live in float32, compute runs in bfloat16 on
# TPU by default (reference used CUDA AMP fp16; bf16 needs no loss scaling).
DEFAULT_COMPUTE_DTYPE = jnp.float32  # flipped to bfloat16 by trainer/bench


def autopad(k, p=None):
    """'same' padding from kernel size (reference models/common.py:47-52)."""
    if p is None:
        p = k // 2 if isinstance(k, int) else [x // 2 for x in k]
    return p
