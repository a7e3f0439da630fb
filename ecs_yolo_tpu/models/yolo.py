"""Model assembly: YAML -> flax module graph.

Re-design of the reference's ``parse_model`` + ``Model``
(reference models/yolo.py:167-553, models/yolo_snn.py:622-950) with:

* a safe block registry instead of ``eval()`` of YAML strings,
* stride probing via ``jax.eval_shape`` (abstract — no real forward),
* one assembler covering both generations (anchor-based ``Detect`` and
  anchor-free ``DDetect``/``DualDDetect``/``v10Detect`` heads),
* first-class event-mode input: a 5-D ``[N,T,H,W,C]`` batch is transposed to
  ``[T,N,...]``; a 4-D static image is replicated T times (the reference
  needs a manual file swap for this, README.md:42, SURVEY §3.4).
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn
import yaml

from ..config import SNNConfig, DEFAULT_SNN
from ..nn import blocks as B
from ..nn import blocks_ext as BX
from ..nn import blocks_tail as BT
from ..nn import experimental as BE
from ..nn import blocks_v9 as BV
from ..nn import blocks_star as BS
from ..nn import blocks_tail2 as BT2
from ..nn import heads as H
from ..nn import segment as SEG

YAML_DIR = Path(__file__).parent / "yaml"


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

# blocks whose first YAML arg is the output-channel count (width-scaled)
C2_BLOCKS = {
    "Conv": B.Conv,
    "Conv_A": B.Conv_A,
    "Conv_B": B.Conv_B,
    "Conv_1": B.Conv_1,
    "Conv_2": B.Conv_2,
    "Conv_3": B.Conv_3,
    "Conv_4": B.Conv_4,
    "Conv_5": B.Conv_5,
    "Conv_6": B.Conv_6,
    "BasicBlock": B.BasicBlock,
    "BasicBlock_1": B.BasicBlock_1,
    "BasicBlock_2": B.BasicBlock_2,
    "Concat_res2": B.Concat_res2,
    "shortcut": B.Shortcut,
    "DepthWiseConv": B.DepthWiseConv,
    # extended families (nn/blocks_ext.py)
    "DWConv": BX.DWConv,
    "LightConv": BX.LightConv,
    "Bottleneck": BX.Bottleneck,
    "BottleneckCSP": BX.BottleneckCSP,
    "C3": BX.C3,
    "C3Ghost": BX.C3Ghost,
    "C3SPP": BX.C3SPP,
    "C2f": BX.C2f,
    "SPP": BX.SPP,
    "SPPF": BX.SPPF,
    "Focus": BX.Focus,
    "GhostConv": BX.GhostConv,
    "GhostBottleneck": BX.GhostBottleneck,
    "GSConv": BX.GSConv,
    "BasicBlock_6": BX.BasicBlock_6,
    "BasicBlock_1s": BX.BasicBlock_1s,
    "StarBlock_2": BX.StarBlock_2,
    "RepConv": BX.RepConv,
    "RepC3": BX.RepC3,
    "MHSA": BX.MHSA,
    "BottleneckTransformer": BX.BottleneckTransformer,
    "BoT3": BX.BoT3,
    # long tail (nn/blocks_tail.py)
    "Bottleneck_1": BT.Bottleneck_1,
    "Bottleneck_2": BT.Bottleneck_2,
    "Bottleneck_3": BT.Bottleneck_3,
    "Bottleneck_4": BT.Bottleneck_4,
    "BasicBlock_3": BT.BasicBlock_3,
    "BasicBlock_4": BT.BasicBlock_4,
    "BasicBlock_5": BT.BasicBlock_5,
    "BasicBlock_ms": BT.BasicBlock_ms,
    "ConcatBlock_ms": BT.ConcatBlock_ms,
    "Concat_res3": BT.Concat_res3,
    "Concat_res4": BT.Concat_res4,
    "Concat_res5": BT.Concat_res5,
    "Concat_res6": BT.Concat_res6,
    "DualConv": BT.DualConv,
    "MobileNetV3": BT.MobileNetV3,
    "C3TR": BT.C3TR,
    "TransformerBlock": BT.TransformerBlock,
    "CrossConv": BE.CrossConv,
    "MixConv2d": BE.MixConv2d,
    # YOLOv9 family (nn/blocks_v9.py)
    "RepConvN": BV.RepConvN,
    "RepNBottleneck": BV.RepNBottleneck,
    "RepNCSP": BV.RepNCSP,
    "RepNCSPELAN4": BV.RepNCSPELAN4,
    "StarBlock": BS.StarBlock,
    "StarBlock_1": BS.StarBlock_1,
    "StarBlock_3": BS.StarBlock_3,
    "MStarBlock": BS.MStarBlock,
    "BasicBlock_2C3": BV.BasicBlock_2C3,
    "BasicBlock_1C3": BV.BasicBlock_1C3,
    "Concat_res2C3": BV.Concat_res2C3,
    # last tail slice (nn/blocks_tail2.py, nn/blocks_star.py)
    "StarBlock_4": BS.StarBlock_4,
    "StarBlock_5": BS.StarBlock_5,
    "StarSConv": BS.StarSConv,
    "MStarBlock_2": BS.MStarBlock_2,
    "StarBlock_2C2f": BS.StarBlock_2C2f,
    "BasicBlock_2C2f": BT2.BasicBlock_2C2f,
    "BasicBlock_1C2f": BT2.BasicBlock_1C2f,
    "Concat_res2C2f": BT2.Concat_res2C2f,
    "HetConv": BT2.HetConv,
    "AKConv": BT2.AKConv,
    "ResNetBlock": BT2.ResNetBlock,
    "ResNetLayerBasic": BT2.ResNetLayerBasic,
    "ResNetLayerBo": BT2.ResNetLayerBo,
    "BasicBlock_ms1": BT2.BasicBlock_ms1,
    "BasicBlock_1n": BT2.BasicBlock_1n,
    "BasicBlock_1m": BT2.BasicBlock_1m,
    "StarBlock_1s": BS.StarBlock_1s,
}

# blocks that repeat n times by inserting the count as the arg after c2
# (reference models/yolo.py:489-494)
CSP_N_BLOCKS = {"BottleneckCSP", "C3", "C3Ghost", "C2f", "RepC3", "BoT3", "C3TR",
                "RepNCSP", "BasicBlock_2C3", "BasicBlock_1C3", "Concat_res2C3",
                "BasicBlock_2C2f", "BasicBlock_1C2f", "Concat_res2C2f"}

# blocks that keep the input channel count; args passed through verbatim
PASS_BLOCKS = {
    "Sample": B.Sample,
    "Pools": B.Pools,
    "zeropad": B.ZeroPad,
    "mem_update": B.MemUpdate,
    "Conv_7": B.Conv_7,
    "AIFI": BX.AIFI,
    "EMA": BX.EMAAttention,
    "DSSA": BX.DSSA,
    "SELayer": BX.SELayer,
    "Silence": BX.Silence,
    "FasterNetBlock": BT.FasterNetBlock,
    "ELA": BT.ELA,
    "CoT": BT.CoT,
    "ScConv": BT.ScConv,
    "PartialConv": BT.PartialConv,
    "GN": BT2.GN,
    "TPReLU": BT2.TPReLU,
    "ClippedTPReLU": BS.ClippedTPReLU,
    "Attention": BT2.Attention,
    "OSRAAttention": BT2.OSRAAttention,
    "DynamicConv2d": BT2.DynamicConv2d,
    "TransxnetHybridTokenMixer": BT2.TransxnetHybridTokenMixer,
}

HEADS = {
    "Detect": H.Detect,
    "DDetect": H.DDetect,
    "DualDetect": H.DualDetect,
    "DualDDetect": H.DualDDetect,
    "TripleDetect": H.TripleDetect,
    "TripleDDetect": H.TripleDDetect,
    "v10Detect": H.v10Detect,
    "ASFF_DDetect": H.ASFF_DDetect,
    "ASFF_v10Detect": H.ASFF_v10Detect,
    "Segment": SEG.Segment,
    "Panoptic": SEG.Panoptic,
}

EXTRA_BLOCKS = {
    "Contract": BX.Contract,
    "Expand": BX.Expand,
    "CBLinear": BX.CBLinear,
    "CBFuse": BX.CBFuse,
    "ASFF2": BX.ASFF2,
    "ASFF3": BX.ASFF3,
    "ContextGuideFusionModule": BT.ContextGuideFusionModule,
    "ContextGuideFusionModulev2": BT.ContextGuideFusionModulev2,
    "HGBlock": BT.HGBlock,
    "Sum": BE.Sum,
}

SNN_AWARE = (
    set(C2_BLOCKS)
    | {"mem_update", "Conv_7", "AIFI", "EMA", "DSSA", "SELayer",
       "CBLinear", "ASFF2", "ASFF3", "FasterNetBlock", "ELA", "CoT",
       "ScConv", "HGBlock", "ContextGuideFusionModule",
       "ContextGuideFusionModulev2",
       "Attention", "OSRAAttention", "DynamicConv2d",
       "TransxnetHybridTokenMixer"}
    | set(HEADS)
) - {"Contract", "Expand", "Silence", "CBFuse", "DropPath", "PartialConv"}


def make_divisible(x, divisor: int = 8):
    return math.ceil(x / divisor) * divisor


def _freeze(v):
    """Deep-convert lists to tuples so specs are hashable linen fields."""
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    return v


def _resolve_arg(a, d):
    """Safe replacement for the reference's eval() of YAML arg strings."""
    if isinstance(a, str):
        if a == "nc":
            return d["nc"]
        if a == "anchors":
            return d.get("anchors")
        if a == "None":
            return None
    return a


# ---------------------------------------------------------------------------
# parse
# ---------------------------------------------------------------------------


def parse_model(
    d: Dict[str, Any], ch: int
) -> Tuple[Tuple, Tuple[int, ...], List[int], Dict[str, Any]]:
    """Parse a model YAML dict into an immutable layer spec.

    Returns (spec, save, ch_list, head_info).  spec rows are
    ``(f, n, name, args)`` with ``args`` fully resolved except head
    strides/anchors, which are finalized by :func:`build_model` after the
    stride probe.
    """
    anchors, nc = d.get("anchors"), d["nc"]
    gd, gw = d.get("depth_multiple", 1.0), d.get("width_multiple", 1.0)
    na = (len(anchors[0]) // 2) if isinstance(anchors, list) else (anchors or 0)
    no = na * (nc + 5)

    rows = []
    save: List[int] = []
    chs = [ch]
    head_info: Dict[str, Any] = {}
    for i, (f, n, name, args) in enumerate(d["backbone"] + d["head"]):
        args = [_resolve_arg(a, d) for a in args]
        n = max(round(n * gd), 1) if n > 1 else n

        if name in C2_BLOCKS:
            c1 = chs[f if isinstance(f, int) else f[0]]
            c2 = args[0]
            if c2 != no:
                c2 = make_divisible(c2 * gw, 8)
            args = [c2, *args[1:]]
            if name in CSP_N_BLOCKS:
                args.insert(1, n)  # repeat count is the module's own field
                n = 1
        elif name == "Contract":
            c2 = chs[f] * args[0] ** 2
        elif name == "Expand":
            c2 = chs[f] // args[0] ** 2
        elif name == "CBLinear":
            c2 = tuple(args[0])
            args = [tuple(args[0]), *args[1:]]
        elif name == "CBFuse":
            c2 = chs[f[-1]]
            args = [tuple(args[0]) if args else ()]
        elif name in ("ASFF2", "ASFF3"):
            c2 = chs[f[args[0]]] if isinstance(f, (list, tuple)) else chs[f]
        elif name in ("ContextGuideFusionModule", "ContextGuideFusionModulev2"):
            c2 = 2 * chs[f[1]]
        elif name == "Sum":
            c2 = chs[f[0]]
        elif name == "HGBlock":
            # args: [cm, c2, k, ...] with repeat count inserted (ref :527)
            cm, c2 = args[0], args[1]
            args = [cm, c2, *args[2:]]
            if n > 1:
                args.insert(3, n)
                n = 1
        elif name == "Concat":
            c2 = sum(chs[x] for x in f)
        elif name in HEADS:
            c2 = chs[f if isinstance(f, int) else f[0]]
            head_info = {"name": name, "f": f, "index": i, "nc": args[0],
                         "extra": tuple(args[1:])}
            if name == "Detect":
                a = args[1]
                if isinstance(a, int):  # e.g. `anchors: 2` anchor-free count
                    a = [list(range(a * 2))] * len(f)
                head_info["anchors_px"] = a
        elif name in PASS_BLOCKS:
            c2 = chs[f if isinstance(f, int) else f[0]]
        else:
            raise KeyError(
                f"unknown block {name!r} at layer {i}; add it to the registry"
            )

        rows.append((_freeze(f), n, name, _freeze(args)))
        save.extend(
            x % i for x in ([f] if isinstance(f, int) else f) if x != -1
        )
        if i == 0:
            chs = []
        chs.append(c2)
    return tuple(rows), tuple(sorted(set(save))), chs, head_info


# ---------------------------------------------------------------------------
# module construction
# ---------------------------------------------------------------------------

# Blocks that participate in width-packed C<=64 stages (SNNConfig.packed_c64):
# Conv_1 can START a stage (stem emits packed), BasicBlock_2 can run packed
# and END a stage via its stride-2 conv1.  See snn/packed_spread.py.
_PACK_F = 2


# Blocks whose output on a T-replicated input is itself T-replicated: pure
# per-timestep conv/BN/pool/pad/resize with NO neuron scan and NO cross-T op.
# (Every spiking block — BasicBlock*, Concat_res*, Conv/Conv_2.. — starts
# with mem_update, so in practice the T-invariant prefix is the stem.)
_T_INVARIANT = {"Conv_1", "Conv_A", "Pools", "zeropad", "Sample"}


def _t_invariant_prefix(rows, save) -> int:
    """Longest leading chain of T-invariant, linearly-fed, unsaved layers.

    For a static-image forward these layers are computed once at T=1 and the
    result broadcast to T (see SNNConfig.stem_dedup).  A saved layer is
    excluded so the from/save cache only ever holds full-T tensors.
    """
    n = 0
    for i, (f, _, name, _args) in enumerate(rows):
        if name not in _T_INVARIANT or f != -1 or i in save:
            break
        n = i + 1
    return n


def _plan_packing(rows, chs, enabled: bool):
    """Per-layer (packed_in, packed_out) width-pack factors.

    A layer's output is packed iff it is a Conv_1/BasicBlock_2 with
    c2*_PACK_F <= 128 and EVERY consumer is a BasicBlock_2 that can accept
    the packed layout (staying packed, or exiting through its stride-2
    conv1).  Computed as a shrinking fixed point so an unpackable consumer
    anywhere unpacks the whole upstream chain rather than inserting
    relayouts (the relayouts are what made per-site packing a net loss).
    """
    n = len(rows)
    plan = [(1, 1)] * n
    if not enabled or n == 0:
        return tuple(plan)

    def block_ks(j):
        args = rows[j][3]
        k = args[1] if len(args) > 1 else 3
        s = args[2] if len(args) > 2 else 1
        return k, s

    def src_of(j):
        f = rows[j][0]
        if not isinstance(f, int):
            return None
        return (j - 1) if f == -1 else f % j

    consumers = [[] for _ in range(n)]
    for j in range(1, n):
        f = rows[j][0]
        for s_ in [f] if isinstance(f, int) else f:
            src = (j - 1) if s_ == -1 else s_ % j
            consumers[src].append(j)

    out = []
    for i in range(n):
        name = rows[i][2]
        ok = (
            name in ("Conv_1", "BasicBlock_2")
            and chs[i] * _PACK_F <= 128
            and consumers[i]
        )
        if ok and name == "BasicBlock_2":
            k, s = block_ks(i)
            c1 = chs[src_of(i)] if i > 0 else None
            # packed interior block: k in (1,3); identity shortcut needs
            # matching channels at s=1; strided needs s == _PACK_F
            ok = k in (1, 3) and (s == _PACK_F or (s == 1 and c1 == chs[i]))
        out.append(bool(ok))

    def accepts_packed(j):
        name = rows[j][2]
        if not isinstance(rows[j][0], int):
            return False
        k, s = block_ks(j)
        if name == "BasicBlock_2":
            if out[j]:
                return True  # stays packed (validated above)
            return k in (1, 3) and s == _PACK_F  # free packed->unpacked exit
        if name == "Concat_res2":
            # exit-only: conv1 consumes packed; the channel-concat shortcut
            # pools each piece packed (pooling unpacks for free and commutes
            # with concat) — needs the channel-expanding branch (c1 < c2)
            src = src_of(j)
            return (
                k in (1, 3) and s == _PACK_F
                and src is not None and chs[src] < chs[j]
            )
        return False

    changed = True
    while changed:
        changed = False
        for i in range(n):
            if not out[i]:
                continue
            if not all(accepts_packed(j) for j in consumers[i]):
                out[i] = False
                changed = True
            elif rows[i][2] == "BasicBlock_2":
                src = src_of(i)
                if src is None or not out[src]:
                    out[i] = False
                    changed = True

    for j in range(n):
        src = src_of(j)
        f_in = _PACK_F if (src is not None and out[src]) else 1
        f_out = _PACK_F if out[j] else 1
        plan[j] = (f_in, f_out)
    return tuple(plan)


class _Repeat(nn.Module):
    """n sequential copies of a block (reference nn.Sequential repeat)."""

    name_: str
    args: Tuple
    n: int
    snn: SNNConfig
    packing: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, training: bool = False):
        f_in, f_out = self.packing
        for j in range(self.n):
            pk = (f_in if j == 0 else f_out, f_out)
            x = _construct(self.name_, self.args, self.snn, mod_name=str(j),
                           packing=pk)(x, training=training)
        return x


def _construct(name: str, args: Tuple, snn: SNNConfig, mod_name=None,
               packing=(1, 1)):
    cls = (
        C2_BLOCKS.get(name)
        or PASS_BLOCKS.get(name)
        or HEADS.get(name)
        or EXTRA_BLOCKS.get(name)
    )
    kwargs = {}
    if name in SNN_AWARE:
        kwargs["snn"] = snn
    if mod_name is not None:
        kwargs["name"] = mod_name
    if packing != (1, 1):
        if name == "Conv_1":
            kwargs["packed_out"] = packing[1]
        elif name == "BasicBlock_2":
            kwargs["packed_in"], kwargs["packed_out"] = packing
        elif name == "Concat_res2":
            kwargs["packed_in"] = packing[0]
    return cls(*args, **kwargs)


def _make_layer(row, snn: SNNConfig, remat: bool = False, packing=(1, 1)):
    f, n, name, args = row
    if name == "Concat":
        cls_args = dict()
        mod = B.Concat()
    elif n > 1:
        mod = _Repeat(name_=name, args=args, n=n, snn=snn, packing=packing)
    else:
        mod = _construct(name, args, snn, packing=packing)
    if remat and name not in HEADS:
        # rematerialize activations during backward (jax.checkpoint): trades
        # ~FLOPs for HBM so T=4 training fits (the reference has no answer
        # to activation memory beyond smaller batches)
        cls = type(mod)
        wrapped = nn.remat(cls, static_argnums=(2,))
        kwargs = {f.name: getattr(mod, f.name) for f in cls.__dataclass_fields__.values()
                  if f.name not in ("parent", "name")}
        return wrapped(**kwargs)
    return mod


# ---------------------------------------------------------------------------
# the model
# ---------------------------------------------------------------------------


class DetectionModel(nn.Module):
    """Graph-walking detection model (reference `Model._forward_once`,
    models/yolo.py:284-312), built from an immutable parsed spec."""

    spec: Tuple
    save: Tuple[int, ...]
    snn: SNNConfig = DEFAULT_SNN
    remat: bool = False
    packing: Tuple = ()  # per-layer (packed_in, packed_out), from _plan_packing
    tinv_prefix: int = 0  # leading T-invariant layers, from _t_invariant_prefix

    def setup(self):
        packing = self.packing or ((1, 1),) * len(self.spec)
        self.layers = [
            _make_layer(row, self.snn, self.remat, pk)
            for row, pk in zip(self.spec, packing)
        ]

    def prepare_input(self, x: jax.Array) -> jax.Array:
        """Static image [N,H,W,C] -> replicate T times; event batch
        [N,T,H,W,C] -> [T,N,H,W,C] (first-class event mode)."""
        if x.ndim == 4:
            t = self.snn.time_window
            return jnp.broadcast_to(x[None], (t,) + x.shape)
        if x.ndim == 5:
            return jnp.transpose(x, (1, 0, 2, 3, 4))
        raise ValueError(f"expected 4-D or 5-D input, got {x.shape}")

    def __call__(self, x: jax.Array, training: bool = False):
        start = 0
        if x.ndim == 4 and self.tinv_prefix > 0:
            # static image: run the T-invariant stem once at T=1 and
            # broadcast — identical math to replicate-then-compute
            # (SNNConfig.stem_dedup rationale in config.py)
            x = x[None]
            for i in range(self.tinv_prefix):
                x = self.layers[i](x, training)
            x = jnp.broadcast_to(
                x, (self.snn.time_window,) + x.shape[1:]
            )
            start = self.tinv_prefix
        else:
            x = self.prepare_input(x)
        cache: Dict[int, jax.Array] = {}
        for i, (row, layer) in list(enumerate(zip(self.spec, self.layers)))[start:]:
            f = row[0]
            if f != -1:
                if isinstance(f, int):
                    x = cache[f % i]
                else:
                    x = [x if j == -1 else cache[j % i] for j in f]
            x = layer(x, training)
            if i in self.save:
                cache[i] = x
        return x


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------


def load_cfg(cfg: Union[str, Path, Dict]) -> Dict:
    if isinstance(cfg, dict):
        return dict(cfg)
    p = Path(cfg)
    if not p.exists():
        p = YAML_DIR / Path(cfg).name
    with open(p) as fh:
        return yaml.safe_load(fh)


def _head_feat_shapes(out, head_name: str):
    """Extract per-level spatial shapes from the head's training output."""
    if head_name == "Detect":
        return [(f.shape[2], f.shape[3]) for f in out]  # [N,na,ny,nx,no]
    if head_name in ("DDetect", "ASFF_DDetect"):
        return [(f.shape[2], f.shape[3]) for f in out]  # [N,no,h,w]
    if head_name in ("DualDetect", "DualDDetect"):
        return [(f.shape[2], f.shape[3]) for f in out[1]]
    if head_name in ("TripleDetect", "TripleDDetect"):
        return [(f.shape[2], f.shape[3]) for f in out[-1]]
    if head_name in ("v10Detect", "ASFF_v10Detect"):
        return [(f.shape[2], f.shape[3]) for f in out.one2many]
    if head_name in ("Segment", "Panoptic"):
        return [(f.shape[2], f.shape[3]) for f in out[0]]
    raise KeyError(head_name)


def check_anchor_order(anchors: List[List[float]], strides: Sequence[float]):
    """Reverse anchors if their area order disagrees with the stride order
    (reference utils/autoanchor.py:18-25)."""
    areas = [sum(a[i] * a[i + 1] for i in range(0, len(a), 2)) for a in anchors]
    da = areas[-1] - areas[0]
    ds = strides[-1] - strides[0]
    if (da < 0) != (ds < 0) and da != 0:
        return anchors[::-1]
    return anchors


class BuiltModel:
    """A built model: the flax module plus its static metadata."""

    def __init__(self, module, cfg, spec, save, head_info, strides, snn):
        self.module = module
        self.cfg = cfg
        self.spec = spec
        self.save = save
        self.head = head_info
        self.strides = strides
        self.snn = snn
        self.nc = head_info.get("nc", cfg.get("nc"))

    @property
    def head_name(self):
        return self.head["name"]

    def init(self, key, imgsz: int = 640, ch: int = 3, batch: int = 1):
        x = jnp.zeros((batch, imgsz, imgsz, ch), jnp.float32)
        variables = self.module.init(key, x, training=True)
        return init_head_biases(self, variables)

    def apply(self, variables, x, training=False, **kw):
        return self.module.apply(variables, x, training=training, **kw)


def build_model(
    cfg: Union[str, Path, Dict],
    ch: int = 3,
    nc: Optional[int] = None,
    anchors=None,
    snn: Optional[SNNConfig] = None,
    probe: int = 256,
    remat: bool = False,
) -> BuiltModel:
    """Two-phase build: parse -> abstract stride probe -> final module."""
    d = load_cfg(cfg)
    if nc is not None:
        d["nc"] = nc
    if anchors is not None:
        d["anchors"] = anchors
    snn = snn or DEFAULT_SNN

    spec, save, chs, head_info = parse_model(d, ch)
    if not head_info:
        raise ValueError("model YAML has no detection head")
    hname, hidx = head_info["name"], head_info["index"]

    packing = _plan_packing(spec, chs, snn.packed_c64)
    tinv = _t_invariant_prefix(spec, save) if snn.stem_dedup else 0

    # phase 1: placeholder strides for the abstract probe
    probe_spec = _with_head_args(spec, hidx, hname, head_info, strides=None, probe=True)
    probe_model = DetectionModel(spec=probe_spec, save=save, snn=snn,
                                 packing=packing, tinv_prefix=tinv)
    key = jax.random.PRNGKey(0)

    def _probe():
        x = jnp.zeros((1, probe, probe, ch), jnp.float32)
        out, _ = probe_model.init_with_output(key, x, training=True)
        return out

    out_shapes = jax.eval_shape(_probe)
    shapes = _head_feat_shapes(out_shapes, hname)
    strides = tuple(float(probe // h) for h, _ in shapes)
    head_info["strides"] = strides

    # phase 2: final spec with real strides (+ grid-unit anchors for v1)
    final_spec = _with_head_args(spec, hidx, hname, head_info, strides=strides)
    model = DetectionModel(spec=final_spec, save=save, snn=snn, remat=remat,
                           packing=packing, tinv_prefix=tinv)
    return BuiltModel(model, d, final_spec, save, head_info, strides, snn)


def _with_head_args(spec, hidx, hname, head_info, strides, probe=False):
    rows = list(spec)
    f, n, name, _ = rows[hidx]
    nc = head_info["nc"]
    nl = len(f) if isinstance(f, tuple) else 1
    if strides is None:
        strides = tuple(float(2 ** (3 + i)) for i in range(nl))  # placeholder
    if hname == "Detect":
        a_px = head_info["anchors_px"]
        a_grid = [
            [v / s for v in level] for level, s in zip(a_px, strides)
        ]
        if not probe:
            a_grid = check_anchor_order(a_grid, strides)
        head_info["anchors_grid"] = a_grid
        args = (nc, _freeze(a_grid), tuple(strides))
    elif hname == "Segment":
        extra = head_info.get("extra", ())
        nm = extra[0] if len(extra) > 0 else 32
        npr = extra[1] if len(extra) > 1 else 256
        args = (nc, nm, npr, 16, tuple(strides))
    elif hname == "Panoptic":
        extra = head_info.get("extra", ())
        sem_nc = extra[0] if len(extra) > 0 else 93
        nm = extra[1] if len(extra) > 1 else 32
        npr = extra[2] if len(extra) > 2 else 256
        args = (nc, sem_nc, nm, npr, 16, tuple(strides))
    else:
        # anchor-free heads: (nc, reg_max, strides)
        args = (nc, 16, tuple(strides))
    rows[hidx] = (f, n, name, args)
    return tuple(rows)


# ---------------------------------------------------------------------------
# head bias init (post-init param surgery)
# ---------------------------------------------------------------------------


def _layer_param_name(model: BuiltModel) -> str:
    return f"layers_{model.head['index']}"


def init_head_biases(model: BuiltModel, variables, imgsz: int = 640):
    """Focal-style prior bias init.

    v1 (reference models/yolo.py:363-371): per level, obj bias += log(8/(640/s)^2),
    cls biases += log(0.6/(nc-0.999999)).
    DFL heads (reference models/yolo_snn.py:133-139): box tower bias = 1.0,
    cls tower bias[:nc] = log(5 / nc / (640/s)^2).
    """
    import flax

    params = flax.core.unfreeze(variables["params"]) if hasattr(
        variables["params"], "unfreeze"
    ) else dict(variables["params"])
    lname = _layer_param_name(model)
    head = params.get(lname)
    if head is None:
        return variables
    nc = model.nc
    hname = model.head_name
    if hname in ("ASFF_DDetect", "ASFF_v10Detect"):
        head = head.get("det", head)
        hname = {"ASFF_DDetect": "DDetect", "ASFF_v10Detect": "v10Detect"}[hname]
    if hname == "Panoptic":
        head = head.get("seg", head)
        hname = "Segment"

    if hname == "Detect":
        na = len(model.head["anchors_grid"][0]) // 2
        no = nc + 5
        for i, s in enumerate(model.strides):
            bias = head[f"m{i}"]["conv"]["bias"]
            b = bias.reshape(na, no)
            b = b.at[:, 4].add(math.log(8 / (640 / s) ** 2))
            b = b.at[:, 5:].add(math.log(0.6 / (nc - 0.999999)))
            head[f"m{i}"]["conv"]["bias"] = b.reshape(-1)
    elif hname in ("DDetect", "DualDetect", "DualDDetect", "TripleDetect",
                   "TripleDDetect", "v10Detect", "Segment"):
        dual = [("a_cv2_", "a_cv3_"), ("b_cv2_", "b_cv3_")]
        triple = dual + [("c_cv2_", "c_cv3_")]
        prefixes = {
            "DDetect": [("cv2_", "cv3_")],
            "Segment": [("cv2_", "cv3_")],
            "DualDetect": dual,
            "DualDDetect": dual,
            "TripleDetect": triple,
            "TripleDDetect": triple,
            "v10Detect": [("cv2_", "cv3_"), ("one2one_cv2_", "one2one_cv3_")],
        }[hname]
        for box_p, cls_p in prefixes:
            for i, s in enumerate(model.strides):
                bkey, ckey = f"{box_p}{i}", f"{cls_p}{i}"
                if bkey not in head:
                    continue
                bb = head[bkey]["2"]["conv"]["bias"]
                head[bkey]["2"]["conv"]["bias"] = jnp.ones_like(bb)
                cb = head[ckey]["2"]["conv"]["bias"]
                val = math.log(5 / nc / (640 / s) ** 2)
                head[ckey]["2"]["conv"]["bias"] = cb.at[:nc].set(val)

    new_vars = dict(variables)
    new_vars["params"] = params
    return new_vars
