"""Import the PyTorch reference (/root/reference) for numerical-parity tests.

The reference needs three deps absent from this image — torchvision (only
`ops.nms`), `visualizer.get_local`, and `spikingjelly.activation_based.layer`
— all stubbed here with exact functional equivalents.  Bytecode writing is
disabled so the read-only reference tree stays untouched.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

REF = Path("/root/reference")
_loaded = {}


def _greedy_nms_torch(boxes, scores, iou_threshold):
    """Exact torchvision.ops.nms semantics (greedy by descending score)."""
    import torch

    order = torch.argsort(scores, descending=True)
    keep = []
    suppressed = torch.zeros(boxes.shape[0], dtype=torch.bool)
    areas = (boxes[:, 2] - boxes[:, 0]).clamp(min=0) * (
        boxes[:, 3] - boxes[:, 1]
    ).clamp(min=0)
    for i in order.tolist():
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = torch.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = torch.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = torch.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = torch.minimum(boxes[i, 3], boxes[:, 3])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[i] + areas - inter + 1e-7)
        suppressed |= iou > iou_threshold
    return torch.tensor(keep, dtype=torch.long)


def _ensure_font():
    """reference utils/plots.py:61 check_font downloads Arial.ttf at import
    time; zero-egress here, so pre-seed it with a local TTF."""
    font = Path.home() / ".config" / "Ultralytics" / "Arial.ttf"
    if font.exists():
        return
    try:
        import matplotlib

        src = (Path(matplotlib.__file__).parent / "mpl-data" / "fonts"
               / "ttf" / "DejaVuSans.ttf")
        if src.exists():
            font.parent.mkdir(parents=True, exist_ok=True)
            font.write_bytes(src.read_bytes())
    except ImportError:
        pass


def _install_stubs():
    import torch

    _ensure_font()

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        ops.nms = _greedy_nms_torch
        tv.ops = ops
        tv.__version__ = "0.0.0-stub"
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops

    if "visualizer" not in sys.modules:
        vis = types.ModuleType("visualizer")

        class _GetLocal:
            is_activate = False

            def activate(self):
                self.is_activate = True

            def __call__(self, *a, **k):
                return lambda fn: fn

            cache = {}

        vis.get_local = _GetLocal()
        sys.modules["visualizer"] = vis

    if "pkg_resources" not in sys.modules:
        pkg = types.ModuleType("pkg_resources")

        def parse_version(v):
            return tuple(int(p) for p in str(v).split("+")[0].split(".")[:3]
                         if p.isdigit())

        pkg.parse_version = parse_version
        sys.modules["pkg_resources"] = pkg

    if "spikingjelly" not in sys.modules:
        sj = types.ModuleType("spikingjelly")
        ab = types.ModuleType("spikingjelly.activation_based")
        layer = types.ModuleType("spikingjelly.activation_based.layer")
        layer.Linear = torch.nn.Linear
        neuron = types.ModuleType("spikingjelly.activation_based.neuron")

        class _LIFNode(torch.nn.Module):
            """Multi-step LIF (spikingjelly semantics, only what common2.py
            needs): u = u + (x - u)/tau; spike = H(u - v_th); hard reset."""

            def __init__(self, tau=2.0, v_threshold=1.0,
                         surrogate_function=None, **kw):
                super().__init__()
                self.tau, self.v_th = tau, v_threshold

            def forward(self, x):  # [T, ...]
                u = torch.zeros_like(x[0])
                out = []
                for t in range(x.shape[0]):
                    u = u + (x[t] - u) / self.tau
                    s = (u >= self.v_th).to(x.dtype)
                    u = u * (1 - s)
                    out.append(s)
                return torch.stack(out)

        neuron.LIFNode = _LIFNode
        functional = types.ModuleType(
            "spikingjelly.activation_based.functional"
        )
        functional.set_step_mode = lambda *a, **k: None
        functional.set_backend = lambda *a, **k: None
        surrogate = types.ModuleType(
            "spikingjelly.activation_based.surrogate"
        )
        surrogate.ATan = lambda *a, **k: None
        ab.layer, ab.neuron = layer, neuron
        ab.functional, ab.surrogate = functional, surrogate
        sj.activation_based = ab
        for name, m in [
            ("spikingjelly", sj),
            ("spikingjelly.activation_based", ab),
            ("spikingjelly.activation_based.layer", layer),
            ("spikingjelly.activation_based.neuron", neuron),
            ("spikingjelly.activation_based.functional", functional),
            ("spikingjelly.activation_based.surrogate", surrogate),
        ]:
            sys.modules[name] = m


def load(module: str):
    """Import a reference module (e.g. 'models.common') with stubs installed
    and /root/reference on sys.path.  Cached."""
    if module in _loaded:
        return _loaded[module]
    _install_stubs()
    sys.dont_write_bytecode = True
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    import importlib

    mod = importlib.import_module(module)
    _loaded[module] = mod
    return mod
