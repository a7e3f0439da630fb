"""Model-hub style loading API (reference hubconf.py:13-35 ``_create`` and
models/experimental.py:87-127 ``attempt_load``/``Ensemble``)."""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import SNNConfig
from .models.yolo import build_model, BuiltModel
from .utils.checkpoint import load_checkpoint


def create(
    cfg: str = "resnet10.yaml",
    weights: Optional[str] = None,
    nc: Optional[int] = None,
    snn: Optional[SNNConfig] = None,
    use_ema: bool = True,
    seed: int = 0,
    autoshape: bool = False,
    names: Optional[Sequence[str]] = None,
    imgsz: int = 640,
):
    """Build a model and (optionally) load a checkpoint.

    Returns (BuiltModel, variables).  With `weights` pointing at a torch
    `.pt`, routes through the torch importer.  With ``autoshape=True``,
    returns an :class:`~ecs_yolo_tpu.autoshape.AutoShape` wrapper instead
    (reference hubconf.py:29 applying AutoShape to the created model).
    """
    model = build_model(cfg, nc=nc, snn=snn)
    variables = model.init(jax.random.PRNGKey(seed), imgsz=64)
    if weights:
        w = Path(weights)
        if w.suffix == ".pt":
            from .models.torch_import import load_torch_checkpoint, import_state_dict

            sd = load_torch_checkpoint(w)
            variables, report = import_state_dict(sd, model, variables)
        else:
            tree, _ = load_checkpoint(w)
            params = (
                tree.get("ema_params")
                if use_ema and "ema_params" in tree
                else tree.get("params", tree)
            )
            variables = {
                "params": params,
                "batch_stats": tree.get("batch_stats", {}),
            }
    if autoshape:
        from .autoshape import AutoShape

        return AutoShape(model, variables, names=names, size=imgsz)
    return model, variables


def attempt_load(weights, cfg: str, nc: Optional[int] = None, use_ema: bool = True):
    """Load one checkpoint or an Ensemble of several
    (reference models/experimental.py:87: EMA-preferred, Ensemble for lists).
    """
    if isinstance(weights, (list, tuple)) and len(weights) > 1:
        return Ensemble(
            [create(cfg, w, nc=nc, use_ema=use_ema) for w in weights]
        )
    w = weights[0] if isinstance(weights, (list, tuple)) else weights
    return create(cfg, w, nc=nc, use_ema=use_ema)


class Ensemble:
    """Prediction ensemble: concatenate per-model decoded outputs along the
    candidate axis (reference Ensemble.forward, experimental.py:110-127 —
    'nms ensemble': NMS then fuses the union)."""

    def __init__(self, members: Sequence[Tuple[BuiltModel, dict]]):
        assert members, "empty ensemble"
        self.members = list(members)
        self.head_name = members[0][0].head_name

    def __call__(self, x, training: bool = False):
        outs = []
        for model, variables in self.members:
            out = model.apply(variables, x, training=False)
            z = out.one2one[0] if self.head_name in (
                "v10Detect", "ASFF_v10Detect") else out[0]
            outs.append(z)
        axis = 1 if self.head_name == "Detect" else 2  # candidates axis
        return jnp.concatenate(outs, axis=axis)
