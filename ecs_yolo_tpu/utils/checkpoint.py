"""Checkpoint save/resume (orbax).

Replaces the reference's whole-module pickles (train.py:657-676 ckpt dict
with model/ema/optimizer/epoch/best_fitness) with orbax checkpoints of the
param/EMA/optimizer pytrees plus a JSON metadata blob (model yaml, epoch,
best_fitness, date).  ``strip_optimizer`` (utils/general.py:743) becomes
saving the EMA-params-only artifact.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path,
    state,
    model_cfg: Dict,
    epoch: int = 0,
    best_fitness: float = 0.0,
    extra: Optional[Dict] = None,
):
    """Save a full training checkpoint to `path` (a directory)."""
    path = Path(path).resolve()
    ckpt = {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "ema_params": _to_host(state.ema_params),
        "opt_state": _to_host(state.opt_state),
        "step": int(state.step),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path / "tree", ckpt, force=True)
    meta = {
        "model_cfg": model_cfg,
        "epoch": epoch,
        "best_fitness": float(best_fitness),
        "date": datetime.now(timezone.utc).isoformat(),
        **(extra or {}),
    }
    with open(path / "meta.json", "w") as fh:
        json.dump(meta, fh, indent=1, default=str)


def load_checkpoint(path, template=None):
    """Load a checkpoint; returns (tree, meta)."""
    path = Path(path).resolve()
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            tree = ckptr.restore(path / "tree", item=template)
        else:
            tree = ckptr.restore(path / "tree")
    meta = {}
    mp = path / "meta.json"
    if mp.exists():
        meta = json.loads(mp.read_text())
    return tree, meta


def strip_optimizer(src, dst):
    """Final artifact: EMA params + batch stats only
    (reference utils/general.py:743 halves and drops the optimizer)."""
    tree, meta = load_checkpoint(src)
    final = {
        "params": tree["ema_params"],
        "batch_stats": tree["batch_stats"],
    }
    dst = Path(dst).resolve()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(dst / "tree", final, force=True)
    with open(dst / "meta.json", "w") as fh:
        json.dump({**meta, "stripped": True}, fh, indent=1, default=str)
