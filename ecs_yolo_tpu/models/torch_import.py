"""Torch checkpoint importer: reference ``.pt`` state_dicts -> param pytrees.

The reference pickles whole nn.Modules (train.py:657-668); released
checkpoints (README.md:27-31: ECSLIF.pt, kittires10.pt, resnet18/34.pt,
starnet10.pt) can be validated against this framework by mapping
``model.{i}.*`` torch names onto our ``layers_{i}/...`` tree keyed by the
same parse_model layer index.

Weight layout transforms:
  conv OIHW -> HWIO, depthwise torch [C,1,kh,kw] -> [kh,kw,1,C],
  BN weight/bias/running_mean/running_var -> scale/bias + batch_stats,
  Conv_7 conv3d [1,T,1,1,1] -> [1,1,T,1].
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch conv weight OIHW (groups folded into O) -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _seq_names(block: str) -> List[Tuple[str, str]]:
    """(torch sub-path, our sub-path) pairs for a block's parameters.

    Torch paths follow the reference nn.Sequential layouts
    (models/common.py: residual_function/shortcut orderings).
    """
    mem = lambda t, o: [
        (f"{t}.spread.0.weight", f"{o}/spread_dw_kernel"),
        (f"{t}.spread.0.bias", f"{o}/spread_dw_bias"),
        (f"{t}.spread.1.weight", f"{o}/spread_pw_kernel"),
        (f"{t}.spread.1.bias", f"{o}/spread_pw_bias"),
    ]
    conv = lambda t, o: [(f"{t}.weight", f"{o}/conv/kernel")]
    bn = lambda t, o: [
        (f"{t}.bn.weight", f"{o}/bn/scale"),
        (f"{t}.bn.bias", f"{o}/bn/bias"),
        (f"{t}.bn.running_mean", f"stats:{o}/bn/mean"),
        (f"{t}.bn.running_var", f"stats:{o}/bn/var"),
    ]

    if block in ("Conv_1", "Conv_A"):
        return conv("conv", "conv") + bn("bn", "bn")
    if block == "Conv":
        return conv("conv", "conv") + bn("bn", "bn") + mem("act", "act")
    if block in ("Conv_2", "Conv_3", "Conv_4", "Conv_B"):
        return mem("act", "act") + conv("conv", "conv") + bn("bn", "bn")
    if block in ("BasicBlock_1", "BasicBlock_2", "Concat_res2"):
        rows = (
            mem("residual_function.0", "act1")
            + conv("residual_function.1", "conv1")
            + bn("residual_function.2", "bn1")
            + mem("residual_function.3", "act2")
            + conv("residual_function.4", "conv2")
            + bn("residual_function.5", "bn2")
        )
        if block == "Concat_res2":
            rows += (
                mem("shortcut.0", "sc_act")
                + conv("shortcut.1", "sc_conv")
                + bn("shortcut.2", "sc_bn")
            )
        else:
            # downsampling shortcut: MaxPool3d (no params) then act/conv/bn
            rows += (
                mem("shortcut.1", "sc_act")
                + conv("shortcut.2", "sc_conv")
                + bn("shortcut.3", "sc_bn")
            )
        return rows
    if block == "BasicBlock":
        rows = []
        for ti, oi in [("cv1", "cv1"), ("cv2", "cv2")]:
            rows += conv(f"{ti}.conv", f"{oi}/conv") + bn(f"{ti}.bn", f"{oi}/bn")
            rows += mem(f"{ti}.act", f"{oi}/act")
        rows += conv("shortcut.0", "shortcut_conv") + bn(
            "shortcut.1", "shortcut_bn"
        )
        return rows
    return []


def _transform(torch_key: str, our_key: str, w: np.ndarray) -> np.ndarray:
    if our_key.endswith("/conv/kernel") or our_key.endswith("spread_pw_kernel"):
        return _conv_w(w)
    if our_key.endswith("spread_dw_kernel"):
        return _conv_w(w)  # [C,1,3,3] -> [3,3,1,C]
    return w


def build_mapping(spec) -> Dict[str, Tuple[str, str]]:
    """torch name -> (collection, our '/'-joined path) for a parsed spec."""
    mapping: Dict[str, Tuple[str, str]] = {}
    for i, (f, n, name, args) in enumerate(spec):
        base_t = f"model.{i}"
        base_o = f"layers_{i}"
        if name == "Detect":
            anchors = args[1]
            nl = len(anchors)
            for li in range(nl):
                mapping[f"{base_t}.m.{li}.weight"] = (
                    "params", f"{base_o}/m{li}/conv/kernel"
                )
                mapping[f"{base_t}.m.{li}.bias"] = (
                    "params", f"{base_o}/m{li}/conv/bias"
                )
                mapping[f"{base_t}.w.{li}.conv.weight"] = (
                    "params", f"{base_o}/w{li}/w"
                )
            continue
        if name == "DDetect":
            # reference models/yolo_snn.py:83-139: cv2/cv3 ModuleLists of
            # Sequential(Conv_B, Conv_B, Snn_Conv2d); our nn/heads.py towers
            # use matching child names cv2_{li}/{0,1,2}.  The DFL conv is a
            # frozen arange — identical by construction on both sides.
            nl = len(f) if isinstance(f, (list, tuple)) else 1
            for li in range(nl):
                for br in ("cv2", "cv3"):
                    for j in (0, 1):  # Conv_B: act (mem) -> conv -> bn
                        t = f"{base_t}.{br}.{li}.{j}"
                        o = f"{base_o}/{br}_{li}/{j}"
                        for ts, os_ in (
                            (f"{t}.act.spread.0.weight", f"{o}/act/spread_dw_kernel"),
                            (f"{t}.act.spread.0.bias", f"{o}/act/spread_dw_bias"),
                            (f"{t}.act.spread.1.weight", f"{o}/act/spread_pw_kernel"),
                            (f"{t}.act.spread.1.bias", f"{o}/act/spread_pw_bias"),
                            (f"{t}.conv.weight", f"{o}/conv/conv/kernel"),
                        ):
                            mapping[ts] = ("params", os_)
                        mapping[f"{t}.bn.bn.weight"] = (
                            "params", f"{o}/bn/bn/scale")
                        mapping[f"{t}.bn.bn.bias"] = (
                            "params", f"{o}/bn/bn/bias")
                        mapping[f"{t}.bn.bn.running_mean"] = (
                            "batch_stats", f"{o}/bn/bn/mean")
                        mapping[f"{t}.bn.bn.running_var"] = (
                            "batch_stats", f"{o}/bn/bn/var")
                    mapping[f"{base_t}.{br}.{li}.2.weight"] = (
                        "params", f"{base_o}/{br}_{li}/2/conv/kernel")
                    mapping[f"{base_t}.{br}.{li}.2.bias"] = (
                        "params", f"{base_o}/{br}_{li}/2/conv/bias")
            continue
        for t_sub, o_sub in _seq_names(name):
            coll = "batch_stats" if o_sub.startswith("stats:") else "params"
            o_sub = o_sub.replace("stats:", "")
            mapping[f"{base_t}.{t_sub}"] = ("params" if coll == "params" else "batch_stats",
                                            f"{base_o}/{o_sub}")
    return mapping


def import_state_dict(
    state_dict: Dict[str, np.ndarray],
    model,
    variables,
    strict: bool = False,
):
    """Copy matching torch weights into `variables`.

    Returns (new_variables, report dict with matched/missed keys).
    """
    import flax

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables.get("batch_stats", {}))
    mapping = build_mapping(model.spec)

    def set_path(tree, path: str, value):
        keys = path.split("/")
        node = tree
        for k in keys[:-1]:
            if k not in node:
                return False
            node = node[k]
        leaf = keys[-1]
        if leaf not in node:
            return False
        want = node[leaf].shape
        if tuple(value.shape) != tuple(want):
            if np.prod(value.shape) == np.prod(want):
                value = value.reshape(want)
            else:
                return False
        node[leaf] = value.astype(np.asarray(node[leaf]).dtype)
        return True

    matched, missed = [], []
    for t_key, (coll, o_path) in mapping.items():
        if t_key not in state_dict:
            missed.append(t_key)
            continue
        w = np.asarray(state_dict[t_key])
        w = _transform(t_key, o_path, w)
        ok = set_path(params if coll == "params" else stats, o_path, w)
        (matched if ok else missed).append(t_key)

    if strict and missed:
        raise KeyError(f"unmatched torch keys: {missed[:10]} (+{len(missed)-10})")
    new_vars = {"params": params, "batch_stats": stats}
    return new_vars, {"matched": matched, "missed": missed}


def load_torch_checkpoint(path) -> Dict[str, np.ndarray]:
    """Load a reference .pt and extract the (EMA-preferred) state_dict as
    numpy arrays (reference attempt_load prefers ckpt['ema'],
    models/experimental.py:93-95)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model = ckpt.get("ema") or ckpt.get("model") or ckpt
    sd = model.state_dict() if hasattr(model, "state_dict") else model
    return {k: v.detach().float().numpy() for k, v in sd.items()}
