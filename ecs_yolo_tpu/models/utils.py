"""Model utilities: conv+BN fusing, info/FLOPs, autobatch, TTA.

Equivalents of:
* ``Model.fuse()`` (reference models/yolo.py fuse conv+bn) — folds the BN
  scale into the preceding conv kernel and neutralizes the BN to a pure bias
  add (our convs are bias-free, so the additive term stays in the BN bias).
* ``model_info`` / thop GFLOPs (models/yolo.py:349) — uses XLA's compiled
  cost analysis instead of thop.
* ``autobatch`` (utils/autobatch.py) — sizes the batch from XLA's compiled
  memory analysis instead of empirical CUDA retries.
* ``forward_augment`` TTA (models/yolo.py:262-312 + _descale_pred /
  _clip_augmented).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# fuse conv + BN
# ---------------------------------------------------------------------------


def fuse_conv_bn(variables, eps: float = 1e-5):
    """Fold BN multiplicative terms into conv kernels for inference.

    For every sibling pair conv/ + bn/ in the param tree:
      kernel' = kernel * gamma / sqrt(var + eps)   (per output channel)
      bn'     = identity-stats BN with bias = beta - mean * gamma / sqrt(var+eps)

    The remaining BN is a pure '+bias', which XLA fuses into the conv
    epilogue — matching the memory-traffic benefit of a full fuse.
    """
    import flax

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables.get("batch_stats", {}))

    def walk(p_node, s_node):
        if not isinstance(p_node, dict):
            return
        if (
            "conv" in p_node
            and "bn" in p_node
            and isinstance(p_node["conv"], dict)
            and "conv" in p_node["conv"]
            and isinstance(s_node, dict)
            and "bn" in s_node
        ):
            conv = p_node["conv"]["conv"]
            bn = p_node["bn"]["bn"]
            sbn = s_node["bn"]["bn"]
            gamma, beta = bn["scale"], bn["bias"]
            mean, var = sbn["mean"], sbn["var"]
            g = gamma / jnp.sqrt(var + eps)
            conv["kernel"] = conv["kernel"] * g  # broadcast over out channel
            if "bias" in conv:
                conv["bias"] = conv["bias"] * g + (beta - mean * g)
                bn["scale"] = jnp.ones_like(gamma)
                bn["bias"] = jnp.zeros_like(beta)
            else:
                bn["scale"] = jnp.ones_like(gamma)
                bn["bias"] = beta - mean * g
            sbn["mean"] = jnp.zeros_like(mean)
            sbn["var"] = jnp.ones_like(var) - eps
        for k, v in p_node.items():
            if isinstance(v, dict):
                walk(v, s_node.get(k, {}) if isinstance(s_node, dict) else {})

    walk(params, stats)
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# info / FLOPs / autobatch
# ---------------------------------------------------------------------------


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def model_info(model, variables, imgsz: int = 640, batch: int = 1) -> Dict:
    """Parameter count + compiled FLOPs/bytes (XLA cost analysis — the
    reference uses thop, models/yolo.py:349)."""
    n_params = count_params(variables["params"])

    def fwd(x):
        out = model.module.apply(variables, x, training=False)
        return out[0] if isinstance(out, tuple) else out

    x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
    lowered = jax.jit(fwd).lower(x)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    flops = float(cost.get("flops", 0.0))
    return {
        "params": n_params,
        "gflops": flops / 1e9,
        "bytes_accessed": float(cost.get("bytes accessed", 0.0)),
    }


def autobatch(model, variables, imgsz: int = 640, fraction: float = 0.8,
              device_bytes: Optional[int] = None) -> int:
    """Pick the largest power-of-2 batch whose compiled memory footprint fits
    in `fraction` of device memory (reference utils/autobatch.py sizes by
    CUDA memory; here XLA's memory analysis is exact, no retries needed)."""
    if device_bytes is None:
        dev = jax.devices()[0]
        stats = getattr(dev, "memory_stats", lambda: None)()
        device_bytes = (stats or {}).get("bytes_limit", 16 * 2**30)

    def footprint(b):
        def fwd(x):
            out = model.module.apply(variables, x, training=False)
            return out[0] if isinstance(out, tuple) else out

        x = jax.ShapeDtypeStruct((b, imgsz, imgsz, 3), jnp.float32)
        mem = jax.jit(fwd).lower(x).compile().memory_analysis()
        if mem is None:
            return None
        return (
            mem.temp_size_in_bytes
            + mem.argument_size_in_bytes
            + mem.output_size_in_bytes
        )

    best = 1
    for b in [1, 2, 4, 8, 16, 32, 64]:
        try:
            fp = footprint(b)
        except Exception:
            break
        if fp is None:
            break
        if fp <= device_bytes * fraction:
            best = b
        else:
            break
    return best


# ---------------------------------------------------------------------------
# test-time augmentation (v1 semantics)
# ---------------------------------------------------------------------------


def _scale_img(x, ratio: float, gs: int = 32):
    """Resize + pad to a gs-multiple canvas (reference utils/torch_utils
    scale_img), channels-last."""
    if ratio == 1.0:
        return x
    n, h, w, c = x.shape
    nh, nw = int(h * ratio), int(w * ratio)
    y = jax.image.resize(x, (n, nh, nw, c), "bilinear")
    ph = int(np.ceil(h * ratio / gs) * gs) - nh
    pw = int(np.ceil(w * ratio / gs) * gs) - nw
    return jnp.pad(
        y, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=0.447
    )


def forward_augment(model, variables, x, gs: int = 32):
    """TTA: scales (1, 0.83, 0.67) x flips (none, lr, none), de-scaled and
    tail-clipped (reference models/yolo.py:262-312, _descale_pred,
    _clip_augmented).  Returns [N, A', no] merged predictions (v1 head)."""
    img_h, img_w = x.shape[1:3]
    scales = [1.0, 0.83, 0.67]
    flips = [None, "lr", None]
    outs = []
    for s, f in zip(scales, flips):
        xi = jnp.flip(x, axis=2) if f == "lr" else x
        xi = _scale_img(xi, s, gs)
        z, _ = model.module.apply(variables, xi, training=False)
        z = jnp.asarray(z)
        # de-scale (reference _descale_pred)
        xy = z[..., 0:2] / s
        wh = z[..., 2:4] / s
        if f == "lr":
            xy = jnp.concatenate([img_w - xy[..., 0:1], xy[..., 1:2]], -1)
        outs.append(jnp.concatenate([xy, wh, z[..., 4:]], -1))

    # clip augmented tails (reference _clip_augmented): drop large-object
    # rows from the most-zoomed pass and small-object rows from the least
    nl = len(model.strides)
    g = sum(4**k for k in range(nl))
    e = 1
    i0 = (outs[0].shape[1] // g) * sum(4**k for k in range(e))
    outs[0] = outs[0][:, : outs[0].shape[1] - i0]
    i2 = (outs[-1].shape[1] // g) * sum(4 ** (nl - 1 - k) for k in range(e))
    outs[-1] = outs[-1][:, i2:]
    return jnp.concatenate(outs, axis=1)
