"""Spike/attention visualization + robustness plots.

Equivalents of the reference analysis scripts:
* ``spike_heatmap`` — visi_img.py:27+: overlay per-layer spike densities on
  the input image (uses the sown spike maps instead of get_local hooks).
* ``plot_noise_robustness`` — huatu.py:8-15: mAP@0.5 vs input-noise
  intensity for LIF vs ECS-LIF.
* ``noise_sweep`` — runs the val loop under additive input noise to produce
  those curves from live models (the reference reads them from an Excel
  sheet of earlier runs).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def spike_heatmap(
    model,
    variables,
    image: np.ndarray,  # [H, W, 3] float 0-1
    layer_filter: str = "",
    save_path: Optional[str] = None,
):
    """Overlay mean spike maps (over T and channels) on the input image.

    Returns {layer_path: heatmap [h, w]} and optionally saves a figure.
    """
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(image)[None]
    # capture full spike maps: re-run with a sow filter that keeps maps
    _, aux = model.module.apply(
        variables, x, training=False, mutable=["spike_stats"],
        capture_intermediates=lambda mdl, name: name == "__call__"
        and type(mdl).__name__ == "MemUpdate",
    )
    inter = aux.get("intermediates", {})
    maps: Dict[str, np.ndarray] = {}

    def walk(node, prefix=()):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, prefix + (k,))
        elif isinstance(node, (tuple, list)):
            for v in node:
                walk(v, prefix)
        else:
            arr = np.asarray(node)
            if arr.ndim == 5:  # [T, N, h, w, C]
                key = "/".join(prefix)
                if layer_filter and layer_filter not in key:
                    return
                maps[key] = arr.mean(axis=(0, 1, 4))

    walk(inter)

    if save_path and maps:
        n = len(maps)
        cols = min(4, n)
        rows = (n + cols - 1) // cols
        fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 3 * rows))
        axes = np.array(axes).reshape(-1)
        for ax, (k, m) in zip(axes, maps.items()):
            hm = np.asarray(
                Image.fromarray(
                    (255 * (m - m.min()) / (np.ptp(m) + 1e-9)).astype(np.uint8)
                ).resize((image.shape[1], image.shape[0]))
            )
            ax.imshow(image)
            ax.imshow(hm, alpha=0.5, cmap="jet")
            ax.set_title(k.split("/")[-2][:30], fontsize=7)
            ax.axis("off")
        for ax in axes[len(maps):]:
            ax.axis("off")
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close(fig)
    return maps


def noise_sweep(
    model,
    variables,
    dataset,
    noise_levels: Sequence[float] = (0.0, 0.05, 0.1, 0.2, 0.3),
    imgsz: int = 640,
    batch_size: int = 4,
    seed: int = 0,
):
    """mAP@0.5 under additive Gaussian input noise (huatu.py's x-axis)."""
    import jax.numpy as jnp
    from .. import val as val_mod

    class NoisyDataset:
        def __init__(self, ds, sigma):
            self.ds = ds
            self.sigma = sigma

        def batches(self, *a, **k):
            rng = np.random.RandomState(seed)
            for ims, lbs, ms in self.ds.batches(*a, **k):
                if ims.dtype == np.uint8:  # uint8-transport datasets
                    ims = ims.astype(np.float32) / 255.0
                noisy = np.clip(
                    ims + rng.randn(*ims.shape).astype(np.float32) * self.sigma,
                    0.0, 1.0,
                )
                yield noisy, lbs, ms

    results = {}
    for sigma in noise_levels:
        r = val_mod.run(
            model, variables, None, imgsz=imgsz, batch_size=batch_size,
            dataset=NoisyDataset(dataset, sigma),
        )
        results[sigma] = r["map50"]
    return results


def plot_noise_robustness(
    curves: Dict[str, Dict[float, float]], save_path="noise_robustness.png"
):
    """LIF vs ECS-LIF mAP@0.5 vs noise plot (reference huatu.py:8-15)."""
    fig, ax = plt.subplots(figsize=(6, 4), tight_layout=True)
    for label, curve in curves.items():
        xs = sorted(curve)
        ax.plot(xs, [curve[x] for x in xs], marker="o", label=label)
    ax.set_xlabel("noise intensity")
    ax.set_ylabel("mAP@0.5")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.savefig(save_path, dpi=200)
    plt.close(fig)
    return save_path
