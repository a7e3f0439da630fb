"""Firing-rate observability.

The reference instruments ``mem_update.forward`` with visualizer.get_local
hooks and computes per-layer spike density (g1-resnet/calculate_fr.py:234-256,
saving firerate*.npy / size*.npy).  Here every spiking ``MemUpdate`` sows its
mean spike rate into the ``spike_stats`` collection, so collection is one
``mutable=['spike_stats']`` apply — no hooks, jit-compatible.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _flatten_sown(tree, prefix=()) -> Dict[str, float]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_sown(v, prefix + (k,)))
    elif isinstance(tree, (tuple, list)):
        for i, v in enumerate(tree):
            out.update(_flatten_sown(v, prefix + (str(i),)))
    else:
        out["/".join(prefix)] = float(np.asarray(tree).mean())
    return out


def forward_with_firing_rates(model, variables, x, training: bool = False):
    """Run a forward pass and also return {layer_path: firing_rate}."""
    out, aux = model.module.apply(
        variables, x, training=training, mutable=["spike_stats"]
    )
    rates = _flatten_sown(aux.get("spike_stats", {}))
    return out, rates


def calculate_fr(
    model,
    variables,
    batches,
    max_batches: Optional[int] = None,
    save_prefix: Optional[str] = None,
) -> Dict[str, float]:
    """Average per-layer firing rates over a dataset
    (reference g1-resnet/calculate_fr.py).  Optionally saves
    ``{prefix}_firerate.npy`` / ``{prefix}_layers.npy`` artifacts mirroring
    the reference's firerate*.npy / size*.npy outputs."""
    acc: Dict[str, float] = {}
    n = 0
    for i, (ims, *_rest) in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        _, rates = forward_with_firing_rates(model, variables, jnp.asarray(ims))
        for k, v in rates.items():
            acc[k] = acc.get(k, 0.0) + v
        n += 1
    rates = {k: v / max(n, 1) for k, v in acc.items()}
    if save_prefix:
        keys = sorted(rates)
        np.save(f"{save_prefix}_firerate.npy", np.array([rates[k] for k in keys]))
        np.save(f"{save_prefix}_layers.npy", np.array(keys))
    return rates
