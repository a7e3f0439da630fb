"""Device mesh + sharding helpers.

TPU-native replacement for the reference's DDP/NCCL stack (train.py:418-419,
927): a 1-D ``data`` mesh shards the global batch; parameters/optimizer
state are replicated; XLA inserts the gradient all-reduce (the DDP
equivalent) and BN statistics become global automatically (SyncBN-by-default,
reference train.py:359).

The mesh axes are declared so larger topologies can extend to ('data',
'model') 2-D meshes later without touching the train step.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def make_mesh_2d(
    devices: Optional[Sequence] = None,
    model_parallel: int = 2,
    axes: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """2-D ('data', 'model') mesh: batch sharded over 'data', large weight
    matrices sharded over 'model' (see :func:`shard_params`).

    The reference has no TP/FSDP equivalent (DDP only, SURVEY §2.10); this is
    the TPU-native extension point — the train step itself is GSPMD-agnostic,
    so hybrid data x weight sharding needs only placement, no code changes.
    """
    devices = list(devices) if devices is not None else jax.devices()
    assert len(devices) % model_parallel == 0, (
        f"{len(devices)} devices not divisible by model_parallel="
        f"{model_parallel}"
    )
    grid = np.array(devices).reshape(-1, model_parallel)
    return Mesh(grid, axes)


def shard_params(mesh: Mesh, tree, axis: str = "model", min_last: int = 0):
    """Device-put a parameter-like pytree with weight sharding over ``axis``.

    Rule (applies identically to params, optimizer state, and EMA, since
    their leaves share shapes): arrays of rank >= 2 whose trailing
    (output-channel) dimension divides evenly over the axis are sharded on
    that dimension — conv kernels [kh,kw,ci,co] split co — everything else
    (biases, BN vectors, scalars) is replicated.  XLA SPMD inserts the
    all-gathers at use and keeps the optimizer update sharded (ZeRO-3-style
    memory scaling over the 'model' axis).
    """
    mp = mesh.shape[axis]

    def put(x):
        if (
            hasattr(x, "ndim")
            and x.ndim >= 2
            and x.shape[-1] % mp == 0
            and x.shape[-1] >= max(mp, min_last)
        ):
            spec = P(*([None] * (x.ndim - 1) + [axis]))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, tree)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Device-put a host batch with the leading axis sharded."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate_tree(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)
