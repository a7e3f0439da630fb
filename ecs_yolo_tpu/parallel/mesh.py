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

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


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
