"""Multi-host (multi-process) data-parallel training.

TPU-native replacement for the reference's multi-node DDP launch
(``torch.distributed.run`` env probing train.py:58-60, NCCL/Gloo process
group train.py:927, DistributedSampler utils/datasets.py:95-156,
rank-0-only val/ckpt/logging train.py:630-676, and the v2 early-stop
broadcast train2.py:391-394):

* :func:`initialize` — ``jax.distributed.initialize`` from explicit args or
  the standard env vars; after it, ``jax.devices()`` spans every host and a
  1-D ``data`` mesh over them is the NCCL-DDP equivalent (collectives ride
  ICI/DCN, inserted by XLA).
* :func:`local_batch_slice` — the DistributedSampler equivalent: every host
  walks the SAME seeded batch plan and decodes only its contiguous slice of
  each global batch.
* :func:`to_global` — assembles those host-local rows into one globally
  sharded ``jax.Array`` (``jax.make_array_from_process_local_data``).
* :func:`is_main` / :func:`broadcast_scalar` — rank-0 gating and the
  early-stop flag broadcast.

Everything degrades to a no-op in a single process, so the train driver has
ONE code path.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-process runtime (reference dist.init_process_group,
    train.py:927).  Arguments default to the JAX_* env vars / cluster
    autodetection; call before any other JAX use."""
    kw = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kw["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"]
        )
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kw["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"]
        )
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kw["process_id"] = int(
            process_id if process_id is not None
            else os.environ["JAX_PROCESS_ID"]
        )
    jax.distributed.initialize(**kw)


def is_main() -> bool:
    """Rank-0 guard for val/ckpt/logging (reference RANK in {-1, 0})."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """This host's contiguous row range of every global batch — the
    DistributedSampler equivalent (each rank sees 1/world of the data)."""
    world = jax.process_count()
    if global_batch % world:
        raise ValueError(
            f"global batch {global_batch} not divisible by {world} hosts"
        )
    per = global_batch // world
    lo = jax.process_index() * per
    return slice(lo, lo + per)


def to_global(sharding, local_rows: np.ndarray) -> jax.Array:
    """Host-local rows -> one globally sharded array.  Single-process this
    is a plain device_put (zero-copy path)."""
    if jax.process_count() == 1:
        return jax.device_put(local_rows, sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_rows)
    )


def broadcast_scalar(value: float, from_main: bool = True) -> float:
    """Broadcast a host scalar from rank 0 (the reference's early-stop
    broadcast, train2.py:391-394).  No-op in a single process."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    arr = multihost_utils.broadcast_one_to_all(
        np.asarray([value], np.float32)
    )
    return float(arr[0])
