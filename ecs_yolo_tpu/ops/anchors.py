"""Anchor-free grid generation and box/distance transforms.

Mirrors reference utils/tal/anchor_generator.py:8-46 (make_anchors,
dist2bbox, bbox2dist), operating on static shapes so everything folds into
jit-compiled constants.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def make_anchors(
    feat_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[float],
    grid_cell_offset: float = 0.5,
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Grid-cell center anchor points for each pyramid level.

    Args:
      feat_shapes: [(h, w), ...] per level.
      strides: per-level stride.

    Returns:
      anchor_points [A, 2] (x, y in grid units), stride_tensor [A, 1].
    """
    points, stride_list = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=dtype) + grid_cell_offset
        sy = jnp.arange(h, dtype=dtype) + grid_cell_offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        points.append(jnp.stack([gx, gy], axis=-1).reshape(-1, 2))
        stride_list.append(jnp.full((h * w, 1), s, dtype=dtype))
    return jnp.concatenate(points, 0), jnp.concatenate(stride_list, 0)


def dist2bbox(distance, anchor_points, xywh: bool = True, axis: int = -1):
    """ltrb distances -> boxes (xywh or xyxy)."""
    lt, rb = jnp.split(distance, 2, axis=axis)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c_xy, wh], axis=axis)
    return jnp.concatenate([x1y1, x2y2], axis=axis)


def bbox2dist(anchor_points, bbox, reg_max: float):
    """xyxy boxes -> ltrb distances, clamped to [0, reg_max-0.01]."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    d = jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1)
    return jnp.clip(d, 0, reg_max - 0.01)


def make_grid_v1(nx: int, ny: int, na: int, dtype=jnp.float32):
    """v1 anchor-based grid (reference models/yolo.py:150-161): integer cell
    coordinates broadcast over anchors -> [1, na, ny, nx, 2]."""
    gy, gx = jnp.meshgrid(
        jnp.arange(ny, dtype=dtype), jnp.arange(nx, dtype=dtype), indexing="ij"
    )
    grid = jnp.stack([gx, gy], axis=-1)
    return jnp.broadcast_to(grid[None, None], (1, na, ny, nx, 2))
