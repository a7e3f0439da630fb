"""CPU interpret-mode parity check for the Pallas v3 ECS kernel."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.snn.neuron import ecs_lif_scan
from ecs_yolo_tpu.snn.pallas_ecs_v3 import ecs_lif_pallas

cfg = SNNConfig(time_window=4)

for (T, N, H, W, C) in [(4, 2, 16, 24, 8), (4, 1, 40, 20, 16), (5, 2, 32, 16, 8)]:
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(T, N, H, W, C) * 2 - 0.5, jnp.float32)
    dwk = jnp.asarray((rng.rand(3, 3, 1, C) - 0.5) * 0.4, jnp.float32)
    dwb = jnp.asarray((rng.rand(C) - 0.5) * 0.2, jnp.float32)
    pwk = jnp.asarray((rng.rand(1, 1, C, C) - 0.5) * 0.2, jnp.float32)
    pwb = jnp.asarray((rng.rand(C) - 0.5) * 0.2, jnp.float32)

    def spread(s):
        d = jax.lax.conv_general_dilated(
            s, dwk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
        ) + dwb
        return jax.lax.conv_general_dilated(
            d, pwk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + pwb

    cfg_t = SNNConfig(time_window=T)
    ya = np.asarray(ecs_lif_scan(x, spread, cfg_t, act=False))
    yp = np.asarray(
        ecs_lif_pallas(x, dwk, dwb, pwk, pwb, cfg_t, act=False, interpret=True)
    )
    mism = (ya != yp).mean()
    print(f"T{T} N{N} H{H} W{W} C{C}: spike mismatch {mism:.6f}  "
          f"max|diff| {np.abs(ya - yp).max():.3e}")
