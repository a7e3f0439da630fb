"""ecs_yolo_tpu — TPU-native spiking-YOLO framework (JAX/XLA/Pallas/pjit).

A ground-up re-design of the capabilities of mowanggui/ECS-YOLO (directly
trained spiking neural networks for object detection: EMS-YOLO blocks + the
ECS-LIF neuron) for TPU:

* time axis folded into the batch for all convolutions; only the membrane
  recurrence runs under `lax.scan`,
* surrogate gradients via `jax.custom_vjp`,
* static-shape, padded post-processing (NMS) that stays on device,
* data parallelism via `jax.sharding.Mesh` + jit shardings instead of DDP.
"""

from .config import SNNConfig, DEFAULT_SNN

__version__ = "0.1.0"
__all__ = ["SNNConfig", "DEFAULT_SNN", "__version__"]
