"""Parameter initializers matching PyTorch's defaults.

The reference relies on torch's default ``kaiming_uniform_(a=sqrt(5))`` conv
init and uniform bias init; matching them matters for training parity.
kaiming_uniform with a=sqrt(5) gives bound = sqrt(6 / ((1+5) fan_in))
= sqrt(1/fan_in), which equals jax variance_scaling(1/3, fan_in, uniform).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.nn.initializers import variance_scaling

# torch nn.Conv2d / nn.Linear default weight init
torch_conv_kernel_init = variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_conv_bias_init(key, shape, dtype=jnp.float32, fan_in=None):
    """torch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    assert fan_in is not None and fan_in > 0
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_bias_init(fan_in):
    def init(key, shape, dtype=jnp.float32):
        return torch_conv_bias_init(key, shape, dtype, fan_in=fan_in)

    return init
