from .surrogate import heaviside, spike_fn
from .neuron import lif_scan, ecs_lif_scan, mem_update, lif_node_scan, firing_rate

__all__ = [
    "heaviside",
    "spike_fn",
    "lif_scan",
    "ecs_lif_scan",
    "mem_update",
    "lif_node_scan",
    "firing_rate",
]
