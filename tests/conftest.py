"""Test configuration: run the suite on a virtual 8-device CPU mesh.

This is the JAX-native way to exercise multi-chip sharding without hardware
(SURVEY.md §4): tests must never require the real TPU.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
