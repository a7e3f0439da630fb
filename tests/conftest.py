"""Test configuration: run the suite on a virtual 8-device CPU mesh.

This is the JAX-native way to exercise multi-chip sharding without hardware
(SURVEY.md §4): tests must never require the real TPU.

NOTE: this container's sitecustomize registers the remote-TPU ('axon')
backend at interpreter start with JAX_PLATFORMS=axon baked into the env, so
env vars set here are too late — we must override via jax.config before any
backend initializes.  Without this, every test op round-trips through the
TPU tunnel (~100 s per compile).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# persistent compilation cache makes repeated test runs much faster
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
