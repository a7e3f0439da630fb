"""Probe: which reduction geometries are bit-exact under batch sharding?

Compares jnp.mean over [B,H,W,C] (B sharded 8-way) vs unsharded, for the
round-2 geometry (B=32 = T*N), the stem-dedup geometry (B=8 = N), and a
candidate fix: per-sample partial sums + explicit pairwise tree-fold over
the batch axis (order fixed in the program, so sharding cannot reassociate).
"""
import os, sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
shard = NamedSharding(mesh, P("data"))
repl = NamedSharding(mesh, P())

rng = np.random.RandomState(0)


def tree_fold_sum(x):
    """Fixed-order pairwise tree reduction over axis 0 (explicit adds)."""
    while x.shape[0] > 1:
        n = x.shape[0]
        half = n // 2
        even = x[: 2 * half : 2]
        odd = x[1 : 2 * half : 2]
        y = even + odd
        if n % 2:
            y = jnp.concatenate([y, x[n - 1 :]], axis=0)
        x = y
    return x[0]


def moments_mean(x):
    m = jnp.mean(x, axis=(0, 1, 2))
    v = jnp.mean(jnp.square(x), axis=(0, 1, 2)) - jnp.square(m)
    return m, v


def moments_tree(x):
    b = x.shape[0]
    cnt = b * x.shape[1] * x.shape[2]
    ps = jnp.sum(x, axis=(1, 2))          # [B, C] per-sample sums
    ps2 = jnp.sum(jnp.square(x), axis=(1, 2))
    m = tree_fold_sum(ps) / cnt
    m2 = tree_fold_sum(ps2) / cnt
    return m, m2 - jnp.square(m)


for label, b in [("B=32 (T*N, round-2)", 32), ("B=8 (dedup stem)", 8)]:
    x = rng.rand(b, 16, 16, 64).astype(np.float32)
    for name, fn in [("jnp.mean", moments_mean), ("tree-fold", moments_tree)]:
        f = jax.jit(fn)
        m1, v1 = jax.tree.map(np.asarray, f(jax.device_put(x, repl)))
        m8, v8 = jax.tree.map(np.asarray, f(jax.device_put(x, shard)))
        dm = np.abs(m1 - m8).max()
        dv = np.abs(v1 - v8).max()
        print(f"{label:22s} {name:10s} |dmean|={dm:.3e} |dvar|={dv:.3e} "
              f"{'EXACT' if dm == 0 and dv == 0 else 'DIFFERS'}")
