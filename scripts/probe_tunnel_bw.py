"""Measure host->device transfer bandwidth through the axon tunnel
(the epoch-bench host link).  One-shot probe; see BASELINE.md §5."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp

x8 = (np.random.rand(16, 640, 640, 3) * 255).astype(np.uint8)
x32 = x8.astype(np.float32) / 255.0
f = jax.jit(lambda a: jnp.float32(a).sum())
for name, arr in (("uint8 19.7MB", x8), ("float32 78.6MB", x32)):
    f(jax.device_put(arr)).block_until_ready()  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        d = jax.device_put(arr)
        f(d).block_until_ready()
        ts.append(time.perf_counter() - t0)
    mb = arr.nbytes / 1e6
    print(f"{name}: best {min(ts):.3f}s = {mb/min(ts):.1f} MB/s "
          f"(times {[round(t,3) for t in ts]})", flush=True)

# fresh-data probe: axon memoizes repeated identical payloads, so the
# timings above are an upper bound.  Unique random data defeats the cache.
print("fresh (unmemoized) payloads:")
for name, mk in (("uint8 19.7MB", lambda i: (np.random.rand(16,640,640,3)*255).astype(np.uint8)),
                 ("uint8 315MB", lambda i: (np.random.rand(16,16,640,640,3)*255).astype(np.uint8))):
    ts = []
    for i in range(2):
        arr = mk(i)
        t0 = time.perf_counter()
        f(jax.device_put(arr)).block_until_ready()
        ts.append(time.perf_counter() - t0)
    mb = arr.nbytes / 1e6
    print(f"{name}: {mb/min(ts):.1f} MB/s (times {[round(t,2) for t in ts]})", flush=True)
