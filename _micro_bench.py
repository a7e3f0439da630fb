import time, json, functools
import numpy as np
import jax, jax.numpy as jnp
from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.snn.neuron import ecs_lif_scan, lif_scan
from ecs_yolo_tpu.snn import pallas_kernels as pk

CFG = SNNConfig()
T,N,H,W,C = 4,16,320,320,64
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(T,N,H,W,C).astype(np.float32)*0.5, jnp.bfloat16)
dw = jnp.asarray(rng.randn(3,3,1,C).astype(np.float32)*0.2, jnp.bfloat16)
dwb = jnp.asarray(rng.randn(C).astype(np.float32)*0.1, jnp.bfloat16)
pw = jnp.asarray(rng.randn(1,1,C,C).astype(np.float32)*0.1, jnp.bfloat16)
pwb = jnp.asarray(rng.randn(C).astype(np.float32)*0.1, jnp.bfloat16)

def spread(s):
    d = jax.lax.conv_general_dilated(s, dw, (1,1), "SAME", dimension_numbers=("NHWC","HWIO","NHWC"), feature_group_count=C)+dwb
    return jax.lax.conv_general_dilated(d, pw, (1,1), "SAME", dimension_numbers=("NHWC","HWIO","NHWC"))+pwb

def timeit(name, fn, *args):
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(*args)); jax.block_until_ready(jfn(*args))
    t0=time.perf_counter()
    for _ in range(10):
        out = jfn(*args)
    jax.block_until_ready(out)
    ms = 1000*(time.perf_counter()-t0)/10
    print(json.dumps({"k": name, "ms": round(ms,2)}), flush=True)

timeit("ecs_scan", lambda x: ecs_lif_scan(x, spread, CFG), x)
timeit("ecs_fused", lambda x: pk.ecs_lif_fused(x, dw, dwb, pw, pwb, CFG), x)
timeit("lif_scan", lambda x: lif_scan(x, CFG), x)
timeit("lif_fused", lambda x: pk.lif_fused(x, CFG), x)
timeit("noop_copy", lambda x: x * 1.0001, x)
