import time, json
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.snn.neuron import ecs_lif_scan
from ecs_yolo_tpu.snn import pallas_kernels as pk
from ecs_yolo_tpu.snn.surrogate import spike_fn

CFG = SNNConfig()
T,N,H,W,C = 4,16,320,320,64
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(T,N,H,W,C).astype(np.float32)*0.5, jnp.bfloat16)
dw = jnp.asarray(rng.randn(3,3,1,C).astype(np.float32)*0.2, jnp.bfloat16)
dwb = jnp.asarray(rng.randn(C).astype(np.float32)*0.1, jnp.bfloat16)
pw = jnp.asarray(rng.randn(1,1,C,C).astype(np.float32)*0.1, jnp.bfloat16)
pwb = jnp.asarray(rng.randn(C).astype(np.float32)*0.1, jnp.bfloat16)
pwm = pw.reshape(C, C)

def spread_conv(s):
    d = lax.conv_general_dilated(s, dw, (1,1), "SAME", dimension_numbers=("NHWC","HWIO","NHWC"), feature_group_count=C)+dwb
    return lax.conv_general_dilated(d, pw, (1,1), "SAME", dimension_numbers=("NHWC","HWIO","NHWC"))+pwb

def spread_shift(s):
    # depthwise 3x3 via 9 shifted adds (fusable elementwise), then matmul
    p = jnp.pad(s, ((0,0),(1,1),(1,1),(0,0)))
    d = jnp.zeros_like(s)
    for dy in range(3):
        for dx in range(3):
            d = d + p[:, dy:dy+H, dx:dx+W, :] * dw[dy, dx, 0]
    d = d + dwb
    n,h,w,c = d.shape
    return (d.reshape(-1, c) @ pwm).reshape(n,h,w,c) + pwb

def timeit(name, fn, *args):
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(*args)); jax.block_until_ready(jfn(*args))
    t0=time.perf_counter()
    for _ in range(10):
        out = jfn(*args)
    jax.block_until_ready(out)
    print(json.dumps({"k": name, "ms": round(1000*(time.perf_counter()-t0)/10,2)}), flush=True)

timeit("ecs_scan_conv", lambda x: ecs_lif_scan(x, spread_conv, CFG), x)
timeit("ecs_scan_shift", lambda x: ecs_lif_scan(x, spread_shift, CFG), x)
timeit("lif_fused", lambda x: pk.lif_fused(x, CFG), x)
