"""Which resample formulation reaches the MXU? (in-graph timing)"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from functools import partial

B, S = 16, 640
img = jnp.asarray(np.random.rand(B, S, S, 3).astype(np.float32))
s = jnp.asarray(np.random.uniform(0.6, 1.4, B).astype(np.float32))
t = jnp.asarray(np.random.uniform(200, 400, (B, 2)).astype(np.float32))

def weights(u, n):
    i = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(u[:, :, None] - i))

def build_uw(flipmask=None):
    o = jnp.arange(S, dtype=jnp.float32)
    uy = (o[None] - t[:, :1]) / s[:, None] + S / 2
    ux = (o[None] - t[:, 1:]) / s[:, None] + S / 2
    return weights(uy, S), weights(ux, S)

def f_einsum_highest(img):
    wy, wx = build_uw()
    tmp = jnp.einsum("boi,biwc->bowc", wy, img, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("bpj,bojc->bopc", wx, tmp, precision=jax.lax.Precision.HIGHEST)

def f_einsum_default(img):
    wy, wx = build_uw()
    tmp = jnp.einsum("boi,biwc->bowc", wy, img)
    return jnp.einsum("bpj,bojc->bopc", wx, tmp)

def f_matmul_merged(img):
    wy, wx = build_uw()
    tmp = jnp.matmul(wy, img.reshape(B, S, S * 3),
                     precision=jax.lax.Precision.HIGHEST).reshape(B, S, S, 3)
    # x-axis: [B,S(out_y),S(x),3] -> contract x with wx: move x next to matmul
    tmp2 = tmp.transpose(0, 2, 1, 3).reshape(B, S, S * 3)  # [B, x, y*3]
    out = jnp.matmul(wx, tmp2, precision=jax.lax.Precision.HIGHEST)
    return out.reshape(B, S, S, 3).transpose(0, 2, 1, 3)

def bench(name, fn, n=30):
    @partial(jax.jit, static_argnums=(1,))
    def rep(x, trips):
        def body(i, acc):
            return fn(acc)[..., :3] * 0.999 + 0.0001
        return jax.lax.fori_loop(0, trips, body, x).sum()
    rep(img, 1).block_until_ready()
    t1 = time.perf_counter(); rep(img, 1).block_until_ready(); t1 = time.perf_counter() - t1
    tn = time.perf_counter(); rep(img, n + 1).block_until_ready(); tn = time.perf_counter() - tn
    print(f"{name}: {(tn-t1)/n*1000:.1f} ms/call [t1={t1:.2f} t{n+1}={tn:.2f}]", flush=True)

bench("einsum HIGHEST", f_einsum_highest)
bench("einsum default", f_einsum_default)
bench("matmul merged+transpose", f_matmul_merged)
