"""In-graph micro-bench of data/device_augment.augment_batch on the chip.

Decomposes the round-5 epoch-bench residual: is the 25 s/multi-call
overhead the augmentation pipeline?  (CLAUDE.md in-graph timing recipe.)
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from ecs_yolo_tpu.data.device_augment import augment_batch, mosaic4, random_affine, random_hsv

B, S, M = 16, 640, 16
HYP = dict(mosaic=1.0, degrees=0.0, translate=0.1, scale=0.5, shear=0.0,
           hsv_h=0.015, hsv_s=0.7, hsv_v=0.4, fliplr=0.5)

imgs = jnp.asarray(np.random.rand(B, S, S, 3).astype(np.float32))
lbs = jnp.asarray(np.random.rand(B, M, 5).astype(np.float32) * 0.4 + 0.2)
mks = jnp.ones((B, M), bool)

def bench(name, fn, n=30):
    from functools import partial as _p
    @_p(jax.jit, static_argnums=(4,))
    def rep(imgs, lbs, mks, key, trips):
        def body(i, carry):
            im, lb, mk = carry
            k = jax.random.fold_in(key, i)
            im2, lb2, mk2 = fn(im, lb, mk, k)
            # dependent chain with fixed shapes: feed the augmented image
            # back in; slice labels back to M (mosaic grows them to 4M)
            return (im2, lb2[:, :M], mk2[:, :M])
        return jax.lax.fori_loop(0, trips, body, (imgs, lbs, mks))[0].sum()
    key = jax.random.PRNGKey(0)
    rep(imgs, lbs, mks, key, 1).block_until_ready()
    t1 = time.perf_counter(); rep(imgs, lbs, mks, key, 1).block_until_ready(); t1 = time.perf_counter() - t1
    tn = time.perf_counter(); rep(imgs, lbs, mks, key, n + 1).block_until_ready(); tn = time.perf_counter() - tn
    per = (tn - t1) / n
    print(f"{name}: {per*1000:.1f} ms/call ({B/per:.1f} img/s) [t1={t1:.2f}s t{n+1}={tn:.2f}s]", flush=True)

bench("augment_batch(fast-full)", lambda im, lb, mk, k: augment_batch(im, lb, mk, k, HYP))
#bench("mosaic4 only", lambda im, lb, mk, k: mosaic4(im, lb, mk, k))
#bench("affine only", lambda im, lb, mk, k: random_affine(im, lb, mk, k, 0.0, 0.1, 0.5, 0.0))
#bench("hsv only", lambda im, lb, mk, k: (random_hsv(im, k), lb, mk))

from ecs_yolo_tpu.data.device_augment import random_fliplr
#bench("fliplr only", lambda im, lb, mk, k: (*random_fliplr(im, lb, k), mk)[:2] + (mk,))

from ecs_yolo_tpu.data.device_augment import random_hsv_fast, scale_translate_flip
bench("hsv_fast only", lambda im, lb, mk, k: (random_hsv_fast(im, k), lb, mk))
bench("resample only", lambda im, lb, mk, k: scale_translate_flip(im, lb, mk, k, im.shape[1:3]))
