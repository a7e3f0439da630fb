"""Tests for the extra heads (TripleDDetect, Panoptic) and hub API."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.nn.heads import TripleDDetect
from ecs_yolo_tpu.nn.segment import Panoptic

SNN = SNNConfig(time_window=2)
KEY = jax.random.PRNGKey(0)


def feats(b=1, n=2):
    rng = np.random.RandomState(0)
    return [
        jnp.asarray(rng.randn(2, b, 8, 8, 32).astype(np.float32)),
        jnp.asarray(rng.randn(2, b, 4, 4, 64).astype(np.float32)),
    ] * n


def test_triple_ddetect():
    xs = feats(n=3)
    head = TripleDDetect(nc=3, strides=(8.0, 16.0), snn=SNN)
    v = head.init(KEY, xs, training=True)
    (d1, d2, d3), _ = head.apply(v, xs, training=True, mutable=["batch_stats"])
    assert len(d1) == len(d2) == len(d3) == 2
    y, _ = head.apply(v, xs, training=False)
    assert y.shape[1] == 4 + 3


def test_panoptic():
    xs = feats(n=1)
    head = Panoptic(nc=3, sem_nc=5, nm=8, npr=16, strides=(8.0, 16.0), snn=SNN)
    v = head.init(KEY, xs, training=True)
    (det, mc, protos, sem), _ = head.apply(
        v, xs, training=True, mutable=["batch_stats"]
    )
    assert sem.shape == (1, 16, 16, 5 + 3)  # 2x upsampled P3, sem_nc+nc
    assert protos.shape[-1] == 8


def test_hub_create_and_ensemble(tmp_path):
    from ecs_yolo_tpu.hub import create, Ensemble

    m1, v1 = create("resnet10.yaml", nc=2, snn=SNN)
    m2, v2 = create("resnet10.yaml", nc=2, snn=SNN, seed=1)
    ens = Ensemble([(m1, v1), (m2, v2)])
    x = jnp.zeros((1, 64, 64, 3))
    y = ens(x)
    single = m1.apply(v1, x, training=False)[0]
    assert y.shape[1] == 2 * single.shape[1]  # concatenated candidates
