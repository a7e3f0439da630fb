"""Tests for auxiliary subsystems: firing rates, autoanchor, utils."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.models.yolo import build_model
from ecs_yolo_tpu.observe import forward_with_firing_rates, calculate_fr
from ecs_yolo_tpu.utils.autoanchor import (
    kmean_anchors,
    best_possible_recall,
    anchor_fitness,
    check_anchors,
)
from ecs_yolo_tpu.utils.general import EarlyStopping, increment_path, Callbacks


class TestFiringRates:
    @pytest.fixture(scope="class")
    def model(self):
        m = build_model("resnet10.yaml", nc=2, snn=SNNConfig(time_window=2))
        v = m.init(jax.random.PRNGKey(0), imgsz=64)
        return m, v

    def test_rates_collected(self, model):
        m, v = model
        x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
        _, rates = forward_with_firing_rates(m, v, x)
        # resnet10 has many spiking mem_updates
        assert len(rates) > 10
        for k, r in rates.items():
            assert 0.0 <= r <= 1.0, (k, r)

    def test_calculate_fr_saves(self, model, tmp_path):
        m, v = model
        batches = [
            (np.random.RandomState(i).rand(1, 64, 64, 3).astype(np.float32),)
            for i in range(2)
        ]
        rates = calculate_fr(
            m, v, iter(batches), save_prefix=str(tmp_path / "fr")
        )
        assert (tmp_path / "fr_firerate.npy").exists()
        assert (tmp_path / "fr_layers.npy").exists()
        arr = np.load(tmp_path / "fr_firerate.npy")
        assert len(arr) == len(rates)


class TestAutoAnchor:
    def test_kmeans_improves_fitness(self):
        rng = np.random.RandomState(0)
        # two clusters of box sizes
        wh = np.concatenate(
            [rng.rand(200, 2) * 20 + 10, rng.rand(200, 2) * 60 + 100]
        )
        k = kmean_anchors(wh, n=4, gen=100, img_size=640)
        assert k.shape == (4, 2)
        bad = np.array([[600, 600], [620, 620], [630, 630], [640, 640]])
        assert anchor_fitness(wh, k) > anchor_fitness(wh, bad)
        assert best_possible_recall(wh, k) > 0.9

    def test_sorted_by_area(self):
        rng = np.random.RandomState(1)
        wh = rng.rand(300, 2) * 100 + 5
        k = kmean_anchors(wh, n=6, gen=50)
        areas = k.prod(1)
        assert (np.diff(areas) >= 0).all()

    def test_check_anchors_keeps_good(self):
        rng = np.random.RandomState(2)
        labels = [
            np.concatenate(
                [np.zeros((5, 1)), rng.rand(5, 2) * 0.6 + 0.2,
                 rng.rand(5, 2) * 0.1 + 0.05], 1
            )
            for _ in range(10)
        ]
        shapes = [(480, 640)] * 10
        wh = np.concatenate([l[:, 3:5] * [640, 480] for l in labels])
        good = kmean_anchors(wh, n=6, gen=50)
        out, recomputed = check_anchors(labels, shapes, good, imgsz=640)
        assert not recomputed


class TestUtils:
    def test_early_stopping(self):
        es = EarlyStopping(patience=2)
        assert not es(0, 0.5)
        assert not es(1, 0.4)
        assert es(2, 0.3)  # 2 epochs without improvement

    def test_increment_path(self, tmp_path):
        p1 = increment_path(tmp_path / "exp", mkdir=True)
        p2 = increment_path(tmp_path / "exp", mkdir=True)
        assert p1 != p2
        assert p2.name == "exp2"

    def test_callbacks(self):
        cb = Callbacks()
        called = []
        cb.register_action("on_train_start", callback=lambda: called.append(1))
        cb.run("on_train_start")
        assert called == [1]
