"""Tests for visualization/profiling utilities."""

import numpy as np
import jax
import pytest

from ecs_yolo_tpu.config import SNNConfig
from ecs_yolo_tpu.models.yolo import build_model
from ecs_yolo_tpu.utils.profiling import time_sync, benchmark_fn, profile_layers
from ecs_yolo_tpu.utils.visualize import spike_heatmap, plot_noise_robustness
from ecs_yolo_tpu.utils.plots import plot_results, plot_evolve, plot_labels


@pytest.fixture(scope="module")
def model():
    m = build_model("resnet10.yaml", nc=2, snn=SNNConfig(time_window=2))
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    return m, v


def test_time_sync():
    t0 = time_sync()
    assert time_sync() >= t0


def test_benchmark_fn():
    import jax.numpy as jnp

    ms = benchmark_fn(lambda x: x * 2, jnp.ones(128), iters=3, warmup=1)
    assert ms >= 0


def test_profile_layers(model):
    m, v = model
    rows = profile_layers(m, v, imgsz=64, iters=1)
    assert len(rows) == len(m.spec)
    assert all(r["ms"] >= 0 for r in rows)
    names = [r["name"] for r in rows]
    assert "Conv_1" in names and "Detect" in names


def test_spike_heatmap(model, tmp_path):
    m, v = model
    img = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    maps = spike_heatmap(m, v, img, save_path=str(tmp_path / "hm.png"))
    assert len(maps) > 5
    assert (tmp_path / "hm.png").exists()


def test_plot_noise_robustness(tmp_path):
    out = plot_noise_robustness(
        {"LIF": {0.0: 0.5, 0.1: 0.4}, "ECS-LIF": {0.0: 0.5, 0.1: 0.45}},
        save_path=str(tmp_path / "nr.png"),
    )
    assert (tmp_path / "nr.png").exists()


def test_plots_roundtrip(tmp_path):
    csv = tmp_path / "results.csv"
    csv.write_text("epoch,loss,mAP\n0,1.0,0.1\n1,0.8,0.2\n")
    out = plot_results(csv)
    assert out.exists()

    ev = tmp_path / "evolve.csv"
    ev.write_text("fitness,lr0,momentum\n0.1,0.01,0.9\n0.2,0.02,0.95\n")
    assert plot_evolve(ev).exists()

    labels = np.array([[0, 0.5, 0.5, 0.2, 0.2], [1, 0.3, 0.3, 0.1, 0.1]])
    assert plot_labels(labels, save_dir=tmp_path).exists()
