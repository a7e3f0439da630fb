"""CLI entry-point smoke tests: arg parsing + a micro end-to-end run."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).parent.parent


def run_cli(args, timeout=600):
    return subprocess.run(
        [sys.executable, *args], cwd=REPO, capture_output=True, text=True,
        timeout=timeout,
        env={
            "PATH": "/usr/bin:/bin:/usr/local/bin",
            "HOME": "/root",
            "JAX_PLATFORMS": "cpu",
            "PYTHONPATH": str(REPO),
        },
    )


@pytest.mark.parametrize("script", ["train.py", "val.py", "detect.py", "tools.py"])
def test_cli_help(script):
    r = run_cli([script, "--help"], timeout=120)
    assert r.returncode == 0, r.stderr[-500:]
    assert "usage" in r.stdout.lower()


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_ds")
    for split in ("train", "val"):
        (root / split / "images").mkdir(parents=True)
        (root / split / "labels").mkdir(parents=True)
        rng = np.random.RandomState(0)
        for i in range(4):
            img = (rng.rand(96, 96, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(root / split / "images" / f"{i}.jpg")
            (root / split / "labels" / f"{i}.txt").write_text(
                "0 0.5 0.5 0.4 0.4\n"
            )
    data_yaml = root / "data.yaml"
    data_yaml.write_text(
        f"path: {root}\ntrain: train/images\nval: val/images\nnc: 1\n"
        "names: [thing]\n"
    )
    return root, data_yaml


@pytest.mark.slow
def test_train_cli_micro(tiny_dataset, tmp_path):
    root, data_yaml = tiny_dataset
    r = run_cli(
        [
            "train.py", "--cfg", "resnet10.yaml", "--data", str(data_yaml),
            "--epochs", "1", "--batch-size", "2", "--imgsz", "64",
            "--max-labels", "8", "--project", str(tmp_path), "--name", "exp",
            "--hyp", "",
        ],
        timeout=580,
    )
    assert r.returncode == 0, r.stderr[-800:]
    assert (tmp_path / "exp" / "results.csv").exists()
    assert (tmp_path / "exp" / "weights" / "last" / "meta.json").exists()


def test_tools_image_list(tiny_dataset, tmp_path):
    root, _ = tiny_dataset
    out = tmp_path / "list.txt"
    r = run_cli(
        ["tools.py", "image-list", "--root", str(root / "train" / "images"),
         "--out", str(out)],
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert len(out.read_text().splitlines()) == 4
