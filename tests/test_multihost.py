"""Multi-host data parallelism: 2 REAL processes over jax.distributed (CPU
backend) vs single-process — the closest in-image equivalent of the
reference's multi-node DDP launch (train.py:927, DistributedSampler
utils/datasets.py:95-156).  Losses must match exactly: the global mesh,
per-host batch slices and cross-process collectives reproduce the
single-process math."""

import subprocess
import sys
import socket
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("mh")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.RandomState(0)
    for i in range(8):
        img = (rng.rand(64, 64, 3) * 60).astype(np.uint8)
        img[20:40, 20:40] = 200
        Image.fromarray(img).save(root / "images" / f"{i}.jpg")
        (root / "labels" / f"{i}.txt").write_text("0 0.47 0.47 0.31 0.31\n")
    return root / "images"


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(rank, world, port, data_dir, ndev):
    return subprocess.Popen(
        [sys.executable, str(REPO / "tests" / "multihost_worker.py"),
         str(rank), str(world), str(port), str(data_dir), str(ndev)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )


def _losses(out: str):
    for line in out.splitlines():
        if line.startswith("LOSS "):
            return [float(v) for v in line.split()[1:]]
    raise AssertionError(f"no LOSS line in output:\n{out}")


@pytest.mark.slow
def test_two_process_ddp_matches_single(tiny_data):
    port = _free_port()
    # single process, 4 local devices
    p = _run(0, 1, port, tiny_data, 4)
    out, err = p.communicate(timeout=2400)
    assert p.returncode == 0, err[-2000:]
    ref = _losses(out)

    # two processes x 2 devices = the same 4-device global mesh.
    # generous timeout: both ranks compile the train step independently and
    # the suite may be sharing the host's cores
    port = _free_port()
    procs = [_run(r, 2, port, tiny_data, 2) for r in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=2400)
        assert p.returncode == 0, err[-2000:]
        outs.append(out)
    l0, l1 = _losses(outs[0]), _losses(outs[1])
    assert l0 == pytest.approx(l1, abs=1e-6)      # ranks agree
    assert l0 == pytest.approx(ref, rel=1e-4)     # and match single-process
