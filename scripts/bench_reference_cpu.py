"""Measured same-silicon framework comparison: the PyTorch reference vs
this framework on the HOST CPU.

The reference publishes no throughput numbers and no CUDA GPU exists in
this image (BASELINE.md "Notes"), so the reference-GPU img/s used by
bench.py's ``vs_baseline`` is an estimate.  This script produces the one
comparison that CAN be measured here: both implementations, same model
config, same input size, same CPU — isolating the framework/runtime factor
(reference per-timestep Python conv loops vs one XLA-fused T-folded graph).

Usage:
    python scripts/bench_reference_cpu.py [--cfg resnet10] [--imgsz 320]
        [--iters 3] [--skip-ours] [--skip-ref]

Prints one JSON line:
    {"cfg", "imgsz", "T", "ref_cpu_imgs_per_sec", "ours_cpu_imgs_per_sec",
     "ratio"}
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def bench_reference(cfg: str, imgsz: int, iters: int) -> float:
    import torch
    import ref_loader

    ryolo = ref_loader.load("models.yolo")
    torch.manual_seed(0)
    model = ryolo.Model(
        f"/root/reference/models/{cfg}.yaml", ch=3, nc=13
    ).eval()
    x = torch.rand(1, 3, imgsz, imgsz)
    with torch.no_grad():
        model(x)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            model(x)
        dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt


def bench_ours(cfg: str, imgsz: int, iters: int) -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from ecs_yolo_tpu.models.yolo import build_model

    model = build_model(f"{cfg}.yaml", nc=13)
    variables = model.init(jax.random.PRNGKey(0), imgsz=64)

    @jax.jit
    def forward(images):
        z, _ = model.module.apply(variables, images, training=False)
        return z

    x = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    forward(x).block_until_ready()  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        forward(x).block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="resnet10")
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--skip-ours", action="store_true")
    ap.add_argument("--skip-ref", action="store_true")
    args = ap.parse_args()

    ref = None if args.skip_ref else bench_reference(
        args.cfg, args.imgsz, args.iters
    )
    ours = None if args.skip_ours else bench_ours(
        args.cfg, args.imgsz, args.iters
    )
    print(json.dumps({
        "cfg": args.cfg,
        "imgsz": args.imgsz,
        "T": 4,
        "ref_cpu_imgs_per_sec": ref and round(ref, 4),
        "ours_cpu_imgs_per_sec": ours and round(ours, 4),
        "ratio": (round(ours / ref, 2) if ref and ours else None),
    }))


if __name__ == "__main__":
    main()
