"""Training CLI — one entry point covering the reference's train.py /
train2.py / train3.py / train_dual.py (the head in the model YAML selects
the loss family automatically).

Example:
    python train.py --cfg resnet10.yaml --data data/kitti.yaml \
        --hyp data/hyps/hyp.scratch.yaml --epochs 300 --batch-size 8
"""

from __future__ import annotations

import argparse
from pathlib import Path

import yaml


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="resnet10.yaml", help="model yaml")
    p.add_argument("--data", default="data/kitti.yaml", help="dataset yaml")
    p.add_argument("--hyp", default="data/hyps/hyp.scratch.yaml")
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--optimizer", default="SGD",
                   choices=["SGD", "Adam", "AdamW", "Lion"])
    p.add_argument("--linear-lr", action="store_true", help="linear LR (default one-cycle)")
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--project", default="runs/train")
    p.add_argument("--name", default="exp")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-labels", type=int, default=300)
    p.add_argument("--save-period", type=int, default=-1)
    p.add_argument("--noval", action="store_true")
    p.add_argument("--single-cls", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize activations (fit bigger models/batches)")
    p.add_argument("--remat-neuron", action="store_true",
                   help="rematerialize ONLY the neuron recurrences (cheaper "
                        "than --remat; usually enough to fit 640px T=4)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute with fp32 master params/BN stats "
                        "(the reference's AMP equivalent on TPU)")
    p.add_argument("--workers", type=int, default=4,
                   help="async host-loader threads (0 = synchronous)")
    p.add_argument("--quad", action="store_true",
                   help="quad collate: tile every 4 samples into one 2x "
                        "canvas (reference --quad / collate_fn4)")
    p.add_argument("--cache", choices=["ram", "disk"], default=None,
                   help="cache decoded+resized images (reference --cache; "
                        "steady-state epochs skip JPEG decode)")
    p.add_argument("--device-augment", action="store_true",
                   help="run mosaic/affine/HSV/flip jit-compiled ON the "
                        "accelerator (host only decodes+letterboxes; "
                        "TPU-native host-offload, no reference equivalent)")
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="chain K optimizer steps into one compiled call "
                        "(lax.scan) — amortizes per-dispatch latency")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="'model' mesh-axis extent: shard weight/optimizer/"
                        "EMA output channels over this many devices "
                        "(hybrid data x model mesh; 1 = pure data-parallel)")
    p.add_argument("--multi-scale", action="store_true",
                   help="vary train image size 0.5-1.5x per epoch "
                        "(reference train.py:544-551, epoch-bucketed)")
    p.add_argument("--image-weights", action="store_true",
                   help="class-aware image resampling (reference "
                        "--image-weights)")
    p.add_argument("--resume", default=None,
                   help="checkpoint dir to resume from (reference --resume)")
    p.add_argument("--sr", type=float, default=0.0,
                   help="BN-L1 sparsity rate (reference train_sparsity.py; "
                        "0 disables)")
    p.add_argument("--nbs", type=int, default=64,
                   help="nominal batch size for gradient accumulation")
    p.add_argument("--device", default="",
                   help="jax platform, e.g. cpu or tpu (reference --device)")
    p.add_argument("--evolve", type=int, nargs="?", const=300, default=0,
                   help="evolve hyperparameters for N generations "
                        "(reference train.py --evolve)")
    p.add_argument("--events", action="store_true",
                   help="train from pre-voxelized event samples "
                        "(reference g1-resnet/train_g1.py)")
    p.add_argument("--noautoanchor", action="store_true")
    return p.parse_args()


def main(opt):
    from ecs_yolo_tpu.utils.general import LOGGER, select_device

    select_device(opt.device)
    from ecs_yolo_tpu.train.driver import train

    with open(opt.data) as fh:
        data = yaml.safe_load(fh)
    root = Path(data.get("path", "."))
    train_path = root / data["train"]
    val_path = None if opt.noval else root / data.get("val", data["train"])
    hyp = {}
    if opt.hyp and Path(opt.hyp).exists():
        with open(opt.hyp) as fh:
            hyp = yaml.safe_load(fh)

    close_mosaic = int(hyp.pop("close_mosaic", 0)) if hyp else 0
    LOGGER.info(f"train: cfg={opt.cfg} data={opt.data} nc={data['nc']}")

    kwargs = dict(
        cfg=opt.cfg,
        train_path=str(train_path),
        val_path=str(val_path) if val_path else None,
        nc=1 if opt.single_cls else data["nc"],
        epochs=opt.epochs,
        batch_size=opt.batch_size,
        imgsz=opt.imgsz,
        optimizer=opt.optimizer,
        cos_lr=not opt.linear_lr,
        patience=opt.patience,
        max_labels=opt.max_labels,
        close_mosaic=close_mosaic,
        seed=opt.seed,
        save_period=opt.save_period,
        remat=opt.remat,
        remat_neuron=opt.remat_neuron,
        bf16=opt.bf16,
        model_parallel=opt.model_parallel,
        quad=opt.quad,
        workers=opt.workers,
        multi_scale=opt.multi_scale,
        image_weights=opt.image_weights,
        resume=opt.resume,
        sr=opt.sr,
        nbs=opt.nbs,
        events=opt.events,
        autoanchor=not opt.noautoanchor,
        cache=opt.cache,
        device_augment=opt.device_augment,
        steps_per_call=opt.steps_per_call,
    )

    if opt.evolve:
        # GA over the hyp space (reference train.py --evolve): short runs,
        # no per-gen val churn; fitness = best val fitness of the run
        from ecs_yolo_tpu.data.hyps import HYP_SCRATCH
        from ecs_yolo_tpu.train.evolve import evolve

        base = {**HYP_SCRATCH, **hyp}
        if kwargs["val_path"] is None:
            # the GA needs a fitness signal: always validate during evolve
            # (reference evolve runs val on each generation's final epoch)
            kwargs["val_path"] = kwargs["train_path"]

        def train_fn(h):
            _, best_fit, _ = train(
                hyp=h, save_dir=f"{opt.project}/{opt.name}/gen", **kwargs
            )
            return best_fit

        best = evolve(
            train_fn, base, generations=opt.evolve,
            save_dir=f"{opt.project}/{opt.name}", seed=opt.seed,
        )
        with open(Path(opt.project) / opt.name / "hyp_evolve.yaml", "w") as fh:
            yaml.safe_dump(best, fh)
        return

    train(hyp=hyp, save_dir=f"{opt.project}/{opt.name}", **kwargs)


if __name__ == "__main__":
    main(parse_opt())
