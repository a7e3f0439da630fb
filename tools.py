"""Analysis & compression tool CLI — covers the reference's standalone
scripts: prune.py, finetune.py (= train.py --resume on pruned weights),
g1-resnet/calculate_fr.py, export.py/export2.py, huatu.py, exportfiletxt.py,
and the evolve loop.

Usage:
    python tools.py prune      --weights CKPT --cfg YAML --ratio 0.5 --out DIR
    python tools.py firing-rate --weights CKPT --cfg YAML --data DIR
    python tools.py export     --weights CKPT --cfg YAML --include stablehlo saved_model
    python tools.py profile    --cfg YAML [--weights CKPT]
    python tools.py voxelize   --dat F.dat --labels F.npy --out DIR
    python tools.py image-list --root DIR --out list.txt
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("prune")
    pr.add_argument("--weights", required=True)
    pr.add_argument("--cfg", default="resnet10.yaml")
    pr.add_argument("--nc", type=int, default=None)
    pr.add_argument("--ratio", type=float, default=0.5)
    pr.add_argument("--out", default="runs/prune")

    fr = sub.add_parser("firing-rate")
    fr.add_argument("--weights", required=True)
    fr.add_argument("--cfg", default="resnet10.yaml")
    fr.add_argument("--nc", type=int, default=None)
    fr.add_argument("--data", required=True)
    fr.add_argument("--imgsz", type=int, default=640)
    fr.add_argument("--batches", type=int, default=8)
    fr.add_argument("--out", default="runs/fr/exp")

    ex = sub.add_parser("export")
    ex.add_argument("--weights", default=None,
                    help="checkpoint to export (random init if omitted)")
    ex.add_argument("--cfg", default="resnet10.yaml")
    ex.add_argument("--nc", type=int, default=None)
    ex.add_argument("--imgsz", type=int, default=640)
    ex.add_argument("--include", nargs="+", default=["stablehlo"])
    ex.add_argument("--out", default="runs/export")
    ex.add_argument("--int8", action="store_true",
                    help="int8 post-training quantization (tflite)")
    ex.add_argument("--calib-data", default=None,
                    help="calibration image dir/glob for --int8")

    pf = sub.add_parser("profile")
    pf.add_argument("--cfg", default="resnet10.yaml")
    pf.add_argument("--weights", default=None)
    pf.add_argument("--nc", type=int, default=None)
    pf.add_argument("--imgsz", type=int, default=256)

    vx = sub.add_parser("voxelize")
    vx.add_argument("--dat", required=True, nargs="+")
    vx.add_argument("--labels", required=True, nargs="+")
    vx.add_argument("--out", required=True)
    vx.add_argument("--sample-size", type=int, default=250_000)
    vx.add_argument("--t-bins", type=int, default=5)

    il = sub.add_parser("image-list")
    il.add_argument("--root", required=True)
    il.add_argument("--out", required=True)

    args = p.parse_args()

    if args.cmd == "prune":
        from ecs_yolo_tpu.hub import create
        from ecs_yolo_tpu.train.sparsity import prune_by_bn_gamma
        from ecs_yolo_tpu.utils.checkpoint import save_checkpoint
        from ecs_yolo_tpu.train.trainer import TrainState
        import jax.numpy as jnp

        model, variables = create(args.cfg, args.weights, nc=args.nc)
        pruned, report = prune_by_bn_gamma(variables, ratio=args.ratio)
        print(json.dumps(report))
        state = TrainState(
            params=pruned["params"], batch_stats=pruned["batch_stats"],
            opt_state={}, ema_params=pruned["params"],
            step=jnp.zeros((), jnp.int32),
        )
        save_checkpoint(Path(args.out) / "pruned", state, model.cfg,
                        extra=report)
        print(f"pruned checkpoint -> {args.out}/pruned "
              f"(finetune: python train.py --resume {args.out}/pruned ...)")

    elif args.cmd == "firing-rate":
        from ecs_yolo_tpu.hub import create
        from ecs_yolo_tpu.observe import calculate_fr
        from ecs_yolo_tpu.data.dataset import Dataset

        model, variables = create(args.cfg, args.weights, nc=args.nc)
        ds = Dataset(args.data, img_size=args.imgsz, augment=False)
        Path(args.out).mkdir(parents=True, exist_ok=True)
        rates = calculate_fr(
            model, variables, ds.batches(1), max_batches=args.batches,
            save_prefix=str(Path(args.out) / "fr"),
        )
        print(json.dumps({k: round(v, 4) for k, v in rates.items()}, indent=1))

    elif args.cmd == "export":
        from ecs_yolo_tpu.hub import create
        from ecs_yolo_tpu import export as export_mod

        model, variables = create(args.cfg, args.weights, nc=args.nc)
        out = export_mod.run(
            model, variables, include=args.include, out_dir=args.out,
            imgsz=args.imgsz, int8=args.int8, calib_data=args.calib_data,
        )
        print(json.dumps({k: str(v) for k, v in out.items()}))

    elif args.cmd == "profile":
        import jax
        from ecs_yolo_tpu.hub import create
        from ecs_yolo_tpu.utils.profiling import profile_layers
        from ecs_yolo_tpu.models.utils import model_info

        model, variables = create(args.cfg, args.weights, nc=args.nc)
        info = model_info(model, variables, imgsz=args.imgsz)
        print(json.dumps(info))
        for row in profile_layers(model, variables, imgsz=args.imgsz):
            print(f"{row['index']:>3} {row['name']:<20} {row['ms']:>8.2f} ms")

    elif args.cmd == "voxelize":
        from ecs_yolo_tpu.data.events import build_dataset

        n = build_dataset(
            list(zip(args.dat, args.labels)), args.out,
            sample_size=args.sample_size, t_bins=args.t_bins,
        )
        print(f"wrote {n} samples -> {args.out}")

    elif args.cmd == "image-list":
        # reference exportfiletxt.py: write image list txts for a split dir
        from ecs_yolo_tpu.data.dataset import find_images

        files = find_images(args.root)
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text("\n".join(files))
        print(f"{len(files)} images -> {args.out}")


if __name__ == "__main__":
    main()
