"""Inference CLI (reference detect.py / detect2.py).

Example:
    python detect.py --weights runs/train/exp/weights/best \
        --cfg resnet10.yaml --source imgs/ --save-dir runs/detect/exp
"""

from __future__ import annotations

import argparse

import yaml


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True, help="orbax checkpoint dir")
    p.add_argument("--cfg", default="resnet10.yaml")
    p.add_argument("--source", required=True, help="image file/dir/glob")
    p.add_argument("--data", default=None, help="dataset yaml (class names)")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--nc", type=int, default=None)
    p.add_argument("--save-dir", default="runs/detect/exp")
    p.add_argument("--save-txt", action="store_true")
    p.add_argument("--device", default="",
                   help="jax platform, e.g. cpu or tpu (reference --device)")
    p.add_argument("--fuse", action="store_true",
                   help="fold BN scale into conv kernels before inference "
                        "(reference fuses at every load, "
                        "models/experimental.py:94)")
    return p.parse_args()


def main(opt):
    from ecs_yolo_tpu.utils.general import LOGGER, select_device

    select_device(opt.device)
    from ecs_yolo_tpu import detect as detect_mod
    from ecs_yolo_tpu.models.yolo import build_model
    from ecs_yolo_tpu.utils.checkpoint import load_checkpoint

    names, nc = None, opt.nc
    if opt.data:
        with open(opt.data) as fh:
            d = yaml.safe_load(fh)
        names, nc = d.get("names"), d["nc"]

    from pathlib import Path

    from ecs_yolo_tpu.backends import DetectMultiBackend

    w = Path(opt.weights)
    if w.suffix == ".tflite" or (w / "saved_model.pb").is_file():
        # exported-artifact inference (reference detect.py:97
        # DetectMultiBackend on .tflite / saved_model weights)
        model = DetectMultiBackend(w, cfg=opt.cfg, nc=nc, names=names)
        variables = None
        names = names or model.names
    else:
        model = build_model(opt.cfg, nc=nc)
        tree, _ = load_checkpoint(opt.weights)
        params = tree.get("ema_params", tree["params"])
        variables = {"params": params, "batch_stats": tree.get("batch_stats", {})}
        if opt.fuse:
            from ecs_yolo_tpu.models.utils import fuse_conv_bn

            variables = fuse_conv_bn(variables)

    results = detect_mod.run(
        model, variables, opt.source,
        imgsz=opt.imgsz, conf_thres=opt.conf_thres, iou_thres=opt.iou_thres,
        max_det=opt.max_det, save_dir=opt.save_dir, save_txt=opt.save_txt,
        names=names,
    )
    n = sum(len(d) for _, d in results)
    LOGGER.info(f"{len(results)} images, {n} detections -> {opt.save_dir}")


if __name__ == "__main__":
    main(parse_opt())
