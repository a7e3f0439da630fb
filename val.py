"""Validation CLI (reference val.py / val2.py / val3.py unified).

Example:
    python val.py --weights runs/train/exp/weights/best --cfg resnet10.yaml \
        --data data/kitti.yaml --imgsz 640
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import yaml


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True, help="orbax checkpoint dir")
    p.add_argument("--cfg", default="resnet10.yaml")
    p.add_argument("--data", default="data/kitti.yaml")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--conf-thres", type=float, default=0.001)
    p.add_argument("--iou-thres", type=float, default=0.6)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--task", default="val", choices=["val", "test", "speed"])
    p.add_argument("--save-json", default=None,
                   help="write COCO-format detections to this json path")
    p.add_argument("--anno-json", default=None,
                   help="COCO GT annotations json; with --save-json runs "
                        "COCOeval (pycocotools or the numpy fallback)")
    p.add_argument("--coco91", action="store_true",
                   help="map 80-class ids to COCO-91 ids in the json")
    p.add_argument("--use-ema", action="store_true", default=True)
    p.add_argument("--device", default="",
                   help="jax platform, e.g. cpu or tpu (reference --device)")
    p.add_argument("--fuse", action="store_true",
                   help="fold BN scale into conv kernels before eval "
                        "(reference fuses at every load, "
                        "models/experimental.py:94)")
    return p.parse_args()


def main(opt):
    from ecs_yolo_tpu.utils.general import LOGGER, select_device

    select_device(opt.device)
    from ecs_yolo_tpu import val as val_mod
    from ecs_yolo_tpu.models.yolo import build_model
    from ecs_yolo_tpu.utils.checkpoint import load_checkpoint

    with open(opt.data) as fh:
        data = yaml.safe_load(fh)
    root = Path(data.get("path", "."))
    split = data.get(opt.task if opt.task != "speed" else "val", data["val"])

    w = Path(opt.weights)
    if w.suffix == ".tflite" or (w / "saved_model.pb").is_file():
        # exported-artifact eval (reference val.py DetectMultiBackend)
        from ecs_yolo_tpu.backends import DetectMultiBackend

        model = DetectMultiBackend(w, cfg=opt.cfg, nc=data["nc"])
        variables = None
    else:
        model = build_model(opt.cfg, nc=data["nc"])
        tree, meta = load_checkpoint(opt.weights)
        params = tree.get("ema_params") if opt.use_ema and "ema_params" in tree else tree["params"]
        variables = {"params": params, "batch_stats": tree.get("batch_stats", {})}
        if opt.fuse:
            from ecs_yolo_tpu.models.utils import fuse_conv_bn

            variables = fuse_conv_bn(variables)

    results = val_mod.run(
        model, variables, str(root / split),
        imgsz=opt.imgsz, batch_size=opt.batch_size,
        conf_thres=opt.conf_thres, iou_thres=opt.iou_thres,
        max_det=opt.max_det, verbose=True,
        save_json=opt.save_json, anno_json=opt.anno_json, coco91=opt.coco91,
    )
    pre, inf, nms = results["speed"]
    LOGGER.info(
        f"speed: {pre:.1f}ms pre-process, {inf:.1f}ms inference, "
        f"{nms:.1f}ms NMS per image"
    )
    print(json.dumps({k: v for k, v in results.items() if k != "per_class"}))


if __name__ == "__main__":
    main(parse_opt())
