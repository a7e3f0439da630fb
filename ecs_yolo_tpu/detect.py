"""Inference driver: images -> detections -> annotated outputs / txt.

Equivalent of reference detect.py:60-280: LoadImages -> letterbox ->
jitted forward -> NMS (conf 0.25 / IoU 0.45) -> scale back to the native
image -> draw / save.  Drawing uses PIL (no OpenCV in this image).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image, ImageDraw

from .data.loaders import LoadImages
from .models.yolo import BuiltModel
from .ops.nms import non_max_suppression

_PALETTE = [
    (255, 56, 56), (255, 157, 151), (255, 112, 31), (255, 178, 29),
    (207, 210, 49), (72, 249, 10), (146, 204, 23), (61, 219, 134),
    (26, 147, 52), (0, 212, 187), (44, 153, 168), (0, 194, 255),
    (52, 69, 147), (100, 115, 255), (0, 24, 236), (132, 56, 255),
]


def scale_to_native(boxes: np.ndarray, lb_shape, native_shape):
    """Invert the letterbox mapping (reference utils/general.py:621-647)."""
    gain = min(lb_shape[0] / native_shape[0], lb_shape[1] / native_shape[1])
    pad_w = (lb_shape[1] - native_shape[1] * gain) / 2
    pad_h = (lb_shape[0] - native_shape[0] * gain) / 2
    out = boxes.copy()
    out[:, [0, 2]] = (out[:, [0, 2]] - pad_w) / gain
    out[:, [1, 3]] = (out[:, [1, 3]] - pad_h) / gain
    out[:, [0, 2]] = out[:, [0, 2]].clip(0, native_shape[1])
    out[:, [1, 3]] = out[:, [1, 3]].clip(0, native_shape[0])
    return out


def run(
    model: BuiltModel,
    variables,
    source,
    imgsz: int = 640,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    save_dir: Optional[str] = None,
    save_txt: bool = False,
    names: Optional[List[str]] = None,
):
    """Yields (path, detections [n,6] native xyxy/conf/cls) per image.

    ``model`` is a :class:`BuiltModel` (with ``variables``) or a
    :class:`~ecs_yolo_tpu.backends.DetectMultiBackend` wrapping an exported
    artifact (reference detect.py:97 constructing DetectMultiBackend)."""
    from .backends import DetectMultiBackend

    has_obj = model.head_name == "Detect"
    loader = LoadImages(source, img_size=imgsz)

    if isinstance(model, DetectMultiBackend):
        def forward(images):
            pred = model.predict(images)
            if model.head_name in ("Segment", "Panoptic"):
                pred = pred[:, : 4 + model.nc, :]
            return pred
    else:
        @jax.jit
        def _fwd(images):
            out = model.module.apply(variables, images, training=False)
            if model.head_name == "v10Detect":
                return out.one2one[0]
            pred = out[0]
            if model.head_name in ("Segment", "Panoptic"):
                # drop mask coefficients before NMS (see val.py)
                pred = pred[:, : 4 + model.nc, :]
            return pred

        forward = _fwd

    if save_dir:
        Path(save_dir).mkdir(parents=True, exist_ok=True)

    results = []
    for path, im, im0 in loader:
        pred = forward(jnp.asarray(im))
        out, valid = non_max_suppression(
            pred, conf_thres=conf_thres, iou_thres=iou_thres,
            max_det=max_det, has_obj=has_obj,
        )
        dets = np.asarray(out)[0][np.asarray(valid)[0]]
        if len(dets):
            dets[:, :4] = scale_to_native(
                dets[:, :4], im.shape[1:3], im0.shape[:2]
            )
        results.append((path, dets))

        if save_dir:
            img = Image.fromarray(im0)
            draw = ImageDraw.Draw(img)
            for x1, y1, x2, y2, conf, cls in dets:
                c = int(cls)
                color = _PALETTE[c % len(_PALETTE)]
                draw.rectangle([x1, y1, x2, y2], outline=color, width=2)
                label = names[c] if names and c < len(names) else str(c)
                draw.text((x1 + 2, max(y1 - 12, 0)), f"{label} {conf:.2f}", fill=color)
            img.save(Path(save_dir) / Path(path).name)
            if save_txt:
                txt = Path(save_dir) / (Path(path).stem + ".txt")
                with open(txt, "w") as fh:
                    h, w = im0.shape[:2]
                    for x1, y1, x2, y2, conf, cls in dets:
                        xc, yc = (x1 + x2) / 2 / w, (y1 + y2) / 2 / h
                        bw, bh = (x2 - x1) / w, (y2 - y1) / h
                        fh.write(f"{int(cls)} {xc:.6f} {yc:.6f} {bw:.6f} {bh:.6f} {conf:.4f}\n")
    return results
