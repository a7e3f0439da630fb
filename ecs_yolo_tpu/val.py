"""Validation driver: dataset -> jitted forward -> NMS -> mAP.

Equivalent of reference val.py:134-513 ``run()``: conf 0.001 / IoU 0.6 /
multi-label NMS, TP matrix over 10 IoU thresholds, ap_per_class summary and
the speed breakdown (pre-process / inference / NMS ms per image).
Predictions AND labels are mapped back to native resolution before the TP
matrix (reference val.py:309 ``scale_coords``), and the ``--save-json`` path
emits COCO-format records keyed by the real image ids (numeric filename
stems — reference ``save_one_json``, val.py:56-78) with native-space boxes,
evaluated through pycocotools when present or the pure-numpy
``ops.cocoeval`` fallback otherwise.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .data.dataset import Dataset
from .models.yolo import BuiltModel
from .ops.nms import non_max_suppression
from .ops.boxes import xywh2xyxy
from .ops.metrics import ap_per_class, process_batch, fitness


def run(
    model: BuiltModel,
    variables,
    data_path,
    imgsz: int = 640,
    batch_size: int = 8,
    conf_thres: float = 0.001,
    iou_thres: float = 0.6,
    max_det: int = 300,
    max_labels: int = 300,
    verbose: bool = False,
    dataset: Optional[Dataset] = None,
    save_json: Optional[str] = None,
    anno_json: Optional[str] = None,
    coco91: bool = False,
    workers: int = 4,
    mesh=None,
    fuse_post: bool = False,
    chain_batches: bool = False,
    jit_cache: Optional[Dict] = None,
) -> Dict:
    """Returns {mp, mr, map50, map, fitness, speed, per_class}; with
    ``save_json`` + ``anno_json`` also a ``coco`` sub-dict from COCOeval.

    ``mesh``: a 1-D (or 2-D with a 'data' axis) ``jax.sharding.Mesh`` —
    the forward AND the fixed-shape NMS run batch-sharded over it, so
    per-epoch val during 8-chip training uses all chips instead of idling
    7 (the reference is rank-0 val, train.py:630-641; this is the
    TPU-native upgrade).  Shardings only change layout, never values —
    metrics are identical to the single-device run (tests/test_val.py).
    ``batch_size`` must divide by the mesh's data-axis size."""
    ds = dataset or Dataset(
        data_path, img_size=imgsz, augment=False, max_labels=max_labels,
        uint8_out=True,
    )
    has_obj = model.head_name == "Detect"
    _in_sharding = None

    if variables is None and hasattr(model, "predict"):
        # exported-artifact eval (DetectMultiBackend on .tflite/saved_model
        # — reference val.py runs DetectMultiBackend weights the same way);
        # used to measure e.g. the int8 PTQ mAP delta vs the native path
        def forward(images):
            images = np.asarray(images)
            if images.dtype == np.uint8:
                images = images.astype(np.float32) / 255.0
            pred = jnp.asarray(model.predict(images))
            if model.head_name in ("Segment", "Panoptic"):
                pred = pred[:, : 4 + model.nc, :]
            return pred
    else:
        if mesh is not None:
            from .parallel.mesh import batch_sharding, replicated

            variables = jax.device_put(variables, replicated(mesh))
            _in_sharding = batch_sharding(mesh)

        # NOTE: ``vars_`` is an ARGUMENT, not a closure constant — baking
        # the weights into the graph would make every epoch's val a fresh
        # executable (re-trace + re-compile; ~90 s/epoch measured through
        # the remote-compile tunnel).  As an argument the jit below is
        # compiled once and reused across epochs via ``jit_cache``.
        def forward(vars_, images):
            if images.dtype == jnp.uint8:
                # uint8 transport (Dataset uint8_out): on-device divide
                # (<=1 ulp vs the host path), 4x less host->device traffic
                images = images.astype(jnp.float32) / 255.0
            out = model.module.apply(vars_, images, training=False)
            if model.head_name in ("v10Detect", "ASFF_v10Detect"):
                return out.one2one[0]
            pred = out[0]
            if model.head_name in ("Segment", "Panoptic"):
                # [B, 4+nc+nm, A]: drop the mask coefficients before NMS —
                # they are not class scores (reference val runs the detection
                # slice the same way)
                pred = pred[:, : 4 + model.nc, :]
            return pred

    iouv = np.linspace(0.5, 0.95, 10)
    stats = []
    dt = [0.0, 0.0, 0.0]
    seen = 0
    json_dets = []

    # EventDataset has no per-image letterbox meta (samples are fixed-size
    # voxel grids) — evaluate in canvas space with sequential ids there.
    has_meta = hasattr(ds, "meta")
    if has_meta:
        batch_iter = ds.batches(
            batch_size, drop_last=False, yield_idx=True, workers=workers
        )
    else:
        batch_iter = (
            (ims, lbs, ms, n, list(range(k * batch_size,
                                         k * batch_size + n)))
            for k, (ims, lbs, ms, n) in enumerate(
                ds.batches(batch_size, drop_last=False, yield_count=True)
            )
        )

    # NMS jitted so the sharded path keeps the whole post-process on-device
    # (fixed-shape greedy NMS is pure XLA; batch dim shards cleanly)
    def _nms_body(p):
        return non_max_suppression(
            p,
            conf_thres=conf_thres,
            iou_thres=iou_thres,
            multi_label=True,
            max_det=max_det,
            has_obj=has_obj,
        )

    def _cached_jit(kind, builder):
        """One jit wrapper per (kind, thresholds) reused across epochs —
        the executable cache inside the wrapper then serves every epoch
        (shape-specialized as needed) instead of re-compiling."""
        if jit_cache is None:
            return jax.jit(builder)
        key = (kind, model.head_name, conf_thres, iou_thres, max_det,
               mesh is not None)
        if key not in jit_cache:
            jit_cache[key] = jax.jit(builder)
        return jit_cache[key]

    fused = None
    if (fuse_post or chain_batches) and variables is not None:
        # forward+NMS in ONE compiled call: halves the per-batch dispatch
        # count (the reference's val.py times them separately; the split
        # pre/inf/nms speed breakdown is preserved on the default path —
        # the fused path books the combined time under 'inference')
        fused = _cached_jit("fused", lambda v, x: _nms_body(forward(v, x)))
    elif variables is not None:
        fwd_jit = _cached_jit("forward", forward)
        nms = jax.jit(_nms_body)
    else:
        nms = jax.jit(_nms_body)

    if chain_batches and fused is not None:
        # the ENTIRE val pass as one compiled lax.scan over stacked batches
        # — a single device dispatch.  Matters when per-dispatch latency is
        # large (remote/tunneled links); on local hosts it merely trades
        # host/device overlap for one dispatch.  Used by the driver's
        # per-epoch val.
        all_b = list(batch_iter)
        if not all_b:
            return dict(mp=0, mr=0, map50=0, map=0, fitness=0,
                        speed=(0, 0, 0))
        t0 = time.perf_counter()
        xs = np.stack([b[0] for b in all_b])
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            xs = jax.device_put(
                xs, NamedSharding(mesh, PartitionSpec(None, "data"))
            )
        else:
            xs = jnp.asarray(xs)
        t1 = time.perf_counter()
        scan_call = _cached_jit(
            "chain",
            lambda v, a: jax.lax.scan(
                lambda c, x: (c, _nms_body(forward(v, x))), None, a
            )[1],
        )
        outs, valids = scan_call(variables, xs)
        outs = np.asarray(outs)
        valids = np.asarray(valids)
        t2 = time.perf_counter()
        dt[0] += t1 - t0
        dt[1] += t2 - t1
        results_iter = (
            (b[0], b[1], b[2], b[3], b[4], outs[k], valids[k])
            for k, b in enumerate(all_b)
        )
    else:
        def _per_batch():
            for ims, labels, masks, n_real, idxs in batch_iter:
                t0 = time.perf_counter()
                x = jnp.asarray(ims)
                if _in_sharding is not None:
                    x = jax.device_put(x, _in_sharding)
                t1 = time.perf_counter()
                if fused is not None:
                    out, valid = fused(variables, x)
                    out = np.asarray(out)
                    valid = np.asarray(valid)
                    t2 = t3 = time.perf_counter()
                else:
                    pred = (fwd_jit(variables, x) if variables is not None
                            else forward(x))
                    pred.block_until_ready()
                    t2 = time.perf_counter()
                    out, valid = nms(pred)
                    out = np.asarray(out)
                    valid = np.asarray(valid)
                    t3 = time.perf_counter()
                dt[0] += t1 - t0
                dt[1] += t2 - t1
                dt[2] += t3 - t2
                yield ims, labels, masks, n_real, idxs, out, valid

        results_iter = _per_batch()

    for ims, labels, masks, n_real, idxs, out, valid in results_iter:
        # only the first n_real rows are real images; the zero-padded tail
        # must not contribute detections (false positives) to the metrics
        for si in range(n_real):
            if has_meta:
                meta = ds.meta(idxs[si])
            else:  # canvas == native (fixed-size event voxel grids)
                chw = ims.shape[-3:-1]
                meta = dict(id=idxs[si] + 1, native_hw=chw, canvas_hw=chw,
                            ratio_pad=((1.0, 1.0), (0.0, 0.0)))
            h0, w0 = meta["native_hw"]
            (gy, gx), (pad_w, pad_h) = meta["ratio_pad"]
            lm = masks[si]
            nl = int(lm.sum())
            if not nl and not valid[si].any():
                continue
            seen += 1
            # ground truth at NATIVE resolution, straight from the label txts
            # (normalized to the native image) — no letterbox round-trip
            gt = labels[si][lm]
            gt_xyxy = np.asarray(xywh2xyxy(jnp.asarray(gt[:, 1:5])))
            h, w = meta["canvas_hw"]
            # labels in the batch are canvas-normalized; invert the letterbox
            gt_xyxy = gt_xyxy * [w, h, w, h]
            gt_xyxy[:, [0, 2]] = ((gt_xyxy[:, [0, 2]] - pad_w) / gx).clip(0, w0)
            gt_xyxy[:, [1, 3]] = ((gt_xyxy[:, [1, 3]] - pad_h) / gy).clip(0, h0)
            gt5 = np.concatenate([gt[:, 0:1], gt_xyxy], axis=1)
            # predictions: letterbox canvas -> native (reference val.py:309)
            dets = out[si][valid[si]].copy()
            dets[:, [0, 2]] = ((dets[:, [0, 2]] - pad_w) / gx).clip(0, w0)
            dets[:, [1, 3]] = ((dets[:, [1, 3]] - pad_h) / gy).clip(0, h0)
            correct = process_batch(dets, gt5, iouv)
            stats.append(
                (correct, dets[:, 4], dets[:, 5], gt[:, 0])
            )
            if save_json is not None:
                # COCO-format records (reference save_one_json, val.py:56-78):
                # real image ids, native-space corner-xywh boxes
                from .ops.metrics import coco80_to_coco91_class

                cmap = coco80_to_coco91_class() if coco91 else None
                for x1, y1, x2, y2, conf, cls in dets:
                    cid = cmap[int(cls)] if cmap else int(cls)
                    json_dets.append(
                        dict(
                            image_id=meta["id"],
                            category_id=cid,
                            bbox=[round(float(v), 3) for v in
                                  (x1, y1, x2 - x1, y2 - y1)],
                            score=round(float(conf), 5),
                        )
                    )

    coco_res = None
    if save_json is not None:
        import json as json_mod
        from pathlib import Path as _P

        _P(save_json).parent.mkdir(parents=True, exist_ok=True)
        with open(save_json, "w") as fh:
            json_mod.dump(json_dets, fh)
        if anno_json is not None:
            # pycocotools when available, ops.cocoeval numpy fallback else
            from .ops.cocoeval import evaluate_json

            coco_res = evaluate_json(anno_json, save_json)

    if not stats:
        return dict(mp=0, mr=0, map50=0, map=0, fitness=0, speed=(0, 0, 0))

    tp = np.concatenate([s[0] for s in stats])
    conf = np.concatenate([s[1] for s in stats])
    pred_cls = np.concatenate([s[2] for s in stats])
    target_cls = np.concatenate([s[3] for s in stats])

    if tp.shape[0]:
        tp_c, fp_c, p, r, f1, ap, cls_ids = ap_per_class(
            tp, conf, pred_cls, target_cls
        )
        ap50, ap_all = ap[:, 0], ap.mean(1)
        mp, mr, map50, map_ = p.mean(), r.mean(), ap50.mean(), ap_all.mean()
    else:
        mp = mr = map50 = map_ = 0.0
        cls_ids, p, r, ap50, ap_all = [], [], [], [], []

    n_img = max(seen, 1)
    speed = tuple(1000.0 * t / n_img for t in dt)
    fit = float(
        fitness(np.array([[mp, mr, map50, map_]]))[0]
    )
    result = dict(
        mp=float(mp), mr=float(mr), map50=float(map50), map=float(map_),
        fitness=fit, speed=speed,
        per_class={int(c): (float(pp), float(rr), float(a5), float(aa))
                   for c, pp, rr, a5, aa in zip(cls_ids, p, r, ap50, ap_all)},
    )
    if coco_res is not None:
        result["coco"] = coco_res
    if verbose:
        print(
            f"P={mp:.3f} R={mr:.3f} mAP50={map50:.3f} mAP={map_:.3f} "
            f"speed pre/inf/nms = {speed[0]:.1f}/{speed[1]:.1f}/{speed[2]:.1f} ms"
        )
    return result
