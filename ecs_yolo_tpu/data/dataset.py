"""Training/validation dataset: images + YOLO-format txt labels.

Host-side equivalent of the reference ``LoadImagesAndLabels``
(utils/datasets.py:377-810): label discovery via the images->labels path
convention, hash-validated label cache, mosaic-4 + random-perspective + HSV +
flip augmentation, letterbox for val.  TPU-specific departures:

* batches are static-shape: images are square letterboxed (rect-batch shape
  buckets are a later optimization) and labels are PADDED to ``max_labels``
  with a validity mask instead of the reference's variable-length [n,6]
  concat (utils/datasets.py:626 collate_fn),
* images come out channels-last float32 [0,1] (NHWC for TPU convs).
"""

from __future__ import annotations

import hashlib
import math
import os
import random
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from .augment import (
    Albumentations,
    augment_hsv,
    box_candidates,
    flip_lr,
    flip_ud,
    letterbox,
    mixup,
    random_perspective,
)

IMG_FORMATS = {"bmp", "jpeg", "jpg", "png", "tif", "tiff", "webp"}


def img2label_path(p: str) -> str:
    """images/xxx.jpg -> labels/xxx.txt (reference utils/datasets.py:371)."""
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return sb.join(p.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt"


def img2stuff_path(p: str) -> str:
    """images/xxx.jpg -> stuff/xxx.txt — stuff-class polygons for panoptic
    training (reference utils/panoptic/dataloaders.py:85-88)."""
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}stuff{os.sep}"
    return sb.join(p.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt"


def find_images(path) -> List[str]:
    """Resolve a dir / txt list / glob into a sorted image list."""
    files: List[str] = []
    for p in path if isinstance(path, (list, tuple)) else [path]:
        p = Path(p)
        if p.is_dir():
            files += [str(f) for f in sorted(p.rglob("*.*"))]
        elif p.is_file() and p.suffix == ".txt":
            root = p.parent
            with open(p) as fh:
                for line in fh.read().strip().splitlines():
                    line = line.strip()
                    f = (root / line).resolve() if line.startswith("./") else Path(line)
                    files.append(str(f))
        elif p.is_file():
            files.append(str(p))
        else:
            raise FileNotFoundError(f"{p} does not exist")
    return sorted(
        f for f in files if f.rsplit(".", 1)[-1].lower() in IMG_FORMATS
    )


def _paths_hash(paths: Sequence[str]) -> str:
    h = hashlib.md5()
    for p in paths:
        h.update(p.encode())
        try:
            h.update(str(os.path.getsize(p)).encode())
        except OSError:
            pass
    return h.hexdigest()


def load_label_file(path: str) -> np.ndarray:
    """Read one YOLO txt -> [n, 5] (cls, x, y, w, h), validated."""
    if not os.path.isfile(path):
        return np.zeros((0, 5), np.float32)
    with open(path) as fh:
        rows = [l.split() for l in fh.read().strip().splitlines() if l]
    if not rows:
        return np.zeros((0, 5), np.float32)
    lb = np.array(rows, dtype=np.float32)
    assert lb.shape[1] == 5, f"labels require 5 columns, got {lb.shape[1]}: {path}"
    assert (lb >= 0).all(), f"negative label values: {path}"
    assert (lb[:, 1:] <= 1).all(), f"non-normalized coordinates: {path}"
    _, idx = np.unique(lb, axis=0, return_index=True)
    return lb[np.sort(idx)]


class Dataset:
    """Image+label dataset with cached labels and YOLO augmentations."""

    def __init__(
        self,
        path,
        img_size: int = 640,
        augment: bool = False,
        hyp: Optional[Dict] = None,
        stride: int = 32,
        pad: float = 0.0,
        max_labels: int = 300,
        cache_dir: Optional[str] = None,
        single_cls: bool = False,
        rect: bool = False,
        rect_buckets: int = 4,
        cache_images: Optional[str] = None,
        uint8_out: bool = False,
    ):
        self.img_files = find_images(path)
        assert self.img_files, f"no images found in {path}"
        self.label_files = [img2label_path(p) for p in self.img_files]
        self.img_size = img_size
        self.augment = augment
        self.hyp = dict(hyp or {})
        self.stride = stride
        self.pad = pad
        self.max_labels = max_labels
        self.single_cls = single_cls
        self.uint8_out = uint8_out
        self.labels = self._load_labels(cache_dir)
        self.albumentations = Albumentations() if augment else None
        self.n = len(self.img_files)
        self.indices = np.arange(self.n)
        self.mosaic_border = [-img_size // 2, -img_size // 2]

        # rect mode (reference rect-batch shape sorting, utils/datasets.py):
        # TPU needs static shapes, so aspect ratios quantize into a few
        # letterbox buckets instead of per-batch dynamic shapes — each bucket
        # is one compiled program.
        # decoded-image cache (reference --cache ram|disk,
        # utils/datasets.py:494-518 cache_images): stores the OUTPUT of
        # load_image (decoded + resized-to-img_size uint8), so steady-state
        # epochs skip JPEG decode entirely.  'ram' fills lazily on first
        # access (epoch 0 is compile-bound anyway, so an eager prefill with
        # a progress bar buys nothing on this 1-core host); 'disk' writes
        # .npy on first miss next to the label cache.  A /proc/meminfo
        # guard disables 'ram' if the estimated footprint exceeds 80% of
        # MemAvailable (reference check_cache_ram equivalent).
        self.cache_images = cache_images
        self.ims: Optional[list] = None
        self._im_hw0: Optional[list] = None
        if cache_images == "ram":
            if not self._cache_ram_ok():
                LOGGER = __import__("logging").getLogger("ecs_yolo_tpu")
                LOGGER.warning(
                    "image RAM cache would exceed 80%% of available memory"
                    " — falling back to uncached loads"
                )
                self.cache_images = None
            else:
                self.ims = [None] * self.n
                self._im_hw0 = [None] * self.n
        elif cache_images == "disk":
            base = Path(cache_dir) if cache_dir else (
                Path(self.img_files[0]).parent.parent / ".npy_cache"
            )
            base.mkdir(parents=True, exist_ok=True)
            self._npy_dir = base
        elif cache_images is not None:
            raise ValueError(f"cache_images must be ram|disk, got {cache_images}")

        self.rect = rect
        self.batch_shape = None  # per-image [h, w] when rect
        if rect:
            shapes = np.array([self._image_hw(p) for p in self.img_files])
            ar = shapes[:, 0] / shapes[:, 1]  # h / w
            qs = np.quantile(ar, np.linspace(0, 1, rect_buckets + 1))
            bucket_of = np.clip(np.searchsorted(qs, ar, "right") - 1, 0,
                                rect_buckets - 1)
            self.batch_shape = np.zeros((self.n, 2), int)
            for b in range(rect_buckets):
                sel = bucket_of == b
                if not sel.any():
                    continue
                a = np.median(ar[sel])
                if a < 1:  # wide
                    hw = (max(int(np.ceil(img_size * a / stride)) * stride,
                              stride), img_size)
                else:  # tall
                    hw = (img_size, max(int(np.ceil(img_size / a / stride))
                                        * stride, stride))
                self.batch_shape[sel] = hw
            self._bucket_of = bucket_of

    # -- labels ---------------------------------------------------------------

    def _load_labels(self, cache_dir):
        cache_path = None
        key = _paths_hash(self.img_files)
        if cache_dir:
            cache_path = Path(cache_dir) / f"labels_{key}.npz"
            if cache_path.exists():
                z = np.load(cache_path, allow_pickle=True)
                if str(z["hash"]) == key:
                    return list(z["labels"])
        labels = [load_label_file(p) for p in self.label_files]
        if self.single_cls:
            for lb in labels:
                lb[:, 0] = 0
        if cache_path:
            cache_path.parent.mkdir(parents=True, exist_ok=True)
            np.savez(
                cache_path,
                hash=key,
                labels=np.array(labels, dtype=object),
            )
        return labels

    # -- image access ---------------------------------------------------------

    @staticmethod
    def _image_hw(path: str):
        with Image.open(path) as im:
            return im.height, im.width

    def meta(self, i: int) -> Dict:
        """Per-image eval metadata (reference ``shapes`` in
        utils/datasets.py __getitem__ + image ids in val.py:56-60):
        COCO image id (numeric filename stem, else the stem string), native
        (h0, w0) and the letterbox ``ratio_pad`` that maps the val canvas
        back to native space via ``ops.boxes.scale_coords``.  Valid for the
        non-augmented (val) path."""
        p = Path(self.img_files[i])
        img_id = int(p.stem) if p.stem.isnumeric() else p.stem
        h0, w0 = self._image_hw(self.img_files[i])
        r0 = self.img_size / max(h0, w0)
        h, w = (int(h0 * r0), int(w0 * r0)) if r0 != 1 else (h0, w0)
        shape = tuple(self.batch_shape[i]) if self.rect else (
            self.img_size, self.img_size)
        r = min(shape[0] / h, shape[1] / w, 1.0)  # letterbox scaleup=False
        new_unpad = (int(round(w * r)), int(round(h * r)))
        pad = ((shape[1] - new_unpad[0]) / 2, (shape[0] - new_unpad[1]) / 2)
        return dict(
            id=img_id,
            path=self.img_files[i],
            native_hw=(h0, w0),
            canvas_hw=shape,
            ratio_pad=((h / h0 * r, w / w0 * r), pad),
        )

    def _cache_ram_ok(self, frac: float = 0.8) -> bool:
        """Estimate the RAM-cache footprint from one decoded image against
        /proc/meminfo MemAvailable (reference check_cache_ram,
        utils/dataloaders.py)."""
        try:
            with Image.open(self.img_files[0]) as im:
                w0, h0 = im.size
            r = self.img_size / max(h0, w0)
            need = self.n * 3 * min(1.0, r) ** 2 * h0 * w0
            with open("/proc/meminfo") as f:
                avail = next(
                    int(ln.split()[1]) * 1024
                    for ln in f
                    if ln.startswith("MemAvailable")
                )
            return need < frac * avail
        except Exception:
            return True  # no meminfo (non-Linux) — trust the caller

    def _decode_resize(self, i: int):
        im = np.asarray(Image.open(self.img_files[i]).convert("RGB"))
        h0, w0 = im.shape[:2]
        r = self.img_size / max(h0, w0)
        if r != 1:
            im = np.asarray(
                Image.fromarray(im).resize(
                    (int(w0 * r), int(h0 * r)), Image.BILINEAR
                )
            )
        return im, (h0, w0)

    def load_image(self, i: int):
        """Load + resize longest side to img_size (keeps ratio).  Serves
        from the RAM/disk cache when enabled; a cached entry resized for a
        different img_size (multi-scale epochs) falls back to a fresh
        decode rather than serving a stale resolution."""
        if self.ims is not None:
            hit = self.ims[i]
            # _decode_resize always leaves max(shape) == img_size, so a
            # mismatch means the entry was cached for another scale
            if hit is not None and max(hit.shape[:2]) == self.img_size:
                return hit, self._im_hw0[i], hit.shape[:2]
            im, hw0 = self._decode_resize(i)
            # single-element list/array writes are atomic under the GIL —
            # safe from the thread-pool workers in batches()
            self.ims[i], self._im_hw0[i] = im, hw0
            return im, hw0, im.shape[:2]
        if self.cache_images == "disk":
            p = self._npy_dir / f"{Path(self.img_files[i]).stem}_{i}_{self.img_size}.npy"
            if p.exists():
                im = np.load(p)
                h0w0 = tuple(
                    np.load(p.with_suffix(".hw0.npy"))
                ) if p.with_suffix(".hw0.npy").exists() else im.shape[:2]
                return im, h0w0, im.shape[:2]
            im, hw0 = self._decode_resize(i)
            try:
                np.save(p, im)
                np.save(p.with_suffix(".hw0.npy"), np.asarray(hw0))
            except OSError:
                pass  # disk full — keep training uncached
            return im, hw0, im.shape[:2]
        im, hw0 = self._decode_resize(i)
        return im, hw0, im.shape[:2]

    def __len__(self):
        return self.n

    # -- augmentation pipeline ------------------------------------------------

    def load_mosaic(self, index: int, rng) -> Tuple[np.ndarray, np.ndarray]:
        """4-image mosaic (reference utils/datasets.py:681-750)."""
        s = self.img_size
        yc = int(rng.uniform(-self.mosaic_border[0], 2 * s + self.mosaic_border[0]))
        xc = int(rng.uniform(-self.mosaic_border[1], 2 * s + self.mosaic_border[1]))
        idxs = [index] + [int(rng.choice(self.indices)) for _ in range(3)]
        img4 = np.full((s * 2, s * 2, 3), 114, dtype=np.uint8)
        labels4 = []
        for i, idx in enumerate(idxs):
            img, _, (h, w) = self.load_image(idx)
            if i == 0:  # top-left
                x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
                x1b, y1b = w - (x2a - x1a), h - (y2a - y1a)
                x2b, y2b = w, h
            elif i == 1:  # top-right
                x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
                x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
            elif i == 2:  # bottom-left
                x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
                x1b, y1b = w - (x2a - x1a), 0
                x2b, y2b = w, min(y2a - y1a, h)
            else:  # bottom-right
                x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
            img4[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            padw, padh = x1a - x1b, y1a - y1b
            lb = self.labels[idx].copy()
            if len(lb):
                # normalized xywh -> mosaic-canvas xyxy
                xy = lb[:, 1:5].copy()
                lb[:, 1] = w * (xy[:, 0] - xy[:, 2] / 2) + padw
                lb[:, 2] = h * (xy[:, 1] - xy[:, 3] / 2) + padh
                lb[:, 3] = w * (xy[:, 0] + xy[:, 2] / 2) + padw
                lb[:, 4] = h * (xy[:, 1] + xy[:, 3] / 2) + padh
            labels4.append(lb)
        labels4 = np.concatenate(labels4, 0) if labels4 else np.zeros((0, 5))
        labels4[:, 1:] = labels4[:, 1:].clip(0, 2 * s)

        hyp = self.hyp
        img4, labels4 = random_perspective(
            img4,
            labels4,
            degrees=hyp.get("degrees", 0.0),
            translate=hyp.get("translate", 0.1),
            scale=hyp.get("scale", 0.5),
            shear=hyp.get("shear", 0.0),
            perspective=hyp.get("perspective", 0.0),
            border=self.mosaic_border,
            rng=rng,
        )
        return img4, labels4

    def __getitem__(self, index: int):
        """Returns (image float32 [H,W,3] 0-1, labels [max_labels,5], mask)."""
        hyp = self.hyp
        rng = random.Random((os.getpid() << 20) ^ random.randrange(1 << 30) ^ index)
        use_mosaic = self.augment and rng.random() < hyp.get("mosaic", 1.0)

        if use_mosaic:
            img, labels_xyxy = self.load_mosaic(index, rng)
            if rng.random() < hyp.get("mixup", 0.0):
                img2, labels2 = self.load_mosaic(
                    int(rng.choice(self.indices)), rng
                )
                img, labels_xyxy = mixup(img, labels_xyxy, img2, labels2, rng)
            h = w = img.shape[0]
            labels = labels_xyxy.copy()
            if len(labels):
                labels[:, 1] = ((labels_xyxy[:, 1] + labels_xyxy[:, 3]) / 2) / w
                labels[:, 2] = ((labels_xyxy[:, 2] + labels_xyxy[:, 4]) / 2) / h
                labels[:, 3] = (labels_xyxy[:, 3] - labels_xyxy[:, 1]) / w
                labels[:, 4] = (labels_xyxy[:, 4] - labels_xyxy[:, 2]) / h
        else:
            img, (h0, w0), (h, w) = self.load_image(index)
            shape = (
                tuple(self.batch_shape[index]) if self.rect else self.img_size
            )
            img, ratio, pad = letterbox(
                img, shape, auto=False, scaleup=self.augment
            )
            labels = self.labels[index].copy()
            if len(labels):
                # renormalize to the letterboxed canvas
                nh, nw = img.shape[:2]
                labels[:, 1] = (labels[:, 1] * w * ratio[0] + pad[0]) / nw
                labels[:, 2] = (labels[:, 2] * h * ratio[1] + pad[1]) / nh
                labels[:, 3] = labels[:, 3] * w * ratio[0] / nw
                labels[:, 4] = labels[:, 4] * h * ratio[1] / nh

        if self.augment:
            # optional albumentations pipeline (identity when the package
            # is absent — reference utils/augmentations.py:16, applied in
            # __getitem__ before HSV, utils/datasets.py:607)
            img, labels = self.albumentations(img, labels, rng=rng)
            img = augment_hsv(
                img,
                hyp.get("hsv_h", 0.015),
                hyp.get("hsv_s", 0.7),
                hyp.get("hsv_v", 0.4),
                rng=rng,
            )
            if rng.random() < hyp.get("flipud", 0.0):
                img, labels = flip_ud(img, labels)
            if rng.random() < hyp.get("fliplr", 0.5):
                img, labels = flip_lr(img, labels)

        out_l = np.zeros((self.max_labels, 5), np.float32)
        mask = np.zeros((self.max_labels,), bool)
        n = min(len(labels), self.max_labels)
        if n:
            out_l[:n] = labels[:n]
            mask[:n] = True
        if self.uint8_out:
            # ship uint8 and divide ON the device (the trainer/val jits
            # convert uint8 -> fp32/255, <=1 ulp vs the host divide): 4x
            # less host->device transfer, which matters when the device
            # link is the bottleneck.  The reference does the same —
            # uint8 collate + .float()/255 on GPU (train.py:536).
            return np.ascontiguousarray(img), out_l, mask
        return img.astype(np.float32) / 255.0, out_l, mask

    # -- batching -------------------------------------------------------------

    def _batch_plan(self, batch_size: int, shuffle: bool, seed: int,
                    drop_last: bool) -> List[np.ndarray]:
        """The ordered list of per-batch index groups (rect buckets kept
        contiguous so each bucket shape compiles once)."""
        order = np.array(self.indices)  # image_weights may resample these
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        if self.rect:
            groups = [
                order[self._bucket_of[order] == b]
                for b in np.unique(self._bucket_of)
            ]
        else:
            groups = [order]
        plan: List[np.ndarray] = []
        for grp in groups:
            n = len(grp)
            if n == 0:
                continue
            end = n - (n % batch_size) if drop_last else n
            if end == 0:
                end = n
            plan += [grp[i : i + batch_size] for i in range(0, end, batch_size)]
        return plan

    def _collate(self, idxs, items, batch_size: int, drop_last: bool,
                 yield_count: bool, yield_idx: bool):
        ims, lbs, ms = zip(*items)
        ims = np.stack(ims)
        if len(idxs) < batch_size and not drop_last:
            padn = batch_size - len(idxs)
            ims = np.concatenate(
                [ims, np.zeros((padn,) + ims.shape[1:], ims.dtype)]
            )
            lbs = list(lbs) + [np.zeros_like(lbs[0])] * padn
            ms = list(ms) + [np.zeros_like(ms[0])] * padn
        if yield_idx:
            return (ims, np.stack(lbs), np.stack(ms), len(idxs),
                    [int(j) for j in idxs])
        if yield_count:
            return ims, np.stack(lbs), np.stack(ms), len(idxs)
        return ims, np.stack(lbs), np.stack(ms)

    @staticmethod
    def _quadify(ims, lbs, ms):
        """Quad collate (reference ``--quad``, utils/datasets.py:659
        collate_fn4): every 4 samples tile into one 2x-canvas image — 1/4
        the batch at 2x resolution for the same pixel throughput.  Labels
        shift/halve into their quadrant.  NOTE: the reference randomly
        replaces some tiles with one bilinear-2x-upscaled image; tiling
        here is deterministic (the upscale branch is an augmentation
        heuristic, not a format requirement)."""
        b, h, w, c = ims.shape
        q = ims.reshape(b // 4, 2, 2, h, w, c)
        q = q.transpose(0, 1, 3, 2, 4, 5).reshape(b // 4, 2 * h, 2 * w, c)
        lbs = lbs.reshape(b // 4, 4, *lbs.shape[1:]).copy()
        col = np.array([0, 1, 0, 1], np.float32)[None, :, None]
        row = np.array([0, 0, 1, 1], np.float32)[None, :, None]
        lbs[..., 1] = (lbs[..., 1] + col) / 2
        lbs[..., 2] = (lbs[..., 2] + row) / 2
        lbs[..., 3:5] /= 2
        return (q, lbs.reshape(b // 4, -1, 5),
                ms.reshape(b // 4, -1))

    def batches(self, batch_size: int, shuffle: bool = False, seed: int = 0,
                drop_last: bool = True, yield_count: bool = False,
                yield_idx: bool = False, workers: int = 0, prefetch: int = 2,
                host_shard=None, quad: bool = False):
        """Yield (images [B,H,W,3], labels [B,M,5], masks [B,M]) batches.
        In rect mode, batches group by aspect-ratio bucket so each bucket
        shape compiles once.  With ``yield_count`` each batch also carries
        the number of REAL (non-padded) rows, so eval loops can skip the
        zero-padded tail of the last partial batch.  With ``yield_idx`` it
        additionally carries the dataset indices of the real rows, so eval
        loops can fetch per-image ``meta`` (native shapes / COCO ids).

        ``workers > 0`` decodes+augments asynchronously on a thread pool and
        keeps ``prefetch`` assembled batches ahead of the consumer — the
        equivalent of the reference's multi-worker InfiniteDataLoader
        (utils/datasets.py:122-156), so the accelerator never waits on host
        image decode at eval throughput.

        ``host_shard=(rank, world)`` is the DistributedSampler equivalent
        (reference utils/datasets.py:95-156): every host computes the SAME
        seeded batch plan over the GLOBAL batch size, then decodes only its
        contiguous 1/world slice of each batch — the caller reassembles the
        global array via ``parallel.multihost.to_global``."""
        if quad:
            # train-time collate only: no eval metadata, full batches
            if yield_count or yield_idx:
                raise ValueError("quad collate carries no eval metadata")
            if batch_size % 4:
                raise ValueError(f"quad needs batch % 4 == 0, got {batch_size}")
            for ims, lbs, ms in self.batches(
                batch_size, shuffle=shuffle, seed=seed, drop_last=True,
                workers=workers, prefetch=prefetch, host_shard=host_shard,
            ):
                yield self._quadify(ims, lbs, ms)
            return
        plan = self._batch_plan(batch_size, shuffle, seed, drop_last)
        if host_shard is not None:
            rank, world = host_shard
            if batch_size % world:
                raise ValueError(
                    f"global batch {batch_size} not divisible by {world} hosts"
                )
            per = batch_size // world
            plan = [idxs[rank * per : (rank + 1) * per] for idxs in plan
                    if len(idxs) == batch_size]  # full batches only
            batch_size = per
        if workers <= 0:
            for idxs in plan:
                yield self._collate(
                    idxs, [self[int(j)] for j in idxs],
                    batch_size, drop_last, yield_count, yield_idx,
                )
            return

        import queue
        import threading
        from concurrent.futures import ThreadPoolExecutor

        q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 1))
        stop = threading.Event()

        def _produce():
            try:
                with ThreadPoolExecutor(max_workers=workers) as ex:
                    from collections import deque

                    inflight = deque()
                    it = iter(plan)

                    def _submit():
                        idxs = next(it, None)
                        if idxs is not None:
                            inflight.append(
                                (idxs,
                                 [ex.submit(self.__getitem__, int(j))
                                  for j in idxs])
                            )

                    for _ in range(max(prefetch, 1) + 1):
                        _submit()
                    while inflight and not stop.is_set():
                        idxs, futs = inflight.popleft()
                        batch = self._collate(
                            idxs, [f.result() for f in futs],
                            batch_size, drop_last, yield_count, yield_idx,
                        )
                        while not stop.is_set():
                            try:
                                q.put(batch, timeout=0.5)
                                break
                            except queue.Full:
                                continue
                        _submit()
            except BaseException as e:  # surfaced to the consumer
                if not stop.is_set():
                    q.put(("__batches_error__", e))
                return
            if not stop.is_set():
                q.put(None)

        thread = threading.Thread(target=_produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if (isinstance(item, tuple) and len(item) == 2
                        and item[0] == "__batches_error__"):
                    raise item[1]
                yield item
        finally:
            stop.set()


def load_segment_label_file(path: str):
    """Read one YOLO-seg txt -> (labels [n,5], segments list of [k,2]).

    Reference utils/segment/dataloaders.py: rows are
    ``cls x1 y1 x2 y2 ...`` (normalized polygon, >=3 points); the box is the
    polygon's extent."""
    if not os.path.isfile(path):
        return np.zeros((0, 5), np.float32), []
    labels, segments = [], []
    with open(path) as fh:
        for line in fh.read().strip().splitlines():
            parts = line.split()
            if len(parts) < 7:  # cls + 3 points minimum
                continue
            cls = float(parts[0])
            pts = np.array(parts[1:], np.float32).reshape(-1, 2)
            x1, y1 = pts.min(0)
            x2, y2 = pts.max(0)
            labels.append([cls, (x1 + x2) / 2, (y1 + y2) / 2,
                           x2 - x1, y2 - y1])
            segments.append(pts)
    if not labels:
        return np.zeros((0, 5), np.float32), []
    return np.array(labels, np.float32), segments


class SegmentDataset(Dataset):
    """Detection dataset + per-instance masks for Segment/Panoptic training
    (reference utils/segment/dataloaders.py).  Masks are rasterized from the
    label polygons at 1/``mask_ratio`` of the letterbox canvas — the proto
    resolution (reference downsample_ratio=4).  Mosaic is disabled (polygon
    mosaic is out of scope); letterbox/flip/HSV still apply."""

    def __init__(self, *args, mask_ratio: int = 4, include_masks: bool = True,
                 semantic: bool = False, **kw):
        kw.setdefault("hyp", {})
        super().__init__(*args, **kw)
        self.mask_ratio = mask_ratio
        # include_masks=False parses polygon labels but yields plain
        # detection batches (for the val loop, which is detection-metric)
        self.include_masks = include_masks
        # semantic=True (Panoptic training) adds an int class-id map at mask
        # resolution: thing polygons drawn with their class id, plus optional
        # stuff polygons from sibling stuff/xxx.txt files (reference
        # utils/panoptic/dataloaders.py:85-88,292-297 — there the GT is
        # per-class binary channels; the id map one-hots to the same thing
        # in-graph, see nn/segment.semantic_loss).  Background = -1.
        self.semantic = semantic and include_masks
        # geometric augmentations are disabled: boxes and polygons must see
        # the same transform, and the polygon variants (reference
        # utils/segment/augmentations.py) are out of scope this round —
        # HSV/color augmentation still applies
        self.hyp["mosaic"] = 0.0
        self.hyp["mixup"] = 0.0
        self.hyp["fliplr"] = 0.0
        self.hyp["flipud"] = 0.0

    def _load_labels(self, cache_dir):
        self.segments = []
        labels = []
        for p in self.label_files:
            lb, segs = load_segment_label_file(p)
            labels.append(lb)
            self.segments.append(segs)
        if self.single_cls:
            for lb in labels:
                if len(lb):
                    lb[:, 0] = 0
        return labels

    def __getitem__(self, index: int):
        from PIL import ImageDraw

        if not self.include_masks:
            return super().__getitem__(index)
        img, labels, valid = super().__getitem__(index)
        h, w = img.shape[:2]
        mh, mw = h // self.mask_ratio, w // self.mask_ratio
        masks = np.zeros((self.max_labels, mh, mw), np.float32)
        # the letterbox transform applied to boxes in the parent __getitem__
        # maps normalized native coords -> normalized canvas coords; recover
        # it per-polygon from the meta (augment=False path) or re-derive
        meta = self.meta(index)
        (gy, gx), (pw, ph) = meta["ratio_pad"]
        h0, w0 = meta["native_hw"]
        n = min(len(self.segments[index]), self.max_labels)
        for i in range(n):
            pts = self.segments[index][i]
            px = pts[:, 0] * w0 * gx + pw
            py = pts[:, 1] * h0 * gy + ph
            im = Image.new("F", (mw, mh), 0.0)
            ImageDraw.Draw(im).polygon(
                [(x / self.mask_ratio, y / self.mask_ratio)
                 for x, y in zip(px, py)],
                fill=1.0,
            )
            masks[i] = np.asarray(im)
        if not self.semantic:
            return img, labels, valid, masks
        # semantic class-id map: stuff polygons first (things overwrite —
        # instance detail wins where they overlap), background -1
        sem = Image.new("I", (mw, mh), -1)
        draw = ImageDraw.Draw(sem)

        def draw_poly(pts, cls_id):
            px = pts[:, 0] * w0 * gx + pw
            py = pts[:, 1] * h0 * gy + ph
            draw.polygon(
                [(x / self.mask_ratio, y / self.mask_ratio)
                 for x, y in zip(px, py)],
                fill=int(cls_id),
            )

        stuff_lb, stuff_segs = load_segment_label_file(
            img2stuff_path(self.img_files[index])
        )
        for lb_row, pts in zip(stuff_lb, stuff_segs):
            draw_poly(pts, lb_row[0])
        raw = self.labels[index]
        for i in range(min(len(self.segments[index]), len(raw))):
            draw_poly(self.segments[index][i], raw[i, 0])
        return img, labels, valid, masks, np.asarray(sem, np.int32)

    def _collate(self, idxs, items, batch_size, drop_last,
                 yield_count, yield_idx):
        if not self.include_masks:
            return super()._collate(idxs, items, batch_size, drop_last,
                                    yield_count, yield_idx)
        cols = list(zip(*items))
        ims, lbs, ms = cols[:3]
        base = super()._collate(
            idxs, list(zip(ims, lbs, ms)), batch_size, drop_last,
            yield_count, yield_idx,
        )
        extra = []
        for col in cols[3:]:  # instance masks (+ semantic map if enabled)
            arr = np.stack(col)
            if len(idxs) < batch_size and not drop_last:
                padn = batch_size - len(idxs)
                fill = -1 if np.issubdtype(arr.dtype, np.integer) else 0
                arr = np.concatenate(
                    [arr, np.full((padn,) + arr.shape[1:], fill, arr.dtype)]
                )
            extra.append(arr)
        return (*base, *extra)
