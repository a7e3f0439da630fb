"""Inference input loaders.

Equivalent of the reference ``LoadImages`` (utils/datasets.py:159-283):
iterate files/globs/dirs of images (and videos when imageio is available),
yielding letterboxed NHWC tensors + originals for coordinate mapping.
Webcam/RTSP streams (reference ``LoadStreams``) are a later milestone —
documented in the parity matrix.
"""

from __future__ import annotations

import glob
import os
from pathlib import Path
from typing import Iterator, Tuple

import numpy as np
from PIL import Image

from .augment import letterbox
from .dataset import IMG_FORMATS


VID_FORMATS = {"mp4", "avi", "mov", "mkv", "gif", "webm"}


class LoadVideo:
    """Video-file frame iterator via imageio (reference LoadImages' video
    branch, utils/datasets.py:226-270)."""

    def __init__(self, path, img_size: int = 640, stride: int = 32,
                 vid_stride: int = 1):
        import imageio.v3 as iio

        self.path = str(path)
        self._iio = iio
        self.img_size = img_size
        self.stride = stride
        self.vid_stride = vid_stride

    def __iter__(self):
        for i, frame in enumerate(self._iio.imiter(self.path)):
            if i % self.vid_stride:
                continue
            im0 = np.asarray(frame)[..., :3]
            im, _, _ = letterbox(im0, self.img_size, stride=self.stride,
                                 auto=False)
            yield f"{self.path}#{i}", (im.astype(np.float32) / 255.0)[None], im0


class LoadStreams:
    """Threaded multi-source stream reader (reference LoadStreams,
    utils/datasets.py:283-368): one daemon reader thread per source keeps
    the latest frame; iteration yields synchronized batches.

    Sources are URLs / camera indices / video files readable by imageio.
    """

    def __init__(self, sources, img_size: int = 640, stride: int = 32):
        import threading
        import imageio.v3 as iio

        if isinstance(sources, str):
            p = Path(sources)
            sources = (
                p.read_text().strip().splitlines() if p.is_file() and
                p.suffix == ".txt" else [sources]
            )
        self.sources = list(sources)
        self.img_size = img_size
        self.stride = stride
        self.frames = [None] * len(self.sources)
        self.running = True
        self.threads = []
        for i, src in enumerate(self.sources):
            def reader(i=i, src=src):
                try:
                    for frame in iio.imiter(src):
                        if not self.running:
                            return
                        self.frames[i] = np.asarray(frame)[..., :3]
                except Exception as e:
                    from ..utils.general import LOGGER

                    LOGGER.info(f"stream {src} ended: {e}")

            t = threading.Thread(target=reader, daemon=True)
            t.start()
            self.threads.append(t)

    def __iter__(self):
        import time as _time

        while self.running:
            alive = any(t.is_alive() for t in self.threads)
            if any(f is None for f in self.frames):
                if not alive:
                    return  # a source ended before producing any frame
                _time.sleep(0.01)
                continue
            ims0 = [f.copy() for f in self.frames]
            ims = np.stack(
                [
                    letterbox(f, self.img_size, stride=self.stride, auto=False)[0]
                    for f in ims0
                ]
            ).astype(np.float32) / 255.0
            yield self.sources, ims, ims0
            if not alive:
                # finite sources (video files / HTTP clips): the readers
                # have drained — the last frame was delivered exactly once
                # (live webcam/RTSP readers stay alive and loop forever)
                return

    def close(self):
        self.running = False


class ClassificationDataset:
    """ImageFolder-style classification dataset (reference
    utils/dataloaders.py:1159): root/<class_name>/*.jpg."""

    def __init__(self, root, img_size: int = 224):
        root = Path(root)
        self.classes = sorted(d.name for d in root.iterdir() if d.is_dir())
        self.samples = [
            (str(f), ci)
            for ci, cname in enumerate(self.classes)
            for f in sorted((root / cname).glob("*.*"))
            if f.suffix[1:].lower() in IMG_FORMATS
        ]
        assert self.samples, f"no classified images under {root}"
        self.img_size = img_size

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        path, ci = self.samples[i]
        im = Image.open(path).convert("RGB").resize(
            (self.img_size, self.img_size), Image.BILINEAR
        )
        return np.asarray(im).astype(np.float32) / 255.0, ci

    def batches(self, batch_size: int, shuffle: bool = False, seed: int = 0):
        order = np.arange(len(self))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        for i in range(0, len(self) - batch_size + 1, batch_size):
            idx = order[i : i + batch_size]
            ims, cls = zip(*(self[int(j)] for j in idx))
            yield np.stack(ims), np.array(cls)


class LoadImages:
    """File/dir/glob image iterator with letterbox preprocessing."""

    def __init__(self, path, img_size: int = 640, stride: int = 32, auto: bool = False):
        p = str(Path(path).resolve())
        if "*" in p:
            files = sorted(glob.glob(p, recursive=True))
        elif os.path.isdir(p):
            files = sorted(glob.glob(os.path.join(p, "*.*")))
        elif os.path.isfile(p):
            files = [p]
        else:
            raise FileNotFoundError(f"{p} does not exist")
        self.files = [
            f for f in files if f.rsplit(".", 1)[-1].lower() in IMG_FORMATS
        ]
        assert self.files, f"no images found in {path}"
        self.img_size = img_size
        self.stride = stride
        self.auto = auto

    def __len__(self):
        return len(self.files)

    def __iter__(self) -> Iterator[Tuple[str, np.ndarray, np.ndarray]]:
        for path in self.files:
            im0 = np.asarray(Image.open(path).convert("RGB"))
            im, _, _ = letterbox(
                im0, self.img_size, stride=self.stride, auto=self.auto
            )
            im = im.astype(np.float32) / 255.0
            yield path, im[None], im0  # [1,H,W,3], original


class LoadScreenshots:
    """Screen-capture source (reference utils/dataloaders.py:188
    ``LoadScreenshots``): ``screen [left top width height]`` sources, one
    letterboxed frame per iteration via ``mss``.  mss is not installed in
    this image, so construction raises with the same install hint the
    reference's check_requirements would — the source-string parsing and
    frame path stay importable/testable."""

    @staticmethod
    def parse_source(source: str):
        """'screen 0 100 200 512 256' -> (screen, left, top, w, h)."""
        parts = str(source).split()[1:]  # drop the 'screen' keyword
        screen, left, top, width, height = 0, None, None, None, None
        if len(parts) == 1:
            screen = int(parts[0])
        elif len(parts) == 4:
            left, top, width, height = (int(x) for x in parts)
        elif len(parts) == 5:
            screen, left, top, width, height = (int(x) for x in parts)
        return screen, left, top, width, height

    def __init__(self, source: str, img_size: int = 640, stride: int = 32,
                 auto: bool = False):
        try:
            import mss  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "LoadScreenshots requires `pip install mss` (not available "
                "in this image)"
            ) from e
        self.screen, left, top, width, height = self.parse_source(source)
        self.img_size, self.stride, self.auto = img_size, stride, auto
        self.sct = mss.mss()
        mon = self.sct.monitors[self.screen]
        self.monitor = {
            "left": mon["left"] if left is None else mon["left"] + left,
            "top": mon["top"] if top is None else mon["top"] + top,
            "width": width or mon["width"],
            "height": height or mon["height"],
        }
        self.frame = 0

    def __iter__(self):
        return self

    def __next__(self):
        im0 = np.asarray(self.sct.grab(self.monitor))[:, :, :3][:, :, ::-1]
        im, _, _ = letterbox(
            np.ascontiguousarray(im0), self.img_size, stride=self.stride,
            auto=self.auto,
        )
        im = im.astype(np.float32) / 255.0
        self.frame += 1
        return f"screen{self.screen}_{self.frame}", im[None], im0
