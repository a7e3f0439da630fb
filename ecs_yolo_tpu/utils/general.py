"""General utilities: logging, run dirs, early stopping, callbacks, timers.

Covers the reference's utils/general.py odds-and-ends that the framework
needs (LOGGER:62, increment_path, Profile:65, init_seeds:128) plus
EarlyStopping (utils/torch_utils.py:263) and the Callbacks hook bus
(utils/callbacks.py:13-35).
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Callable, Dict, List, Optional

LOGGER = logging.getLogger("ecs_yolo_tpu")
if not LOGGER.handlers:
    h = logging.StreamHandler()
    h.setFormatter(logging.Formatter("%(message)s"))
    LOGGER.addHandler(h)
    LOGGER.setLevel(logging.INFO)
    LOGGER.propagate = False  # avoid double lines when root has a handler


def select_device(device: str = ""):
    """Pin the JAX platform for a CLI run (reference
    utils/torch_utils.py:110 ``select_device`` --device flag).

    Must run before any jax device use.  Empty string keeps the ambient
    platform (here: the TPU).  ``cpu`` routes small/dev runs off the chip —
    this container forces ``JAX_PLATFORMS`` at interpreter start, so a late
    env var cannot; only this config update can.
    """
    import jax

    if device:
        jax.config.update("jax_platforms", device)
    devs = jax.devices()
    LOGGER.info(
        f"devices: {len(devs)}x {devs[0].platform}"
    )
    return devs


def increment_path(path, exist_ok: bool = False, sep: str = "", mkdir: bool = False):
    """runs/exp -> runs/exp2, exp3, ... (reference utils/general.py)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        suffix = path.suffix
        stem = path.with_suffix("")
        for n in range(2, 9999):
            p = Path(f"{stem}{sep}{n}{suffix}")
            if not p.exists():
                path = p
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


class Profile:
    """Accumulating timer usable as context manager (reference
    utils/general.py:65; v2 uses it for the val speed breakdown)."""

    def __init__(self):
        self.t = 0.0

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.dt = time.perf_counter() - self._start
        self.t += self.dt


class EarlyStopping:
    """Stop after `patience` epochs without fitness improvement
    (reference utils/torch_utils.py:263)."""

    def __init__(self, patience: int = 100):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch: int, fitness: float) -> bool:
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        stop = (epoch - self.best_epoch) >= self.patience
        if stop:
            LOGGER.info(
                f"EarlyStopping: no improvement in last {self.patience} epochs "
                f"(best epoch {self.best_epoch}). Stopping."
            )
        return stop


_HOOK_NAMES = [
    "on_pretrain_routine_start", "on_pretrain_routine_end",
    "on_train_start", "on_train_epoch_start", "on_train_batch_start",
    "optimizer_step", "on_before_zero_grad", "on_train_batch_end",
    "on_train_epoch_end", "on_val_start", "on_val_batch_start",
    "on_val_image_end", "on_val_batch_end", "on_val_end",
    "on_fit_epoch_end", "on_model_save", "on_train_end",
    "on_params_update", "teardown",
]


class Callbacks:
    """Named hook bus (reference utils/callbacks.py:13-35, 18 hooks)."""

    def __init__(self):
        self._callbacks: Dict[str, List[Callable]] = {k: [] for k in _HOOK_NAMES}

    def register_action(self, hook: str, name: str = "", callback=None):
        assert hook in self._callbacks, f"unknown hook {hook}"
        assert callable(callback)
        self._callbacks[hook].append(callback)

    def get_registered_actions(self, hook: Optional[str] = None):
        return self._callbacks[hook] if hook else self._callbacks

    def run(self, hook: str, *args, **kwargs):
        for cb in self._callbacks.get(hook, []):
            cb(*args, **kwargs)


class Timeout:
    """Timeout context manager (reference utils/general.py:74) via SIGALRM;
    no-op on platforms without it."""

    def __init__(self, seconds: float, timeout_msg: str = "", suppress: bool = True):
        self.seconds = int(seconds)
        self.msg = timeout_msg
        self.suppress = suppress

    def _handler(self, signum, frame):
        raise TimeoutError(self.msg)

    def __enter__(self):
        import signal

        try:
            signal.signal(signal.SIGALRM, self._handler)
            signal.alarm(self.seconds)
        except (ValueError, AttributeError):
            pass
        return self

    def __exit__(self, exc_type, exc, tb):
        import signal

        try:
            signal.alarm(0)
        except (ValueError, AttributeError):
            pass
        return self.suppress and exc_type is TimeoutError


def check_img_size(imgsz: int, stride: int = 32, floor: int = 0) -> int:
    """Round image size to a stride multiple (reference check_img_size)."""
    new = max(int(round(imgsz / stride) * stride), floor or stride)
    if new != imgsz:
        LOGGER.info(f"img size {imgsz} adjusted to {new} (stride {stride})")
    return new


def check_dataset(data: dict) -> dict:
    """Validate a dataset yaml dict (reference check_dataset, minus the
    download step — this image has no egress)."""
    from pathlib import Path as _P

    for k in ("nc", "train"):
        assert k in data, f"dataset yaml missing key {k!r}"
    names = data.get("names")
    if names is not None:
        assert len(names) == data["nc"], (
            f"names ({len(names)}) != nc ({data['nc']})"
        )
    root = _P(data.get("path", "."))
    for split in ("train", "val"):
        if split in data and not (root / data[split]).exists():
            LOGGER.info(f"dataset split missing on disk: {root / data[split]}")
    return data


def colorstr(*args):
    """ANSI color helper (reference utils/general.py) — no-op safe."""
    *prefix, string = args if len(args) > 1 else ("bold", args[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m",
        "yellow": "\033[33m", "blue": "\033[34m", "magenta": "\033[35m",
        "cyan": "\033[36m", "white": "\033[37m", "bold": "\033[1m",
        "end": "\033[0m",
    }
    return "".join(colors.get(p, "") for p in prefix) + str(string) + colors["end"]
