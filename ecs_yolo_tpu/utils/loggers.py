"""Experiment loggers: CSV + TensorBoard + (gated) W&B/ClearML/Comet.

Equivalent of reference utils/loggers/ + utils/loggerss/: a ``Loggers``
fan-out registered on the Callbacks bus, emitting the same 13 fixed keys
(utils/loggers/__init__.py:47-50).  W&B / ClearML / Comet are optional
backends gated on import (absent in this image); TensorBoard comes from
torch.utils.tensorboard (torch-cpu is baked in).
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Dict, List, Optional

from .general import LOGGER

LOG_KEYS = [
    "train/box_loss", "train/obj_loss", "train/cls_loss",
    "metrics/precision", "metrics/recall",
    "metrics/mAP_0.5", "metrics/mAP_0.5:0.95",
    "val/box_loss", "val/obj_loss", "val/cls_loss",
    "x/lr0", "x/lr1", "x/lr2",
]


class Loggers:
    def __init__(self, save_dir, include=("csv", "tb")):
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.csv_path = self.save_dir / "results.csv"
        self.tb = None
        self.wandb = None

        if "tb" in include:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(str(self.save_dir))
            except Exception as e:  # tb optional
                LOGGER.info(f"TensorBoard unavailable: {e}")
        if "wandb" in include:
            try:
                import wandb

                self.wandb = wandb.init(
                    project="ecs_yolo_tpu", dir=str(self.save_dir)
                )
            except Exception:
                LOGGER.info("W&B not installed; skipping")
        # ClearML / Comet fan-outs (reference utils/loggerss/clearml/,
        # comet/): gated on the packages, same scalar stream as CSV/TB/W&B
        self.clearml = None
        self.comet = None
        if "clearml" in include:
            try:
                from clearml import Task

                self.clearml = Task.init(
                    project_name="ecs_yolo_tpu",
                    task_name=self.save_dir.name,
                    output_uri=False,
                )
            except Exception:
                LOGGER.info("ClearML not installed; skipping")
        if "comet" in include:
            try:
                import comet_ml

                self.comet = comet_ml.Experiment(project_name="ecs_yolo_tpu")
            except Exception:
                LOGGER.info("Comet not installed; skipping")

    def log_metrics(self, metrics: Dict[str, float], step: int):
        """Fan out one scalar dict (on_fit_epoch_end)."""
        write_header = not self.csv_path.exists()
        keys = sorted(metrics)
        with open(self.csv_path, "a", newline="") as fh:
            w = csv.writer(fh)
            if write_header:
                w.writerow(["step", *keys])
            w.writerow([step, *(metrics[k] for k in keys)])
        if self.tb:
            for k, v in metrics.items():
                self.tb.add_scalar(k, v, step)
        if self.wandb:
            self.wandb.log(metrics, step=step)
        if self.clearml:
            for k, v in metrics.items():
                title, _, series = k.partition("/")
                self.clearml.get_logger().report_scalar(
                    title, series or title, float(v), step
                )
        if self.comet:
            self.comet.log_metrics(metrics, step=step)

    def log_image(self, name: str, image, step: int = 0):
        if self.tb is not None:
            import numpy as np

            arr = np.asarray(image)
            if arr.ndim == 3 and arr.shape[-1] in (1, 3):
                arr = arr.transpose(2, 0, 1)
            self.tb.add_image(name, arr, step)

    def close(self):
        if self.tb:
            self.tb.close()
        if self.wandb:
            self.wandb.finish()
        if self.clearml:
            self.clearml.close()
        if self.comet:
            self.comet.end()
