"""Experiment logging: JSONL metrics stream + optional TensorBoard.

Replaces the reference's CustomSummaryWritter (trainer/utils.py:72-144).
JSONL is always written (machine-readable, zero deps); TensorBoard via
tensorboardX when available; wandb intentionally not bundled (no egress in
the target environment) but the interface accepts a future backend.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import time
from typing import Any, Dict, Optional

import numpy as np


class MetricsWriter:
    def __init__(self, exp_dir: str, config: Optional[Dict[str, Any]] = None,
                 backend: str = "tensorboard", project: str = "",
                 name: str = ""):
        self.log_dir = osp.join(exp_dir, "logs")
        os.makedirs(self.log_dir, exist_ok=True)
        self._jsonl = open(osp.join(self.log_dir, "metrics.jsonl"), "a")
        self._tb = None
        self._wandb = None
        if backend == "wandb":
            # Optional backend, matching the reference writer's selection
            # (trainer/utils.py:85-91); gated because wandb needs egress.
            try:
                import wandb
                wandb.init(project=project or "endosurf_tpu", name=name,
                           config=config, dir=self.log_dir)
                self._wandb = wandb
            except Exception:
                backend = "tensorboard"
        if backend == "tensorboard":
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(self.log_dir)
                if config is not None:
                    self._tb.add_text("config", json.dumps(config, indent=2,
                                                           default=str), 0)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value, step: int) -> None:
        v = float(np.asarray(value))
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": v, "step": step, "t": time.time()}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, v, step)
        if self._wandb is not None:
            self._wandb.log({tag: v}, step=step)

    def add_scalars(self, prefix: str, metrics: Dict[str, Any],
                    step: int) -> None:
        for k, v in metrics.items():
            self.add_scalar(f"{prefix}/{k}", v, step)

    def add_image(self, tag: str, img: np.ndarray, step: int) -> None:
        if self._tb is not None:
            self._tb.add_image(tag, img, step, dataformats="HWC")
        if self._wandb is not None:
            self._wandb.log({tag: self._wandb.Image(img)}, step=step)

    def add_video(self, tag: str, video: np.ndarray, step: int,
                  fps: int = 10) -> None:
        """video: [t, h, w, 3] uint8 (reference writer, trainer/utils.py:113)."""
        if self._tb is not None:
            self._tb.add_video(tag, video.transpose(0, 3, 1, 2)[None],
                               step, fps=fps)
        if self._wandb is not None:
            self._wandb.log(
                {tag: self._wandb.Video(video.transpose(0, 3, 1, 2),
                                        fps=fps, format="gif")}, step=step)

    def add_mesh(self, tag: str, vertices: np.ndarray, step: int,
                 colors: np.ndarray = None, faces: np.ndarray = None) -> None:
        """Mesh logging (reference writer, trainer/utils.py:129-135)."""
        if self._tb is not None:
            self._tb.add_mesh(tag, vertices[None],
                              colors=None if colors is None else colors[None],
                              faces=None if faces is None else faces[None],
                              global_step=step)

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
