"""Metrics/event writer: JSONL + optional TensorBoard + console.

Re-design of nerfstudio/utils/writer.py:46-340 (event-buffer writer with
TensorBoard/wandb backends and a rich console): a buffered writer with
pluggable backends. TensorBoard via torch.utils.tensorboard when available
(wandb has no egress here and is stubbed to the JSONL log). Standard
events match the reference (writer.py:49-60): train/test rays/sec, ETA,
iteration times, GPU memory, eval images.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from pathlib import Path
from typing import Optional

import numpy as np

# standard event names (reference writer.py:49-60)
ITER_TRAIN_TIME = "Train Iter (time)"
TRAIN_RAYS_PER_SEC = "Train Rays / Sec"
TEST_RAYS_PER_SEC = "Test Rays / Sec"
ETA = "ETA (time)"
CURR_TEST_PSNR = "Eval PSNR"


class EventWriter:
    def __init__(
        self,
        log_dir: Path,
        use_tensorboard: bool = True,
        console_every: int = 50,
    ):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "events.jsonl", "a")
        self._console_every = console_every
        self._buffer: dict[int, dict] = defaultdict(dict)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(self.log_dir / "tb"))
            except Exception:
                self._tb = None

    def put_scalar(self, name: str, value, step: int):
        v = float(np.asarray(value))
        self._buffer[step][name] = v
        if self._tb is not None:
            self._tb.add_scalar(name, v, step)

    def put_dict(self, values: dict, step: int, prefix: str = ""):
        for k, v in values.items():
            arr = np.asarray(v)
            if arr.ndim == 0:
                self.put_scalar(prefix + k, arr, step)

    def put_image(self, name: str, image, step: int):
        arr = np.asarray(image)
        if self._tb is not None:
            self._tb.add_image(name, arr, step, dataformats="HWC")
        # always dump HDR-capable EXR artifact
        from . import exr

        out = self.log_dir / "images" / f"{name.replace('/', '_')}_{step:06d}.exr"
        out.parent.mkdir(parents=True, exist_ok=True)
        exr.write_exr(out, arr.astype(np.float32))

    def flush(self, step: Optional[int] = None):
        steps = [step] if step is not None else sorted(self._buffer)
        for s in steps:
            if s in self._buffer and self._buffer[s]:
                rec = {"step": s, "ts": time.time(), **self._buffer.pop(s)}
                self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def maybe_print(self, step: int, metrics: dict):
        if step % self._console_every == 0:
            parts = " ".join(
                f"{k}={float(np.asarray(v)):.4g}"
                for k, v in metrics.items()
                if np.asarray(v).ndim == 0
            )
            print(f"[{time.strftime('%H:%M:%S')}] step {step}: {parts}", flush=True)

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
