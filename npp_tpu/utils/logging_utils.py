"""Run logging: per-run directories, file+console logger, metric stream.

Re-design of reference ``utils/utils.py:23-56`` (create_logger) and its
tensorboardX scalars (search_lip_sync.py:142-146): the output tree is
``output/<dataset>/<mode>/<cfg_name>/`` and ``log/...``; metrics stream to
a structured JSONL file (machine-readable; TensorBoard is optional and
used when the package is importable).
"""
from __future__ import annotations

import json
import logging
import os
import time
from pathlib import Path


def create_logger(cfg, cfg_name: str, phase: str = "train"):
    """Returns (logger, final_output_dir, tb_log_dir)."""
    root_output = Path(cfg.output_dir)
    dataset = cfg.dataset.dataset
    cfg_stem = os.path.basename(cfg_name).split(".")[0]
    final_output_dir = root_output / dataset / phase / cfg_stem
    final_output_dir.mkdir(parents=True, exist_ok=True)

    time_str = time.strftime("%Y-%m-%d-%H-%M")
    log_file = final_output_dir / f"{cfg_stem}_{time_str}_{phase}.log"
    logger = logging.getLogger(f"npp_tpu.{phase}")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fh = logging.FileHandler(log_file)
    fh.setFormatter(logging.Formatter("%(asctime)-15s %(message)s"))
    logger.addHandler(fh)
    ch = logging.StreamHandler()
    ch.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(ch)

    tb_log_dir = Path(cfg.log_dir) / dataset / phase / cfg_stem / time_str
    tb_log_dir.mkdir(parents=True, exist_ok=True)
    return logger, str(final_output_dir), str(tb_log_dir)


class MetricWriter:
    """JSONL scalar stream (+ optional TensorBoard)."""

    def __init__(self, log_dir: str):
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter  # optional

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._f.write(json.dumps({"tag": tag, "value": float(value),
                                  "step": int(step),
                                  "time": time.time()}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class AverageMeter:
    """Weighted running average (utils/utils.py:292-326)."""

    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        self.sum += val * n
        self.count += n

    def average(self) -> float:
        return self.sum / self.count if self.count else 0.0
