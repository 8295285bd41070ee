"""Experiment directories, dual loggers and tensor diagnostics
(/root/reference/utils/utils.py:7-87 parity, without the hard-coded
checkpoint path at utils/utils.py:14)."""

from __future__ import annotations

import logging
import sys
from pathlib import Path

import numpy as np


def setup_experiment_directories(save_dir, experiment_name: str) -> dict:
    """results/<name>/{checkpoints,logs,graphs,poses} tree."""
    base = Path(save_dir) / experiment_name
    dirs = {
        k: base / k for k in ("checkpoints", "logs", "graphs", "poses")
    }
    for d in dirs.values():
        d.mkdir(parents=True, exist_ok=True)
    dirs["base"] = base
    return dirs


def setup_logger(name: str, log_dir, level=logging.INFO,
                 console: bool = True) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if logger.handlers:
        return logger
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    fh = logging.FileHandler(str(Path(log_dir) / f"{name}.log"))
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    if console:
        ch = logging.StreamHandler(sys.stdout)
        ch.setFormatter(fmt)
        logger.addHandler(ch)
    return logger


def log_tensor_stats(x, name: str, logger: logging.Logger) -> None:
    """NaN/Inf and distribution diagnostics (utils/utils.py:75-87)."""
    x = np.asarray(x)
    logger.debug(
        "%s: shape=%s dtype=%s min=%g max=%g mean=%g std=%g nan=%s inf=%s",
        name, x.shape, x.dtype, x.min(), x.max(),
        float(x.mean()), float(x.std()),
        bool(np.isnan(x).any()), bool(np.isinf(x).any()),
    )
