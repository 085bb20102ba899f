"""Logging, meters and small utilities
(re-design of /root/reference/utils/logger.py, utils/__init__.py)."""

from __future__ import annotations

import logging
import os
import random
import sys
import time
from collections import deque
from typing import Optional

import numpy as np


def mkdir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def init_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def setup_logger(
    name: str,
    save_dir: Optional[str] = None,
    filename: str = "log",
    level: int = logging.INFO,
    screen: bool = True,
    to_file: bool = True,
) -> logging.Logger:
    """Timestamped file + stream logger (utils/logger.py:115-128)."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.handlers.clear()
    logger.propagate = False
    fmt = logging.Formatter(
        "%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s", datefmt="%y-%m-%d %H:%M:%S"
    )
    if to_file and save_dir is not None:
        mkdir(save_dir)
        stamp = time.strftime("%y%m%d-%H%M%S")
        fh = logging.FileHandler(os.path.join(save_dir, f"{filename}_{stamp}.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    if screen:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    return logger


class AvgMeter:
    """Windowed running average (utils/logger.py:60-84)."""

    def __init__(self, window: int = 100):
        self.window = window
        self.reset()

    def reset(self):
        self._values = deque(maxlen=self.window if self.window > 0 else None)
        self.total = 0.0
        self.count = 0

    def update(self, value: float):
        self._values.append(float(value))
        self.total += float(value)
        self.count += 1

    @property
    def avg(self) -> float:
        if not self._values:
            return 0.0
        return sum(self._values) / len(self._values)

    @property
    def global_avg(self) -> float:
        return self.total / max(1, self.count)


class FrameSecondMeter:
    """FPS over whole-video inference spans (utils/logger.py:87-108).

    fps = total frames / total seconds, where each span covers one video's
    inference (device-synchronized by the caller — on JAX, by materializing
    outputs to host).
    """

    def __init__(self):
        self.st = None
        self.n_frames = 0
        self.n_seconds = 0.0
        self.fps = None

    def tic(self):
        self.st = time.perf_counter()

    def toc(self, n_frames: int):
        self.n_seconds += time.perf_counter() - self.st
        self.n_frames += n_frames

    def end(self):
        self.fps = self.n_frames / max(self.n_seconds, 1e-9)
        return self.fps


def pad_divide_by(shape, d: int = 16):
    """Padded size (next multiple of d) for (h, w) (utils/__init__.py:27-53)."""
    h, w = shape
    return ((h + d - 1) // d * d, (w + d - 1) // d * d)


def save_scripts(exp_dir: str, src_root: Optional[str] = None) -> str:
    """Snapshot the package source into the experiment directory for
    reproducibility (utils/__init__.py save_scripts equivalent)."""
    import shutil

    src_root = src_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = os.path.join(exp_dir, "scripts_snapshot")
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(
        src_root, dst,
        ignore=shutil.ignore_patterns("__pycache__", "*.pyc", "logs", ".git"),
    )
    return dst


def count_model_size(params) -> float:
    """Parameter count in millions (utils/__init__.py count_model_size)."""
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params)) / 1e6
