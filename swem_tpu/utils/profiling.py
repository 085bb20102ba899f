"""Profiling / memory observability
(TPU-native replacements for SURVEY.md §5: the reference has only wall-clock
meters and a CUDA-memory dump, utils/logger.py:131-136).
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf).

    Example:
        with profile_trace("/tmp/trace"):
            out = step(...)
            jax.block_until_ready(out)
    """
    with jax.profiler.trace(log_dir):
        yield


def device_memory_stats(device=None) -> Optional[dict]:
    """Per-device memory statistics (the print_mem equivalent)."""
    device = device or jax.devices()[0]
    try:
        return device.memory_stats()
    except Exception:
        return None


def log_memory(logger, device=None, prefix: str = "") -> None:
    stats = device_memory_stats(device)
    if not stats:
        logger.info(f"{prefix}memory stats unavailable on this backend")
        return
    used = stats.get("bytes_in_use", 0) / 2**20
    peak = stats.get("peak_bytes_in_use", 0) / 2**20
    limit = stats.get("bytes_limit", 0) / 2**20
    logger.info(f"{prefix}HBM: {used:.0f}MiB in use, peak {peak:.0f}MiB, "
                f"limit {limit:.0f}MiB")
