"""Profiling / memory observability
(TPU-native replacements for SURVEY.md §5: the reference has only wall-clock
meters and a CUDA-memory dump, utils/logger.py:131-136).
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import os
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


def load_latest_trace(trace_dir: str) -> dict:
    """Load the newest ``*.trace.json.gz`` under a jax.profiler trace dir
    (the CLAUDE.md axon recipe). Shared by every trace consumer so the
    plugin's file layout is encoded exactly once."""
    paths = glob.glob(os.path.join(trace_dir,
                                   "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        return json.load(f)


def device_seconds_from_trace(trace_dir: str) -> float:
    """Total device execution time (seconds) recorded in a jax.profiler
    trace: the sum of the per-program events on the device's "XLA Modules"
    lane of the latest ``*.trace.json.gz``.

    The module lane is authoritative for "time the chip spent executing":
    one event per launched executable, with ``dur`` == device_duration.
    (The "XLA Ops" lane double-counts nested control flow — a ``while``
    parent op AND its body fusions both carry the same nanoseconds —
    verified on the axon backend.) Host lanes, transfers, and idle gaps
    between launches are excluded, which makes this the tunnel-independent
    measure of model compute.

    Raises RuntimeError when the trace contains no matching events (a
    renamed lane, a truncated trace) instead of returning 0 — callers
    divide by this.
    """
    data = load_latest_trace(trace_dir)
    device_pids = set()
    module_lanes = set()
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name" and "/device:" in (
                ev["args"].get("name") or ""):
            device_pids.add(ev["pid"])
        if ev.get("name") == "thread_name" and (
                ev["args"].get("name") == "XLA Modules"):
            module_lanes.add((ev["pid"], ev.get("tid")))
    total_us = 0.0
    for ev in data.get("traceEvents", []):
        if (ev.get("ph") == "X" and "dur" in ev
                and ev["pid"] in device_pids
                and (ev["pid"], ev.get("tid")) in module_lanes):
            total_us += ev["dur"]
    if total_us == 0.0:
        raise RuntimeError(
            "trace has no events on a device 'XLA Modules' lane "
            f"(device pids={sorted(device_pids)}, module lanes="
            f"{sorted(module_lanes)}) — renamed lane or truncated trace?")
    return total_us / 1e6


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
