"""Trace-parsing unit tests for utils/profiling.py (the tunnel-independent
device-time measurement behind bench.py's runner_device_fps).

The fixture fabricates the Chrome-trace JSON layout the axon jax.profiler
plugin writes (CLAUDE.md recipe): metadata events naming a device process
and its "XLA Modules" lane, plus X-phase duration events.
"""

import gzip
import json
import os

import pytest

from swem_tpu.utils.profiling import (
    device_seconds_from_trace,
    load_latest_trace,
)


def _write_trace(tmp_path, events):
    d = os.path.join(str(tmp_path), "plugins", "profile", "run1")
    os.makedirs(d, exist_ok=True)
    with gzip.open(os.path.join(d, "vm.trace.json.gz"), "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def _device_meta(pid=7, tid=3):
    return [
        {"ph": "M", "name": "process_name", "pid": pid,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "thread_name", "pid": pid, "tid": tid,
         "args": {"name": "XLA Modules"}},
    ]


def test_sums_module_lane_only(tmp_path):
    events = _device_meta() + [
        # two module launches: 1500 + 500 us
        {"ph": "X", "pid": 7, "tid": 3, "name": "jit_step", "dur": 1500},
        {"ph": "X", "pid": 7, "tid": 3, "name": "jit_step", "dur": 500},
        # same pid, different lane (XLA Ops double-counts) — excluded
        {"ph": "X", "pid": 7, "tid": 9, "name": "fusion.1", "dur": 9999},
        # host process — excluded
        {"ph": "X", "pid": 1, "tid": 3, "name": "python", "dur": 12345},
    ]
    root = _write_trace(tmp_path, events)
    assert device_seconds_from_trace(root) == pytest.approx(2000 / 1e6)


def test_raises_on_missing_module_lane(tmp_path):
    """A trace with no device module events must raise, not return 0 —
    bench.py divides frames by this value (a silent 0 was a
    ZeroDivisionError after the expensive timed runs)."""
    events = [
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "host"}},
        {"ph": "X", "pid": 1, "tid": 1, "name": "python", "dur": 100},
    ]
    root = _write_trace(tmp_path, events)
    with pytest.raises(RuntimeError, match="XLA Modules"):
        device_seconds_from_trace(root)


def test_missing_trace_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_latest_trace(str(tmp_path))


def test_load_latest_trace_picks_newest(tmp_path):
    base = os.path.join(str(tmp_path), "plugins", "profile")
    for name, tag in (("old", "a"), ("new", "b")):
        d = os.path.join(base, name)
        os.makedirs(d)
        with gzip.open(os.path.join(d, "vm.trace.json.gz"), "wt") as f:
            json.dump({"traceEvents": [], "tag": tag}, f)
        os.utime(os.path.join(d, "vm.trace.json.gz"),
                 (1000, 1000) if name == "old" else None)
    assert load_latest_trace(str(tmp_path))["tag"] == "b"
