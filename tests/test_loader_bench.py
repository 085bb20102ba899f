"""scripts/loader_bench.py wiring guard.

The bench instruments the REAL sample() path by monkeypatching transform /
decode / TPS / synthesis entry points (scripts/loader_bench.py::OpTimer);
a rename in data/transforms.py or the dataset modules would silently break
the per-op breakdown. This smoke runs the breakdown on a tiny synthetic
tree and asserts the expected buckets appear and restore cleanly.
"""

import importlib.util
import os
import sys

import numpy as np


def _load_bench():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "loader_bench.py")
    spec = importlib.util.spec_from_file_location("loader_bench", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["loader_bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_breakdown_buckets_and_restore(tmp_path):
    lb = _load_bench()
    lb.build_video_tree(str(tmp_path), n_videos=1, n_frames=4, size=(80, 120))
    lb.build_static_tree(str(tmp_path), n=4, size=(80, 120))

    from swem_tpu.data import transforms as T
    orig_affine = T.apply_affine

    video = lb.make_video_dataset(str(tmp_path), 64)
    ops = lb.breakdown(video, n_samples=2)
    assert {"decode", "affine", "color_jitter", "tps", "finalize",
            "TOTAL"} <= set(ops)
    assert ops["TOTAL"] > 0 and ops["other"] >= -0.5  # no double counting
    # wrappers must be fully restored
    assert T.apply_affine is orig_affine

    static = lb.make_static_dataset(str(tmp_path), 64)
    ops = lb.breakdown(static, n_samples=2)
    assert "synthesis" in ops and ops["synthesis"] >= 0
    assert "resized_crop" not in ops or ops["resized_crop"] == 0.0
    assert T.apply_affine is orig_affine


def test_loader_rate_runs(tmp_path):
    lb = _load_bench()
    lb.build_video_tree(str(tmp_path), n_videos=1, n_frames=4, size=(80, 120))
    import functools
    rate = lb.loader_rate(
        functools.partial(lb.make_video_dataset, str(tmp_path), 32),
        batch=2, n_batches=2, num_workers=0)
    assert rate > 0
