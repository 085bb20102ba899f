"""Real multi-process data parallelism: 2 jax.distributed processes (gloo CPU
collectives, 4 virtual devices each) run one sharded train step over a global
8-device mesh, each loading a disjoint TrainLoader shard — the end-to-end
equivalent of the reference's DDP + DistributedSampler setup
(/root/reference/train.py:28-41, datasets/samplers/distributed.py:11-67,
basic_trainer.py:106-110).

The single-process oracle runs the identical global batch unsharded; the
distributed loss must match it (the batch rows arrive block-permuted through
make_array_from_process_local_data, and every loss term is a batch mean, so
ordering is immaterial).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).with_name("_mp_worker.py")
EVAL_WORKER = Path(__file__).with_name("_mp_eval_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(specs, timeout=900):
    """specs: list of (pid, nprocs, port). Returns parsed JSON per worker."""
    env = dict(os.environ)
    env["PYTHONPATH"] = str(WORKER.parents[1]) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(nprocs), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid, nprocs, port in specs
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"worker failed:\nstdout={out}\nstderr={err[-3000:]}"
        results.append(json.loads(out.strip().splitlines()[-1]))
    return results


@pytest.mark.slow
def test_two_process_dp_matches_single_process():
    port = _free_port()
    dual = _run_workers([(0, 2, port), (1, 2, port)])
    (single,) = _run_workers([(-1, 1, 0)])

    # loader shards are disjoint and interleave into the global schedule
    idx0, idx1 = dual[0]["indices"], dual[1]["indices"]
    assert not set(idx0) & set(idx1)
    assert [x for pair in zip(idx0, idx1) for x in pair] == single["indices"]

    # both processes observe the same global loss, equal to the unsharded run
    np.testing.assert_allclose(dual[0]["loss"], dual[1]["loss"], rtol=1e-6)
    np.testing.assert_allclose(dual[0]["loss"], single["loss"], rtol=1e-4)


def _run_eval_workers(specs, root, log_dir, mode=None, timeout=900):
    """Launch _mp_eval_worker.py per spec; return the JSON payloads."""
    env = dict(os.environ)
    env["PYTHONPATH"] = str(EVAL_WORKER.parents[1]) + os.pathsep + env.get(
        "PYTHONPATH", "")
    argv_tail = [root, log_dir] + ([mode] if mode else [])
    procs = [
        subprocess.Popen(
            [sys.executable, str(EVAL_WORKER), str(pid), str(n), str(port)]
            + argv_tail,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid, n, port in specs
    ]
    out = []
    for p in procs:
        o, e = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"eval worker failed:\n{o}\n{e[-3000:]}"
        # gloo logs connection lines to stdout around the barrier; take the
        # last JSON line
        payload = [l for l in o.strip().splitlines() if l.startswith("{")][-1]
        out.append(json.loads(payload))
    return out


def _run_eval_pair(tmp_path_factory, tag, mode=None, n_videos=2):
    """Run the 2-process distributed eval AND the single-process oracle."""
    from tests.test_eval_e2e import build_fake_davis

    root = str(tmp_path_factory.mktemp(f"mp_davis_{tag}"))
    build_fake_davis(root, n_videos=n_videos)
    log_dual = str(tmp_path_factory.mktemp(f"mp_logs_{tag}_dual"))
    log_single = str(tmp_path_factory.mktemp(f"mp_logs_{tag}_single"))
    port = _free_port()
    dual = _run_eval_workers([(0, 2, port), (1, 2, port)], root, log_dual,
                             mode=mode)
    (single,) = _run_eval_workers([(-1, 1, 0)], root, log_single, mode=mode)
    return {r["pid"]: r for r in dual}, single


def _assert_metrics_and_pngs_match(by_pid, single):
    """Process 0's metrics and the combined PNG tree must equal the oracle."""
    # only process 0 computed metrics; they match the single-process oracle
    assert by_pid[1]["metrics"] is None
    assert by_pid[0]["metrics"] is not None
    for k, v in single["metrics"].items():
        assert abs(by_pid[0]["metrics"][k] - v) < 1e-9, k

    # every PNG of every video is pixel-identical to the oracle's
    from PIL import Image

    for name in single["videos"]:
        a_dir = os.path.join(by_pid[0]["out_root"], name)
        b_dir = os.path.join(single["out_root"], name)
        files = sorted(os.listdir(b_dir))
        assert sorted(os.listdir(a_dir)) == files and files
        for f in files:
            a = np.array(Image.open(os.path.join(a_dir, f)))
            b = np.array(Image.open(os.path.join(b_dir, f)))
            np.testing.assert_array_equal(a, b, err_msg=f"{name}/{f}")


@pytest.mark.slow
def test_two_process_distributed_eval_matches_single_process(tmp_path_factory):
    """Distributed evaluation (the pod-scale mode the single-GPU reference
    lacks): 2 jax.distributed processes each evaluate a disjoint round-robin
    video slice into a SHARED results tree, barrier, and process 0 computes
    metrics over the combined PNGs — which must pixel-match the
    single-process oracle, with identical J&F."""
    by_pid, single = _run_eval_pair(tmp_path_factory, "seq")

    # disjoint slices covering the dataset
    assert not set(by_pid[0]["videos"]) & set(by_pid[1]["videos"])
    assert (set(by_pid[0]["videos"]) | set(by_pid[1]["videos"])
            == set(single["videos"]))
    _assert_metrics_and_pngs_match(by_pid, single)


@pytest.mark.slow
def test_two_process_distributed_batched_obj_parallel_eval(tmp_path_factory):
    """The sharded eval compositions under jax.distributed: video_batch=2 +
    obj_parallel=2, 4 virtual devices per process. Each process runs a
    disjoint round-robin slice of whole batches, so its meshes must be built
    over process-LOCAL devices (parallel.eval_devices) — a mesh over the
    global 8 devices would device_put onto the other host's non-addressable
    devices and fail. Combined PNGs + J&F must match the single-process
    batched oracle."""
    by_pid, single = _run_eval_pair(tmp_path_factory, "batched",
                                    mode="batched", n_videos=4)

    # the processes share one out_root; after the barrier process 0's
    # listing must cover the full dataset (4 videos: one 2-video batch per
    # process — a process dropping its batch would leave gaps here AND
    # desync the metrics below via missing-prediction zero-padding)
    assert by_pid[0]["videos"] == single["videos"]
    assert len(single["videos"]) == 4
    _assert_metrics_and_pngs_match(by_pid, single)
