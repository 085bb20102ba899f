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
