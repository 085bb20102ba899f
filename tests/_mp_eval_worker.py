"""Subprocess worker for the multi-process distributed-evaluation test.

Run as: python _mp_eval_worker.py <pid> <nprocs> <port> <data_root> <log_dir>
  pid >= 0: join a jax.distributed CPU (gloo) cluster (1 virtual device per
            process) and run Evaluator.val() — each process evaluates its
            round-robin video slice, process 0 computes metrics after the
            barrier (the pod-scale eval mode; the reference is single-GPU).
  pid == -1: single-process oracle over the full video list.

Prints one JSON line: {"pid": ..., "videos": [...], "metrics": {...}|null}.
"""

import json
import os
import sys


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    data_root, log_dir = sys.argv[4], sys.argv[5]

    import jax

    jax.config.update("jax_platforms", "cpu")
    if pid >= 0:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs,
            process_id=pid,
        )

    import jax.numpy as jnp

    from swem_tpu.config import EvalConfig, ModelConfig, SWEMConfig
    from swem_tpu.eval.evaluator import Evaluator
    from swem_tpu.models.swem import SWEM

    model_cfg = ModelConfig(
        backbone="resnet18", keydim=8, valdim=16, num_bases=4,
        num_em_iters=2, topl=2, max_objs=4, mdim=16,
    )
    cfg = SWEMConfig(
        model=model_cfg,
        eval=EvalConfig(eval_set="DAVIS17", data_root=data_root, max_objs=4,
                        davis_in_size=(64, 96), chunk=2),
        log_dir=log_dir,
    )
    model = SWEM(model_cfg)
    # deterministic init: both processes hold identical params
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)),
        jnp.zeros((1, 64, 96, 5)),
    )
    ev = Evaluator(cfg, variables)
    metrics = ev.val()
    mine = list(range(len(ev.dataset)))[max(pid, 0)::max(nprocs, 1)]
    print(json.dumps({
        "pid": pid,
        "videos": [ev.dataset.peek(i)[0] for i in mine],
        "metrics": metrics,
        "out_root": ev.out_root,
    }))


if __name__ == "__main__":
    main()
