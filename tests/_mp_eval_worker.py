"""Subprocess worker for the multi-process distributed-evaluation test.

Run as: python _mp_eval_worker.py <pid> <nprocs> <port> <data_root> <log_dir> [mode]
  pid >= 0: join a jax.distributed CPU (gloo) cluster and run
            Evaluator.val() — each process evaluates its round-robin video
            slice, process 0 computes metrics after the barrier (the
            pod-scale eval mode; the reference is single-GPU).
  pid == -1: single-process oracle over the full video list.
  mode: "seq" (default; 1 virtual device per process, sequential videos) or
        "batched" (4 virtual devices per process, video_batch=2 +
        obj_parallel=2 — the sharded compositions, which must build their
        meshes over process-LOCAL devices when distributed: each process
        runs a disjoint batch plan, so a mesh spanning another host's
        devices would device_put onto non-addressable devices).

Prints one JSON line: {"pid": ..., "videos": [...], "metrics": {...}|null}.
"""

import json
import os
import sys

MODE = sys.argv[6] if len(sys.argv) > 6 else "seq"
if MODE == "batched":
    # must precede backend init; each process gets its own 4 local devices
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )


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
    extra = ({"video_batch": 2, "obj_parallel": 2} if MODE == "batched"
             else {})
    cfg = SWEMConfig(
        model=model_cfg,
        eval=EvalConfig(eval_set="DAVIS17", data_root=data_root, max_objs=4,
                        davis_in_size=(64, 96), chunk=2, **extra),
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
    if MODE == "batched":
        # whole batches round-robin across processes; report per-video names
        # from the out_root (the plan is internal)
        names = sorted(
            d for d in os.listdir(ev.out_root)
            if os.path.isdir(os.path.join(ev.out_root, d))
        ) if pid <= 0 else None
        mine = names
    else:
        idx = list(range(len(ev.dataset)))[max(pid, 0)::max(nprocs, 1)]
        mine = [ev.dataset.peek(i)[0] for i in idx]
    print(json.dumps({
        "pid": pid,
        "videos": mine,
        "metrics": metrics,
        "out_root": ev.out_root,
    }))


if __name__ == "__main__":
    main()
