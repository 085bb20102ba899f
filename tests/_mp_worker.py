"""Subprocess worker for the multi-process data-parallel test.

Run as: python _mp_worker.py <process_id> <num_processes> <port>
  process_id >= 0: join a jax.distributed CPU (gloo) cluster with 4 virtual
                   devices per process and run one sharded train step over
                   the global mesh, loading this process's disjoint batch
                   shard through TrainLoader (the DistributedSampler
                   equivalent, /root/reference/datasets/samplers/
                   distributed.py:11-67).
  process_id == -1: single-process reference mode (8 local virtual devices,
                   whole global batch, no jax.distributed).

Prints one JSON line: {"pid": ..., "indices": [...], "loss": ...}.
"""

import json
import sys


def build_dataset():
    return SyntheticVOSDataset()


class SyntheticVOSDataset:
    """Deterministic random clips keyed by the loader's (seed, it, idx) rng.

    Also returns the sample index so the test can check shard disjointness
    end-to-end through TrainLoader.
    """

    T, H, W, N = 2, 32, 32, 2

    def __len__(self):
        return 16

    def sample(self, rng, idx, it):
        import numpy as np

        T, H, W, N = self.T, self.H, self.W, self.N
        frames = rng.random((T, H, W, 3)).astype(np.float32)
        masks = np.zeros((T, H, W, N + 1), np.float32)
        masks[..., 0] = 1.0
        y, x = int(rng.integers(0, H - 10)), int(rng.integers(0, W - 10))
        masks[:, y : y + 10, x : x + 10, 1] = 1.0
        masks[:, y : y + 10, x : x + 10, 0] = 0.0
        label = np.argmax(masks, axis=-1).astype(np.int32)
        return {
            "frames": frames,
            "masks": masks,
            "label": label,
            "valid_obj": np.array([1.0, 1.0, 0.0], np.float32),
            "idx": np.int32(idx),
        }


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    if pid >= 0:
        jax.config.update("jax_num_cpu_devices", 4)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs,
            process_id=pid,
        )
        local_batch, num_shards, shard_id = 4, nprocs, pid
    else:
        jax.config.update("jax_num_cpu_devices", 8)
        local_batch, num_shards, shard_id = 8, 1, 0

    import numpy as np
    import jax.numpy as jnp

    from swem_tpu.config import LossConfig, ModelConfig, SolverConfig, SWEMConfig
    from swem_tpu.data.loader import TrainLoader
    from swem_tpu.models.swem import SWEM
    from swem_tpu.parallel import make_mesh, replicate, shard_batch
    from swem_tpu.train import create_train_state, make_optimizer, make_train_step

    model_cfg = ModelConfig(
        backbone="resnet18", keydim=8, valdim=16, num_bases=4,
        num_em_iters=2, topl=2, max_objs=2, mdim=16,
    )
    cfg = SWEMConfig(model=model_cfg, solver=SolverConfig(), loss=LossConfig())
    model = SWEM(model_cfg)
    tx, _ = make_optimizer(cfg.solver)

    loader = TrainLoader(
        build_dataset, local_batch, seed=123, num_workers=0,
        shard_id=shard_id, num_shards=num_shards,
    )
    batch = next(iter(loader))
    loader.close()
    indices = [int(i) for i in batch.pop("idx")]
    if pid < 0:
        # make_array_from_process_local_data concatenates the processes'
        # interleaved loader shards blockwise ([i0,i2,.. , i1,i3,..]); the
        # forward is not batch-permutation-invariant (the EM random-init
        # bases are drawn per batch position), so the single-process oracle
        # must present the rows in the same order.
        perm = np.concatenate([np.arange(0, 8, 2), np.arange(1, 8, 2)])
        batch = {k: v[perm] for k, v in batch.items()}
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    mesh = make_mesh()
    state = create_train_state(
        model, jax.random.PRNGKey(0), tx,
        batch["frames"][:1, 0], batch["masks"][:1, 0],
    )
    state = replicate(mesh, state)
    gbatch = shard_batch(mesh, batch)
    train_step = jax.jit(make_train_step(model, cfg, tx))
    _, metrics = train_step(state, gbatch, jax.random.PRNGKey(1))
    loss = float(np.asarray(metrics["total_loss"]))
    print(json.dumps({"pid": pid, "indices": indices, "loss": loss}), flush=True)


if __name__ == "__main__":
    main()
