#!/usr/bin/env python
"""Train-step wall-clock benchmark (flagship config) on the current backend.

Measures three numbers on synthetic data (global batch 8, 384², T=3, bf16 —
the reference's S3 configuration):

* ``step_ms``       — pure device step time: batch pre-staged on device,
                      K dispatches, one final sync (steady-state).
* ``serial_ms``     — loop ms/step with the round-2 ordering: fetch + H2D
                      shard, then dispatch, each iteration.
* ``prefetch_ms``   — loop ms/step with the production ordering
                      (train/loop.py): the H2D for batch N+1 is enqueued
                      right after dispatching step N, overlapping the
                      running step (VERDICT r2 item 5).

Dev-tunnel caveat (CLAUDE.md): host->device is ~50 MB/s here, so the loop
numbers are transfer-bound on this box; on a real TPU host PCIe makes the
serial/prefetch delta the honest number.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/train_bench.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def make_host_batch(rng, B=8, T=3, H=384, W=384, n_objs=2):
    masks = np.zeros((B, H, W, n_objs + 1), np.float32)
    masks[..., 0] = 1.0
    masks[:, 100:220, 60:180, 1] = 1.0
    masks[:, 100:220, 60:180, 0] = 0.0
    masks[:, 240:350, 200:330, 2] = 1.0
    masks[:, 240:350, 200:330, 0] = 0.0
    label = np.argmax(masks, axis=-1).astype(np.int32)
    return {
        "frames": rng.random((B, T, H, W, 3)).astype(np.float32),
        "masks": np.repeat(masks[:, None], T, axis=1),
        "label": np.repeat(label[:, None], T, axis=1),
        "valid_obj": np.ones((B, n_objs + 1), np.float32),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--remat", default=False, nargs="?", const="encoder",
                   choices=["block", "encoder"],
                   help="jax.checkpoint granularity: 'block' = whole frame "
                        "block, 'encoder' = key-encoder trunk only "
                        "(recompute in backward instead of saving "
                        "activations)")
    args = p.parse_args()

    from swem_tpu.config import (LossConfig, ModelConfig, SolverConfig,
                                 SWEMConfig)
    from swem_tpu.models.swem import SWEM
    from swem_tpu.parallel import make_mesh, replicate, shard_batch
    from swem_tpu.train import (create_train_state, make_optimizer,
                                make_train_step)

    model_cfg = ModelConfig(dtype="bfloat16")
    cfg = SWEMConfig(model=model_cfg, solver=SolverConfig(), loss=LossConfig())
    model = SWEM(model_cfg)
    tx, _ = make_optimizer(cfg.solver)
    mesh = make_mesh()

    rng = np.random.default_rng(0)
    batches = [make_host_batch(rng, B=args.batch) for _ in range(3)]
    state = create_train_state(
        model, jax.random.PRNGKey(0), tx,
        jnp.asarray(batches[0]["frames"][:1, 0]),
        jnp.asarray(batches[0]["masks"][:1, 0]),
    )
    state = replicate(mesh, state)
    step = jax.jit(make_train_step(model, cfg, tx, remat=args.remat),
                   donate_argnums=(0,))
    key = jax.random.PRNGKey(1)

    # warmup: compile + chip-load + first H2D/D2H path init
    b0 = shard_batch(mesh, dict(batches[0]))
    state, metrics = step(state, b0, key)
    print("warmup loss:", float(np.asarray(metrics["total_loss"])))

    K = args.steps

    # --- pure device step: batch staged once ---------------------------- #
    staged = shard_batch(mesh, dict(batches[0]))
    jax.block_until_ready(staged["frames"])
    t0 = time.perf_counter()
    for _ in range(K):
        state, metrics = step(state, staged, key)
    np.asarray(metrics["total_loss"])
    step_ms = (time.perf_counter() - t0) / K * 1e3
    print(f"step_ms (device-staged batch): {step_ms:.1f}")

    # --- serial ordering: shard then dispatch, per iteration ------------ #
    t0 = time.perf_counter()
    for i in range(K):
        b = shard_batch(mesh, dict(batches[i % 3]))
        state, metrics = step(state, b, key)
    np.asarray(metrics["total_loss"])
    serial_ms = (time.perf_counter() - t0) / K * 1e3
    print(f"serial_ms  (shard N -> step N):          {serial_ms:.1f}")

    # --- prefetch ordering: shard N+1 under running step N -------------- #
    nxt = shard_batch(mesh, dict(batches[0]))
    t0 = time.perf_counter()
    for i in range(K):
        state, metrics = step(state, nxt, key)
        if i + 1 < K:
            nxt = shard_batch(mesh, dict(batches[(i + 1) % 3]))
    np.asarray(metrics["total_loss"])
    prefetch_ms = (time.perf_counter() - t0) / K * 1e3
    print(f"prefetch_ms (shard N+1 under step N):    {prefetch_ms:.1f}")
    print(f"prefetch delta vs serial: {serial_ms - prefetch_ms:+.1f} ms/step")


if __name__ == "__main__":
    main()
