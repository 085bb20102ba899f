"""Checkpoint save/load (orbax) + cross-stage parameter surgery.

Replaces the reference's two-file scheme (models/SWEM.pth raw state_dict +
solvers/SWEM.solver optimizer blob, basic_trainer.py:110-147,
solver/solver.py:6-27) with a single orbax checkpoint of the full
TrainState pytree {params, batch_stats, opt_state, step}.

``widen_value_encoder`` reproduces the single-object -> multi-object conv1
surgery (an orthogonal-initialized extra input channel,
methods/__init__.py:39-45, basic_trainer.py:125-131).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any) -> None:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore_checkpoint(path: str, abstract_state: Any) -> Any:
    path = os.path.abspath(path)
    # orbax on non-CPU backends requires concrete shardings on abstract
    # leaves; default to single-device on the first local device
    sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])

    def _with_sharding(leaf):
        if isinstance(leaf, jax.ShapeDtypeStruct) and leaf.sharding is None:
            return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=sharding)
        return leaf

    abstract_state = jax.tree.map(_with_sharding, abstract_state)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract_state)


def save_params(path: str, variables: dict) -> None:
    """Save inference variables {params, batch_stats} only."""
    save_checkpoint(path, variables)


def restore_params(path: str, abstract_variables: dict) -> dict:
    return restore_checkpoint(path, abstract_variables)


def widen_value_encoder(params: dict, seed: int = 0) -> dict:
    """Single-object (4-in-channel) -> multi-object (5-in-channel) conv1.

    flax kernels are HWIO; the extra input-channel slice is
    orthogonal-initialized like torch.nn.init.orthogonal_ on the padded
    (64, 1, 7, 7) block (basic_evaluator.py:110-116).
    """
    kernel = params["value_encoder"]["trunk"]["conv1"]["kernel"]
    h, w, cin, cout = kernel.shape
    if cin != 4:
        return params
    from swem_tpu.io.torch_import import orthogonal_conv_hwio

    rng = np.random.default_rng(seed)
    pad = orthogonal_conv_hwio(rng, (h, w, 1, cout))
    new_kernel = jnp.concatenate([jnp.asarray(kernel), jnp.asarray(pad)], axis=2)
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    params["value_encoder"]["trunk"]["conv1"]["kernel"] = new_kernel
    return params
