"""Method registry (re-design of /root/reference/methods/__init__.py:8-53).

Maps model names to trainer/evaluator classes so new methods plug in beside
SWEM; ``load_variables`` is the checkpoint-format-agnostic loader with the
single-object -> multi-object conv1 surgery applied on width mismatch.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict

TRAINERS: Dict[str, type] = {}
EVALUATORS: Dict[str, type] = {}


def register_trainer(name: str):
    def deco(cls):
        TRAINERS[name] = cls
        return cls

    return deco


def register_evaluator(name: str):
    def deco(cls):
        EVALUATORS[name] = cls
        return cls

    return deco


def _ensure_builtin():
    if "SWEM" not in TRAINERS:
        from swem_tpu.eval.evaluator import Evaluator
        from swem_tpu.train.loop import Trainer

        TRAINERS["SWEM"] = Trainer
        EVALUATORS["SWEM"] = Evaluator


def get_trainer(cfg, *args, **kwargs):
    _ensure_builtin()
    name = cfg.model.model_name
    assert name in TRAINERS, f"unknown trainer {name}"
    return TRAINERS[name](cfg, *args, **kwargs)


def get_evaluator(cfg, *args, **kwargs):
    _ensure_builtin()
    name = cfg.model.model_name
    assert name in EVALUATORS, f"unknown evaluator {name}"
    return EVALUATORS[name](cfg, *args, **kwargs)


def load_variables(cfg, path: str, max_objs: int = None) -> dict:
    """Load {params, batch_stats} from a torch .pth or orbax checkpoint,
    widening a single-object value encoder when needed
    (methods/__init__.py:33-53)."""
    import jax
    import jax.numpy as jnp

    from swem_tpu.io.checkpoint import restore_params, widen_value_encoder
    from swem_tpu.models.swem import SWEM

    if path.endswith((".pth", ".pt")):
        from swem_tpu.io.torch_import import import_swem_checkpoint

        variables = import_swem_checkpoint(path)
    else:
        model_cfg = cfg.model
        if max_objs is not None and model_cfg.max_objs != max_objs:
            model_cfg = dataclasses.replace(model_cfg, max_objs=max_objs)
        model = SWEM(model_cfg)
        frame = jnp.zeros((1, 64, 64, 3), jnp.float32)
        mask = jnp.zeros((1, 64, 64, model_cfg.max_objs + 1), jnp.float32)
        abstract = jax.eval_shape(model.init, jax.random.PRNGKey(0), frame, mask)
        sub = os.path.join(path, "variables")
        target = sub if os.path.exists(sub) else path
        try:
            variables = restore_params(target, abstract)
        except Exception:
            # single-object checkpoint: 4-input-channel value-encoder conv1
            abstract["params"]["value_encoder"]["trunk"]["conv1"]["kernel"] = (
                jax.ShapeDtypeStruct((7, 7, 4, 64), jnp.float32)
            )
            variables = restore_params(target, abstract)
    if not cfg.model.single_object:
        variables = dict(variables)
        variables["params"] = widen_value_encoder(variables["params"])
    return variables
