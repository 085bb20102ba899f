"""Optimizer / LR schedule (optax re-design of /root/reference/solver/solver.py).

MultiStepLR becomes an optax piecewise-constant schedule; Adam/AdamW/SGD map
to their optax equivalents (AdamW decoupled weight decay on all parameters,
matching torch's default no-param-group behavior, solver.py:40-43).
"""

from __future__ import annotations

from typing import Tuple

import optax

from swem_tpu.config import SolverConfig


def lr_schedule(cfg: SolverConfig, num_devices_scale: int = 1):
    """BASE_LR (optionally x num_gpu, solver.py:30-34) with MultiStep decay.

    Milestones are every entry of the stage's iteration list
    (solver.py:58-66); the last coincides with max_iter, so it never fires.
    """
    base = cfg.base_lr * max(1, num_devices_scale)
    steps = list(cfg.stage_iters())
    return optax.piecewise_constant_schedule(
        base, {int(s): cfg.gamma for s in steps}
    )


def make_optimizer(cfg: SolverConfig, num_devices_scale: int = 1) -> Tuple[optax.GradientTransformation, object]:
    sched = lr_schedule(cfg, num_devices_scale)
    b1, b2 = cfg.momentum
    if cfg.optimizer == "AdamW":
        tx = optax.adamw(sched, b1=b1, b2=b2, eps=1e-8, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "Adam":
        tx = optax.adam(sched, b1=b1, b2=b2, eps=1e-8)
        if cfg.weight_decay:
            # torch Adam applies L2 (coupled) weight decay (solver.py:36-39)
            tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    elif cfg.optimizer == "SGD":
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(sched, momentum=b1),
        )
    else:
        raise ValueError(f"Illegal optimizer {cfg.optimizer}")
    return tx, sched


def max_iter_for_stage(cfg: SolverConfig) -> int:
    """max_iter = last entry of the stage's iteration list (datasets/__init__.py:14-30)."""
    return int(cfg.stage_iters()[-1])
