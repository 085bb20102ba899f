"""End-to-end Trainer-loop test: loader -> sharded steps -> logs -> orbax
checkpoints -> exact resume (basic_trainer.py:192-307 semantics)."""

import os
import signal

import numpy as np
import pytest

import jax

from swem_tpu.config import (
    DataConfig,
    LossConfig,
    ModelConfig,
    SolverConfig,
    SWEMConfig,
)
from test_factory import build_roots


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("loopdata"))
    build_roots(base)
    return base


def loop_cfg(data_root, log_dir, **kw):
    model = ModelConfig(
        backbone="resnet18", keydim=8, valdim=16, num_bases=4,
        num_em_iters=2, topl=2, max_objs=2, mdim=16,
    )
    return SWEMConfig(
        model=model,
        data=DataConfig(data_root=data_root, vid_crop_size=(32, 32),
                        max_num_objs=2, batch_size=8, num_workers=1,
                        davis_samples_per_video=2),
        solver=SolverConfig(stage=1, davis_iters=(3, 6)),
        loss=LossConfig(bs_period=(1000, 2000)),
        log_dir=log_dir, exp_name="looptest",
        **{"log_period": 2, "save_period": 3, "vis_period": 2, **kw},
    )


def test_trainer_loop_and_resume(data_root, tmp_path_factory):
    from swem_tpu.train.loop import Trainer

    log_dir = str(tmp_path_factory.mktemp("logs"))
    trainer = Trainer(loop_cfg(data_root, log_dir))
    state = trainer.train()
    assert int(jax.device_get(state.step)) == 6

    exp_dir = os.path.join(log_dir, "SWEM", "S1", "looptest")
    # periodic + final checkpoints (save_period=3 -> it 3 and 6, overwritten
    # in place like the reference)
    assert os.path.isdir(os.path.join(exp_dir, "checkpoints", "state"))
    assert os.path.isdir(os.path.join(exp_dir, "checkpoints", "variables"))
    # tensorboard scalars + overlay grids were written
    tb_files = os.listdir(os.path.join(exp_dir, "tb"))
    assert any("tfevents" in f for f in tb_files)

    # full-state resume: starts at step 6 == max_iter -> trains 0 iterations
    cfg2 = loop_cfg(data_root, log_dir,
                    resume=os.path.join(exp_dir, "checkpoints"),
                    from_scratch=False)
    trainer2 = Trainer(cfg2)
    assert int(jax.device_get(trainer2.state.step)) == 6
    state2 = trainer2.train()
    assert int(jax.device_get(state2.step)) == 6
    # resumed params match the saved ones exactly
    p1 = jax.device_get(state.params)
    p2 = jax.device_get(state2.params)
    flat1 = jax.tree.leaves(p1)
    flat2 = jax.tree.leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # weights-only resume (from_scratch=True) restarts the schedule at 0
    cfg3 = loop_cfg(data_root, log_dir,
                    resume=os.path.join(exp_dir, "checkpoints"),
                    from_scratch=True)
    trainer3 = Trainer(cfg3)
    assert int(jax.device_get(trainer3.state.step)) == 0


def test_preemption_signal_contract():
    """A single Ctrl-C after a scheduler SIGTERM keeps the graceful
    checkpoint path; only a SECOND SIGINT force-interrupts (the documented
    'Ctrl-C twice' contract)."""
    import types

    import pytest as _pytest

    from swem_tpu.train.loop import Trainer

    ns = types.SimpleNamespace()
    handlers = Trainer._install_preemption_handlers(ns)
    try:
        h = signal.getsignal(signal.SIGTERM)
        h(signal.SIGTERM, None)  # scheduler preemption lands first
        assert ns._preempt_signum == signal.SIGTERM
        h(signal.SIGINT, None)  # one Ctrl-C: still graceful
        assert ns._preempt_signum == signal.SIGINT
        with _pytest.raises(KeyboardInterrupt):  # second Ctrl-C: abort
            h(signal.SIGINT, None)
        # the force-interrupt path restored the pre-install dispositions
        assert signal.getsignal(signal.SIGINT) is handlers[signal.SIGINT]
    finally:
        for s, old in handlers.items():
            signal.signal(s, old)


def test_preemption_sigterm_checkpoints_and_resumes(data_root,
                                                    tmp_path_factory):
    """SIGTERM mid-run (the preemptible-TPU-VM / scheduler eviction signal)
    checkpoints at the next step boundary and exits cleanly; --resume then
    continues from exactly that iteration. The reference would lose the
    work since its last SAVE_PERIOD multiple (basic_trainer.py:300-303)."""
    from swem_tpu.train.loop import Trainer

    log_dir = str(tmp_path_factory.mktemp("logs_preempt"))
    # save_period > max_iter: the ONLY checkpoint can come from preemption
    trainer = Trainer(loop_cfg(data_root, log_dir, save_period=100))
    real_step = trainer.train_step
    calls = []

    def step_with_preemption(state, batch, rng):
        calls.append(1)
        if len(calls) == 2:
            # delivered to the main thread before the loop's boundary check
            os.kill(os.getpid(), signal.SIGTERM)
        return real_step(state, batch, rng)

    trainer.train_step = step_with_preemption
    orig_handler = signal.getsignal(signal.SIGTERM)
    state = trainer.train()
    assert len(calls) == 2  # stopped at the boundary, not at max_iter=6
    assert int(jax.device_get(state.step)) == 2
    assert trainer._preempt_signum == signal.SIGTERM
    # the loop restored the previous SIGTERM disposition on exit
    assert signal.getsignal(signal.SIGTERM) is orig_handler

    exp_dir = os.path.join(log_dir, "SWEM", "S1", "looptest")
    ckpt = os.path.join(exp_dir, "checkpoints")
    assert os.path.isdir(os.path.join(ckpt, "state"))

    # resume picks up at iteration 2 and finishes the remaining 4
    trainer2 = Trainer(loop_cfg(data_root, log_dir, save_period=100,
                                resume=ckpt, from_scratch=False))
    assert int(jax.device_get(trainer2.state.step)) == 2
    state2 = trainer2.train()
    assert int(jax.device_get(state2.step)) == 6
