"""Training orchestration (re-design of
/root/reference/methods/basic_modules/basic_trainer.py:24-310 and
methods/SWEM/swem_trainer.py:19-111).

The jitted train step does all device work; this loop handles host concerns:
the prefetching loader, batch sharding over the data-parallel mesh, meters +
ETA logging, tensorboard scalars, and periodic orbax checkpoints of the full
TrainState (+ an inference-variables checkpoint eval.py consumes directly).

Curriculum note: the reference rebuilds its DataLoader at every skip
boundary (basic_trainer.py:227-231); here the skip is a pure function of the
iteration inside each worker, so no rebuilds exist.
"""

from __future__ import annotations

import os
import signal
import time
import jax
import jax.numpy as jnp
import numpy as np

from swem_tpu.config import SWEMConfig
from swem_tpu.data.factory import build_train_loader
from swem_tpu.io.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
    widen_value_encoder,
)
from swem_tpu.models.swem import SWEM
from swem_tpu.parallel import make_mesh, replicate, shard_batch
from swem_tpu.train.solver import make_optimizer, max_iter_for_stage
from swem_tpu.train.trainer import TrainState, create_train_state, make_train_step
from swem_tpu.utils import AvgMeter, mkdir, setup_logger
from swem_tpu.utils.host_io import AsyncWriter


class Trainer:
    def __init__(self, cfg: SWEMConfig, logger=None):
        self.cfg = cfg
        self.exp_dir = os.path.join(
            cfg.log_dir, cfg.model.model_name, cfg.solver.stage_name, cfg.exp_name
        )
        mkdir(self.exp_dir)
        self.ckpt_dir = os.path.join(self.exp_dir, "checkpoints")
        self.logger = logger or setup_logger("swem_train", self.exp_dir, "train_stage")
        self.max_iter = max_iter_for_stage(cfg.solver)

        import dataclasses as _dc

        # Gaussian kernel reweighting is inference-only in the reference
        # (modules.py:253 'n_kernel > 0 and not self.training')
        self.model = SWEM(_dc.replace(cfg.model, n_kernel=0))
        n_devices = jax.device_count()
        self.mesh = make_mesh()
        self.tx, self.sched = make_optimizer(cfg.solver)
        # donate the state: params + Adam moments would otherwise be
        # double-buffered on device every step
        self.train_step = jax.jit(
            make_train_step(self.model, cfg, self.tx,
                            remat=cfg.solver.remat or False),
            donate_argnums=(0,),
        )
        self._predict = None  # lazily jitted visualization forward
        # one writer thread: checkpoint disk writes overlap training and
        # stay ordered; max_pending=1 bounds host RAM to one extra snapshot
        self._saver = AsyncWriter(workers=1, max_pending=1)

        # init / resume
        crop = cfg.data.vid_crop_size
        sample_frame = jnp.zeros((1, crop[0], crop[1], 3), jnp.float32)
        sample_mask = jnp.zeros((1, crop[0], crop[1], cfg.data.max_num_objs + 1), jnp.float32)
        self.state = create_train_state(
            self.model, jax.random.PRNGKey(cfg.data.seed), self.tx,
            sample_frame, sample_mask,
        )
        if cfg.resume is not None:
            self._resume(cfg.resume, from_scratch=cfg.from_scratch)
        self.state = replicate(self.mesh, self.state)

        nparams = sum(x.size for x in jax.tree.leaves(self.state.params))
        self.logger.info(
            f"SWEM trainer: stage {cfg.solver.stage_name}, {nparams / 1e6:.2f}M params, "
            f"{n_devices} devices, global batch {cfg.data.batch_size}, "
            f"max_iter {self.max_iter}"
        )

        self.writer = None
        if jax.process_index() == 0:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(os.path.join(self.exp_dir, "tb"))
            except ImportError:
                pass

    # ------------------------------------------------------------------ #
    def _resume(self, resume_path: str, from_scratch: bool):
        """Model (+solver unless from_scratch) restore with SO->MO surgery
        (basic_trainer.py:118-139, methods/__init__.py:39-45)."""
        state_path = os.path.join(resume_path, "state")
        var_path = os.path.join(resume_path, "variables")
        if not from_scratch and os.path.exists(state_path):
            self.state = restore_checkpoint(state_path, jax.eval_shape(lambda: self.state))
            self.logger.info(f"Resumed full state from {state_path} at step {int(self.state.step)}")
            return
        if resume_path.endswith((".pth", ".pt")):
            from swem_tpu.io.torch_import import import_swem_checkpoint

            variables = import_swem_checkpoint(resume_path)
        else:
            path = var_path if os.path.exists(var_path) else resume_path
            abstract = jax.eval_shape(
                lambda: {"params": self.state.params, "batch_stats": self.state.batch_stats}
            )
            try:
                variables = restore_checkpoint(path, abstract)
            except Exception:
                # shape mismatch: retry with single-object 4-channel conv1
                abstract["params"]["value_encoder"]["trunk"]["conv1"]["kernel"] = (
                    jax.ShapeDtypeStruct((7, 7, 4, 64), jnp.float32)
                )
                variables = restore_checkpoint(path, abstract)
        params = variables["params"]
        if not self.cfg.model.single_object:
            params = widen_value_encoder(params)
        self.state = TrainState(
            params=params,
            batch_stats=variables.get("batch_stats", self.state.batch_stats),
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )
        self.logger.info(f"Loaded model weights from {resume_path}")

    def save(self, step: int):
        """Checkpoint asynchronously: fetch now, write in the background.

        The device->host fetch must stay synchronous — the next train step
        DONATES the current state's device buffers (donate_argnums), so a
        background fetch would race the donation. The disk write (orbax
        serialize + fsync, the slow half for multi-GB states) has no such
        hazard: it runs on a single writer thread, serialized in order, so
        training continues during the write (the reference blocks on
        torch.save, basic_trainer.py:283-293). ``variables`` reuses the
        fetched state instead of a second params fetch.
        """
        if jax.process_index() != 0:
            return
        host_state = jax.device_get(self.state)
        self._saver.submit(self._write_checkpoint, host_state, step)

    def _write_checkpoint(self, host_state, step: int) -> None:
        save_checkpoint(os.path.join(self.ckpt_dir, "state"), host_state)
        save_checkpoint(
            os.path.join(self.ckpt_dir, "variables"),
            {"params": host_state.params, "batch_stats": host_state.batch_stats},
        )
        self.logger.info(f"Saved checkpoint at iteration {step}")

    # ------------------------------------------------------------------ #
    def _install_preemption_handlers(self):
        """SIGTERM/SIGINT checkpoint the run at the next step boundary.

        Preemptible/spot TPU VMs (and most cluster schedulers) deliver
        SIGTERM with a short grace period before the kill; the reference
        loses up to SAVE_PERIOD=5000 iterations of work on preemption
        (basic_trainer.py:300-303 saves on the period only). Here the
        handler just sets a flag — the loop finishes the in-flight
        iteration, writes a full checkpoint, and returns cleanly, so
        ``--resume`` continues exactly where the preemption landed. A
        second SIGINT restores the default handler (Ctrl-C twice still
        force-interrupts).

        Multi-host: only process 0 writes checkpoints, and its save path
        needs no collectives, so the checkpoint lands as long as process 0
        sees the signal (preemption delivers SIGTERM to every host of the
        slice). Hosts whose boundary check lands one step apart may leave a
        peer blocked in its next collective — the grace-period kill ends it,
        which is the preemption contract anyway.
        """
        self._preempt_signum = None
        handlers = {}

        def _on_signal(signum, frame):
            # only a SECOND Ctrl-C force-interrupts; a single SIGINT after a
            # scheduler SIGTERM must still take the graceful-checkpoint path
            if self._preempt_signum == signal.SIGINT and signum == signal.SIGINT:
                for s, h in handlers.items():
                    signal.signal(s, h)
                raise KeyboardInterrupt
            self._preempt_signum = signum

        try:
            for s in (signal.SIGTERM, signal.SIGINT):
                handlers[s] = signal.signal(s, _on_signal)
        except ValueError:
            # not the main thread (e.g. a test harness): signals are the
            # main thread's business; run without graceful preemption
            pass
        return handlers

    def train(self):
        cfg = self.cfg
        start_iter = int(jax.device_get(self.state.step))
        loader = build_train_loader(
            cfg, start_iter=start_iter,
            shard_id=jax.process_index(), num_shards=jax.process_count(),
        )
        meters = {k: AvgMeter(100) for k in ("total_loss", "main_loss", "aux_loss")}
        rng = jax.random.PRNGKey(cfg.data.seed + 77)
        t_start = time.perf_counter()
        it = start_iter
        batches = iter(loader)

        def next_sharded():
            """Fetch + device-shard the next batch; called right after a
            step is dispatched so the H2D transfer for batch N+1 overlaps
            step N's device execution (the dispatch is async), matching the
            DataLoader prefetch+pin_memory role of the reference
            (datasets/dataloader.py:12-36)."""
            b = next(batches)
            s = float(np.mean(b.pop("skips"))) if "skips" in b else None
            return shard_batch(self.mesh, b), s

        # per-step device metric futures since the last log flush: the
        # logged window averages EVERY iteration (basic_trainer.py:246-258
        # semantics) with one host sync per log period, not per step
        pending = []
        sig_handlers = self._install_preemption_handlers()
        try:
            nxt = next_sharded() if it < self.max_iter else None
            while it < self.max_iter:
                batch, skips = nxt
                self.state, metrics = self.train_step(self.state, batch, rng)
                pending.append(metrics)
                it += 1
                # check the flag BEFORE the blocking prefetch and the
                # (first-call jit-compiling) log/vis work: the preemption
                # grace period (often ~30 s) must cover only the in-flight
                # step plus the checkpoint write
                preempted = self._preempt_signum is not None
                if not preempted and it < self.max_iter:
                    nxt = next_sharded()
                    # the signal may land during the host-bound fetch
                    preempted = self._preempt_signum is not None
                if preempted:
                    self.logger.info(
                        f"Signal {signal.Signals(self._preempt_signum).name} "
                        f"received: checkpointing at iteration {it} and "
                        f"stopping (resume with --resume to continue)"
                    )
                    self.save(it)
                    break
                if it % cfg.log_period == 0 or it == self.max_iter:
                    fetched = jax.device_get(pending)
                    pending.clear()
                    for mt in fetched:
                        for k, m in meters.items():
                            m.update(float(mt[k]))
                    metrics = fetched[-1]
                    lr = float(self.sched(it))
                    elapsed = time.perf_counter() - t_start
                    rate = (it - start_iter) / max(elapsed, 1e-9)
                    eta_h = (self.max_iter - it) / max(rate, 1e-9) / 3600
                    self.logger.info(
                        f"it {it}/{self.max_iter} "
                        f"loss {meters['total_loss'].avg:.4f} "
                        f"(main {meters['main_loss'].avg:.4f}, aux {meters['aux_loss'].avg:.4f}) "
                        f"p {float(metrics['p']):.2f} lr {lr:.2e} "
                        f"{rate:.2f} it/s eta {eta_h:.1f}h"
                    )
                    if self.writer is not None:
                        for k, m in meters.items():
                            self.writer.add_scalar(f"train/{k}", m.avg, it)
                        self.writer.add_scalar("train/lr", lr, it)
                        if skips is not None:
                            self.writer.add_scalar("train/mean_skip", skips, it)
                if (cfg.vis_period and self.writer is not None
                        and jax.process_count() == 1
                        and it % cfg.vis_period == 0):
                    # single-host only: the jitted viz forward over a
                    # globally-sharded batch would be a collective that only
                    # process 0 enters
                    self._log_overlays(batch, rng, it)
                if it % cfg.save_period == 0 or it == self.max_iter:
                    self.save(it)
        finally:
            for s, h in sig_handlers.items():
                signal.signal(s, h)
            loader.close()
            # the last checkpoint write must land (and re-raise any disk
            # failure) before callers read the checkpoint back
            self._saver.flush()
        self.logger.info("Training done.")
        return self.state

    # ------------------------------------------------------------------ #
    def _log_overlays(self, batch, rng, it: int):
        """Prediction-overlay image grids to tensorboard
        (basic_trainer.py:259-282)."""
        from swem_tpu.data.palette import davis_palette
        from swem_tpu.train.trainer import make_predict_batch
        from swem_tpu.utils.visualization import add_overlay

        if self._predict is None:
            self._predict = jax.jit(make_predict_batch(self.model, self.cfg))
        preds = np.asarray(self._predict(self.state, batch, rng))  # (B, T-1, H, W)
        frames = np.asarray(jax.device_get(batch["frames"]))
        labels = np.asarray(jax.device_get(batch["label"]))
        pal = davis_palette()
        b = 0
        panels = []
        for t in range(preds.shape[1]):
            if frames.dtype == np.uint8:
                img = frames[b, t + 1]
            else:
                img = (np.clip(frames[b, t + 1], 0, 1) * 255).astype(np.uint8)
            panels.append(add_overlay(img[..., ::-1], preds[b, t], pal)[..., ::-1])
            panels.append(add_overlay(img[..., ::-1], labels[b, t + 1], pal)[..., ::-1])
        grid = np.concatenate(panels, axis=1)  # side-by-side pred|gt per frame
        self.writer.add_image("train/pred_vs_gt", grid, it, dataformats="HWC")
