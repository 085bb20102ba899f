"""Online streaming inference — the production-serving surface.

The reference ships only offline whole-video evaluation
(/root/reference/methods/basic_modules/basic_evaluator.py:149-269); a
deployed VOS system instead receives frames one at a time (camera feed,
video call) and must answer with bounded per-frame latency. This module
wraps the functional engine into a stateful session with that contract:

* ``StreamingSession.start(frame0, init_mask)`` seeds the EM memory from
  the annotated first frame.
* ``session.push(frame)`` returns the segmentation of one new frame and
  folds it into the fixed-size memory — O(1) state, any stream length.
* ``session.add_objects(frame, mask, new_slots)`` injects objects
  mid-stream (the YouTube-VOS protocol, swem_evaluator.py:124-130).

TPU-native details: all programs are AOT-compiled at session creation
(``warmup``) so the first frame pays no compile; the memory pytree is
donated between steps (no HBM churn); frames upload as uint8 and are
normalized on device; predictions return as uint8 index maps. Passing a
mesh with an 'obj' axis (``parallel.make_mesh2``) splits the per-object
conv towers across chips for lower per-frame latency — the one
parallelism a single stream can use (batch=1 has no data axis).
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from swem_tpu.config import ModelConfig
from swem_tpu.data.davis_test import to_onehot
from swem_tpu.engine import init_memory, step
from swem_tpu.models.swem import SWEM
from swem_tpu.ops.resize import resize


class StreamingSession:
    """One live video stream: per-frame segmentation with persistent memory.

    frame contract: (H, W, 3) uint8 RGB at the capture resolution
    ``in_size`` (resized on device from ``raw_hw`` if they differ);
    predictions are (Ho, Wo) uint8 label maps at ``out_size``.
    """

    def __init__(self, model_cfg: ModelConfig, variables, *,
                 raw_hw: Tuple[int, int], in_size: Tuple[int, int],
                 out_size: Tuple[int, int], n_slots: Optional[int] = None,
                 seed: int = 0, mesh=None):
        import dataclasses

        n_slots = n_slots or model_cfg.max_objs
        if model_cfg.max_objs != n_slots:
            model_cfg = dataclasses.replace(model_cfg, max_objs=n_slots)
        self.cfg = model_cfg
        self.model = SWEM(model_cfg)
        self.variables = variables
        esh = None
        if mesh is not None:
            # object parallelism for the latency path: a mesh with an 'obj'
            # axis splits the per-object conv towers across chips (see
            # parallel.EngineSharding) — the per-frame latency win a single
            # stream can actually use (batch=1 has no 'data' axis to shard)
            from jax.sharding import NamedSharding, PartitionSpec as Pspec

            from swem_tpu.parallel import EngineSharding

            esh = EngineSharding(mesh)
            if model_cfg.max_objs % esh.n_obj:
                raise ValueError(
                    f"max_objs={model_cfg.max_objs} not divisible by the "
                    f"mesh 'obj' axis ({esh.n_obj})")
            # checkpoint-restored variables arrive committed to one device;
            # replicate them over the mesh or jit rejects the mixed placement
            self.variables = jax.device_put(
                variables, NamedSharding(mesh, Pspec()))
        self.mesh = mesh
        self._esh = esh
        self.raw_hw = tuple(raw_hw)
        self.in_size = tuple(in_size)
        self.out_size = tuple(out_size)
        self.n_slots = n_slots
        self._rng = jax.random.PRNGKey(seed)
        self._mem = None
        self._active = None
        self._frame_count = 0
        self._prepared = None
        self._build_programs()

    def _make_programs(self, model: SWEM):
        """Jitted (init, step, inject) programs for ``model``'s slot budget."""
        esh = self._esh

        def pre(f):  # uint8 (B,h,w,3) -> normalized f32 at in_size
            f = f.astype(jnp.float32) / 255.0
            if tuple(f.shape[1:3]) != self.in_size:
                f = resize(f, self.in_size, "bicubic")
            return f

        init = jax.jit(
            lambda v, r, f, m, a: init_memory(model, v, r, pre(f), m, a,
                                              sharding=esh)
        )
        stp = jax.jit(
            lambda v, mem, f, a: step(
                model, v, mem, pre(f), a, self.out_size,
                do_memorize=True, sharding=esh,
            )[:2],
            donate_argnums=(1,),
        )
        inject = jax.jit(
            lambda v, mem, f, a, im, inew: step(
                model, v, mem, pre(f), a, self.out_size, do_memorize=True,
                inject_mask=im, inject_new=inew, sharding=esh,
            )[:2],
            donate_argnums=(1,),
        )
        return init, stp, inject

    def _build_programs(self) -> None:
        """(Re)build the jitted init/step/inject programs for the current
        model config — called at construction and by ``grow``."""
        self._init, self._step, self._inject = self._make_programs(self.model)

    # ------------------------------------------------------------------ #
    def warmup(self) -> None:
        """Compile and chip-load every program so no frame pays latency.

        Executes each program once on zeros and fetches its prediction:
        AOT ``lower().compile()`` does not populate the jit dispatch cache
        on this stack, a compiled executable lazily loads onto the chip at
        first use, and the first bulk device->host transfer initializes the
        fetch path — a dummy execution + fetch pays all three costs before
        the stream starts.
        """
        h, w = self.raw_hw
        f = jnp.zeros((1, h, w, 3), jnp.uint8)
        m = jnp.zeros((1,) + self.out_size + (self.n_slots + 1,), jnp.float32)
        a = jnp.zeros((1, self.n_slots), jnp.bool_)
        mem = self._init(self.variables, self._rng, f, m, a)
        mem, pred = self._step(self.variables, mem, f, a)
        np.asarray(pred)  # first bulk device->host fetch is also lazy-init
        mem, pred = self._inject(self.variables, mem, f, a, m, a)
        np.asarray(pred)
        jax.block_until_ready(mem.mem_count)

    def start(self, frame0: np.ndarray, init_mask: np.ndarray) -> None:
        """Seed the memory. frame0 (H,W,3) uint8; init_mask (Ho,Wo) uint8
        labels (0 = background, 1..n = objects)."""
        assert np.asarray(frame0).dtype == np.uint8, (
            f"start() wants uint8 frames (got {np.asarray(frame0).dtype}): "
            "the on-device preprocess divides by 255, so pre-normalized "
            "floats would yield near-black inputs"
        )
        labels = np.asarray(init_mask)
        # same one-hot contract as the offline loaders (ids beyond the slot
        # budget drop to background)
        onehot = to_onehot(labels, self.n_slots + 1)
        active = np.zeros((1, self.n_slots), bool)
        present = np.unique(labels)
        for obj in present[present > 0]:
            if obj <= self.n_slots:
                active[0, obj - 1] = True
        self._active = jnp.asarray(active)
        self._mem = self._init(
            self.variables, self._rng, jnp.asarray(frame0[None]),
            jnp.asarray(onehot[None]), self._active,
        )
        self._frame_count = 1

    def push(self, frame: np.ndarray) -> np.ndarray:
        """Segment one frame and update the memory. Returns (Ho,Wo) uint8."""
        assert self._mem is not None, "call start() first"
        assert np.asarray(frame).dtype == np.uint8, (
            f"push() wants uint8 frames (got {np.asarray(frame).dtype})"
        )
        self._mem, pred = self._step(
            self.variables, self._mem, jnp.asarray(frame[None]), self._active
        )
        self._frame_count += 1
        # slice AFTER the host transfer: indexing the device array would
        # compile (and chip-load) a one-off gather program on first use
        return np.asarray(pred)[0]

    def add_objects(self, frame: np.ndarray, mask: np.ndarray,
                    new_ids) -> np.ndarray:
        """Mid-stream object injection (YTVOS protocol). ``mask`` is a
        (Ho,Wo) uint8 label map containing the new objects; ``new_ids`` are
        their label values."""
        assert self._mem is not None, "call start() first"
        assert np.asarray(frame).dtype == np.uint8, (
            f"add_objects() wants uint8 frames (got {np.asarray(frame).dtype})"
        )
        labels = np.asarray(mask)
        onehot = to_onehot(labels, self.n_slots + 1)
        inew = np.zeros((1, self.n_slots), bool)
        for obj in new_ids:
            assert 1 <= obj <= self.n_slots, f"object id {obj} out of budget"
            inew[0, obj - 1] = True
        self._mem, pred = self._inject(
            self.variables, self._mem, jnp.asarray(frame[None]), self._active,
            jnp.asarray(onehot[None]), jnp.asarray(inew),
        )
        self._active = jnp.logical_or(self._active, jnp.asarray(inew))
        self._frame_count += 1
        return np.asarray(pred)[0]

    def _check_growable(self, n_slots: int) -> None:
        if n_slots <= self.n_slots:
            raise ValueError(
                f"grow({n_slots}) needs more than the current {self.n_slots} "
                "slots (shrinking would discard fitted objects)")
        if self._esh is not None and n_slots % self._esh.n_obj:
            raise ValueError(
                f"n_slots={n_slots} not divisible by the mesh 'obj' axis "
                f"({self._esh.n_obj})")

    def prepare_grow(self, n_slots: int) -> None:
        """Compile-and-warm the ``n_slots`` programs on a background thread
        so a later ``grow(n_slots)`` swaps them in without paying the inline
        recompile (~68 s at 480p through this box's compile tunnel; tens of
        seconds on a production host). Call it as soon as growth becomes
        likely — e.g. when the application knows more objects may appear.

        The warmup executes each program once on zeros (the only reliable
        way to fill the jit dispatch cache + chip-load on this stack, see
        ``warmup``); those dummy executions interleave with live pushes on
        the device queue, adding at most a few frame-times of jitter.
        """
        import threading

        import dataclasses

        self._check_growable(n_slots)
        cfg = dataclasses.replace(self.cfg, max_objs=n_slots)
        model = SWEM(cfg)
        progs = self._make_programs(model)
        state = {"error": None}

        def work():
            try:
                h, w = self.raw_hw
                f = jnp.zeros((1, h, w, 3), jnp.uint8)
                m = jnp.zeros((1,) + self.out_size + (n_slots + 1,),
                              jnp.float32)
                a = jnp.zeros((1, n_slots), jnp.bool_)
                mem = progs[0](self.variables, self._rng, f, m, a)
                mem, pred = progs[1](self.variables, mem, f, a)
                np.asarray(pred)
                mem, pred = progs[2](self.variables, mem, f, a, m, a)
                np.asarray(pred)
            except Exception as e:  # noqa: BLE001 — surfaced at grow()
                state["error"] = e

        t = threading.Thread(target=work, daemon=True)
        t.start()
        self._prepared = (n_slots, cfg, model, progs, t, state)

    def grow(self, n_slots: int, *, warmup: bool = False) -> None:
        """Raise the slot budget mid-stream (2 slots cost ~8 ms/push on a
        v5e at 480p, 8 slots ~26 ms — PARITY.md; start streams at their
        real object count and grow only when objects appear).

        Existing slots' fitted EM bases carry over bit-for-bit; the new
        slots receive a fresh random prototype draw (the same distribution
        a from-scratch session seeds, em.py::init_bases — it only
        warm-starts their first EM fit and washes out against real data)
        and stay inactive until ``add_objects`` names them. Inactive
        padded slots are exact EM no-ops (the load-bearing invariant,
        tests/test_em.py), so the stream's predictions are unchanged by
        growth alone — tested bit-identical in tests/test_serve.py.

        The jitted programs rebuild for the new static shapes: the next
        push pays a compile unless ``warmup=True`` (which pays it here) or
        ``prepare_grow(n_slots)`` already compiled them in the background.
        """
        import dataclasses

        from swem_tpu.models import em

        assert self._mem is not None, "call start() first"
        self._check_growable(n_slots)
        old = self.n_slots
        prepared = None
        if self._prepared is not None:
            pn, pcfg, pmodel, pprogs, pthread, pstate = self._prepared
            self._prepared = None
            if pn == n_slots:
                pthread.join()  # compile may still be in flight
                if pstate["error"] is None:
                    prepared = (pcfg, pmodel, pprogs)
                # else: fall through to the inline build; the background
                # failure may have been transient (e.g. OOM next to a big
                # in-flight program) and the inline path surfaces any
                # persistent error to the caller directly
        cfg = prepared[0] if prepared else dataclasses.replace(
            self.cfg, max_objs=n_slots)
        # fresh draw for the new slots, batch-broadcast like init_memory's
        fresh = em.fresh_memory(
            jax.random.fold_in(self._rng, self._frame_count), 1, n_slots,
            cfg.keydim, cfg.valdim, cfg.num_bases)
        B = self._active.shape[0]

        def pad(old_arr, fresh_arr):
            new_part = fresh_arr[:, old:]
            new_part = jnp.broadcast_to(new_part, (B,) + new_part.shape[1:])
            return jnp.concatenate([old_arr, new_part.astype(old_arr.dtype)],
                                   axis=1)

        def pad_bases(ob, fb):
            return em.Bases(kappa=pad(ob.kappa, fb.kappa),
                            nu=pad(ob.nu, fb.nu), zita=pad(ob.zita, fb.zita))

        self._mem = em.VOSMemory(
            first=pad_bases(self._mem.first, fresh.first),
            update=pad_bases(self._mem.update, fresh.update),
            obj_seen=jnp.concatenate(
                [self._mem.obj_seen,
                 jnp.zeros((B, n_slots - old), bool)], axis=1),
            mem_count=self._mem.mem_count,
        )
        self._active = jnp.concatenate(
            [self._active, jnp.zeros((B, n_slots - old), bool)], axis=1)
        self.cfg = cfg
        self.n_slots = n_slots
        if prepared:
            self.model = prepared[1]
            self._init, self._step, self._inject = prepared[2]
            warmup = False  # the prepared thread already executed them
        else:
            self.model = SWEM(cfg)
            self._build_programs()
        if warmup:
            h, w = self.raw_hw
            f = jnp.zeros((1, h, w, 3), jnp.uint8)
            m = jnp.zeros((1,) + self.out_size + (n_slots + 1,), jnp.float32)
            a = jnp.zeros((1, n_slots), jnp.bool_)
            mem = jax.tree.map(jnp.copy, self._mem)  # _step donates its mem
            mem, pred = self._step(self.variables, mem, f, a)
            np.asarray(pred)
            mem, pred = self._inject(self.variables, mem, f, a, m, a)
            np.asarray(pred)

    @property
    def frames_seen(self) -> int:
        return self._frame_count


def measure_latency(session: StreamingSession, frame0, init_mask, frames,
                    percentiles=(50, 90, 99)) -> dict:
    """Per-frame online latency (ms) over a frame sequence.

    Each push is synchronized by materializing the prediction on host (the
    serving contract: the caller needs the mask before the next frame).
    """
    session.warmup()
    session.start(frame0, init_mask)
    lat = []
    for f in frames:
        t0 = time.perf_counter()
        _ = session.push(f)
        lat.append((time.perf_counter() - t0) * 1e3)
    out = {f"p{p}": float(np.percentile(lat, p)) for p in percentiles}
    out["mean"] = float(np.mean(lat))
    return out


def measure_device_latency(session: StreamingSession, frame0, init_mask,
                           frames, trace_dir: Optional[str] = None) -> float:
    """Device-only per-frame latency (ms): trace the push loop with the
    jax profiler and divide the summed device "XLA Modules" time by the
    frame count (the ``runner_device_fps`` technique, bench.py).

    This is the tunnel/PCIe-independent number — the time the chip itself
    spends answering one ``push``, i.e. the latency floor a colocated
    serving host approaches. Wall-clock percentiles from
    ``measure_latency`` sit above it by the host<->device transfer and
    dispatch cost of the deployment link.
    """
    import shutil
    import tempfile

    from swem_tpu.utils.profiling import device_seconds_from_trace

    session.warmup()
    session.start(frame0, init_mask)
    own_dir = trace_dir is None
    trace_dir = trace_dir or tempfile.mkdtemp(prefix="serve_trace_")
    try:
        with jax.profiler.trace(trace_dir):
            for f in frames:
                _ = session.push(f)
        return device_seconds_from_trace(trace_dir) * 1e3 / len(frames)
    finally:
        if own_dir:
            shutil.rmtree(trace_dir, ignore_errors=True)
