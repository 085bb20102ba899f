"""Evaluation runner — DAVIS / YouTube-VOS inference + PNG output + metrics.

Re-design of /root/reference/methods/basic_modules/basic_evaluator.py:25-331
and methods/SWEM/swem_evaluator.py:16-160 around the functional engine:

* DAVIS: frames resized on-device to (480, 864) bicubic
  (basic_evaluator.py:160), whole video run through the chunked-scan runner,
  predictions saved as palette PNGs at the original 480p size.
* YTVOS: whole videos through the same chunked-scan runner with
  ground-truth injection at object appearance frames folded into the scan
  (engine.run_chunk inject_idx/inject_new); slot indices mapped back to
  original annotation ids before saving (basic_evaluator.py:201-206).

FPS is whole-video wall clock with host materialization as the sync fence
(utils/logger.py:87-108 semantics), excluding PNG I/O.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from swem_tpu.config import SWEMConfig
from swem_tpu.data.davis_test import DavisTestSet
from swem_tpu.data.palette import davis_palette, save_seg_mask, ytvos_palette
from swem_tpu.data.ytvos_test import YTVOSTestSet
from swem_tpu.engine import ChunkedVideoRunner
from swem_tpu.models.swem import SWEM
from swem_tpu.ops.resize import resize
from swem_tpu.utils import FrameSecondMeter, mkdir, setup_logger
from swem_tpu.utils.host_io import AsyncWriter, prefetch

DAVIS_IN_SIZE = (480, 864)  # basic_evaluator.py:160


class Evaluator:
    def __init__(self, cfg: SWEMConfig, variables, logger=None):
        self.cfg = cfg
        self.eval_set = cfg.eval.eval_set
        self.variables = variables
        model_cfg = cfg.model
        if model_cfg.max_objs != cfg.eval.max_objs:
            import dataclasses

            model_cfg = dataclasses.replace(model_cfg, max_objs=cfg.eval.max_objs)
        self.model = SWEM(model_cfg)
        self.n_slots = model_cfg.max_objs

        self.save_dir = os.path.join(
            cfg.log_dir, cfg.model.model_name, cfg.solver.stage_name,
            cfg.exp_name, "results", self.eval_set,
        )
        mkdir(self.save_dir)
        self.out_root = os.path.join(self.save_dir, "output")
        mkdir(self.out_root)
        # multi-host: each process evaluates a disjoint round-robin slice of
        # the video list (videos are independent, PNG dirs disjoint); val()
        # barriers before metrics. The reference is strictly single-GPU at
        # eval time (basic_evaluator.py) — this is the pod-scale extension.
        self._pid = jax.process_index()
        self._nproc = jax.process_count()
        log_name = "test_stage" if self._nproc == 1 else f"test_stage_p{self._pid}"
        self.logger = logger or setup_logger("swem_eval", self.save_dir, log_name)
        self.davis_palette = davis_palette()
        self.ytvos_palette = ytvos_palette()
        self._runners: Dict[Tuple[int, int], ChunkedVideoRunner] = {}

        root = cfg.eval.data_root
        if self.eval_set == "DAVIS16":
            self.dataset = DavisTestSet(root, "2016/val.txt", single_obj=True, n_slots=self.n_slots)
        elif self.eval_set == "DAVIS17":
            self.dataset = DavisTestSet(root, "2017/val.txt", n_slots=self.n_slots)
        elif self.eval_set == "DAVIS17Test":
            self.dataset = DavisTestSet(root, "2017/test-dev.txt", n_slots=self.n_slots)
        elif self.eval_set in ("YTVOS18", "YTVOS19"):
            # YTVOS videos carry up to ~12 objects (the reference budgets 11,
            # YTVOS_Test.py:24); slot bucketing makes the larger cap cheap
            self.n_slots = max(self.n_slots, 12)
            self.dataset = YTVOSTestSet(root, short_size=cfg.eval.ssize, n_slots=self.n_slots)
        else:
            raise ValueError(f"{self.eval_set} is unsupported")

        # frames stay on HOST until each chunk program uploads its own
        # uint8 slice (4x smaller transfer; /255 + bicubic resize to
        # davis_in_size run on device inside the chunk, see _runner) —
        # slicing a device-resident stack would compile a fresh executable
        # per static offset
        self._davis_pre = lambda f: resize(
            f.astype(jnp.float32) / 255.0, tuple(cfg.eval.davis_in_size), "bicubic"
        )

    # ------------------------------------------------------------------ #
    def _slot_bucket(self, n_objs: int) -> int:
        """Smallest power-of-two slot budget covering the video's objects.

        The reference runs exactly n objects per video (dynamic shapes); we
        compile one program per {2, 4, 8, ...} bucket instead of paying the
        full static budget's per-object towers on every video.
        """
        b = 2
        while b < n_objs:
            b *= 2
        return min(b, self.n_slots) if n_objs <= self.n_slots else self.n_slots

    def _model_for(self, n_slots: int) -> SWEM:
        if n_slots == self.model.cfg.max_objs:
            return self.model
        import dataclasses

        return SWEM(dataclasses.replace(self.model.cfg, max_objs=n_slots))

    def _obj_mesh(self, n_slots: int, n_data: int = 1):
        """('data', 'obj') mesh for object-parallel eval, or None when off.

        Shards each video's padded object slots over ``obj_parallel`` chips
        (clamped to the slot bucket and the device count); the per-object
        value-encoder/fusion/decoder towers then split across chips with one
        all-gather per frame at the soft-aggregation (parallel.EngineSharding).
        """
        k = self.cfg.eval.obj_parallel
        if k <= 1:
            return None
        from swem_tpu.parallel import clamp_pow2, eval_devices, make_mesh2

        # process-local devices: each distributed-eval process runs a
        # disjoint video slice, so its meshes may only contain devices it
        # can address (eval_devices); round down to a power of two dividing
        # the slot bucket (buckets are powers of two, so any power-of-two
        # k <= n_slots shards them evenly)
        devs = eval_devices()
        k = clamp_pow2(min(k, n_slots, max(1, len(devs) // n_data)), n_slots)
        if k <= 1:
            return None
        return make_mesh2(n_data=n_data, n_obj=k, devices=devs)

    def _runner(self, out_size, batch: int = 1, n_slots: int = None,
                mesh=None) -> ChunkedVideoRunner:
        n_slots = n_slots or self.n_slots
        if mesh is None:
            mesh = self._obj_mesh(n_slots)
        mesh_key = None if mesh is None else (
            tuple(mesh.axis_names), tuple(mesh.devices.shape))
        key = (out_size, batch, n_slots, mesh_key)
        if key not in self._runners:
            runner = ChunkedVideoRunner(self._model_for(n_slots), out_size,
                                        chunk=self.cfg.eval.chunk,
                                        preprocess=self._davis_pre, mesh=mesh)
            # compile + chip-load every program outside the FPS span (XLA
            # compilation would otherwise be billed to video 0); raw DAVIS
            # frames arrive uint8 at the annotation size == out_size
            runner.warmup(self.variables, out_size, batch, n_slots,
                          frame_dtype=jnp.uint8)
            self._runners[key] = runner
        return self._runners[key]

    def evaluate_davis(self):
        if self.cfg.eval.video_batch > 1:
            if tuple(self.cfg.eval.scales) != (480,) or self.cfg.eval.flip:
                raise ValueError(
                    "video_batch > 1 does not support multi-scale/flip eval; "
                    "drop --video_batch or --scales/--flip"
                )
            return self.evaluate_davis_batched(self.cfg.eval.video_batch)
        fps = FrameSecondMeter()
        rng = jax.random.PRNGKey(self.cfg.data.seed)
        multi_scale = (
            tuple(self.cfg.eval.scales) != (480,) or self.cfg.eval.flip
        )
        # video N+1 decodes on a background thread while N computes, and
        # video N's PNGs encode while N+1 computes (the reference gets the
        # decode half from DataLoader num_workers=4, basic_evaluator.py:62);
        # multi-host: this process's round-robin video slice
        my_indices = list(range(len(self.dataset)))[self._pid :: self._nproc]
        videos = prefetch(self.dataset.__getitem__, my_indices)
        with AsyncWriter() as writer:
            for seq_idx, video in zip(my_indices, videos):
                T, Ho, Wo, _ = video.frames.shape
                out_dir = os.path.join(self.out_root, video.name)
                mkdir(out_dir)
                self.logger.info(
                    f"Testing video {seq_idx}: {video.name} ({T} frames)")

                frames = video.frames[:, None]  # (T, 1, H, W, 3) host uint8 view
                bucket = self._slot_bucket(video.n_objs)
                # host arrays throughout: the jitted programs upload them
                init_mask = video.init_mask[None, ..., : bucket + 1]
                active = np.zeros((1, bucket), bool)
                active[:, : video.n_objs] = True

                if multi_scale:
                    preds = self._run_multi_scale(
                        rng, frames, init_mask, active, (Ho, Wo), bucket,
                        fps=fps, n_frames=T,
                    )
                else:
                    # runner creation (compile/warmup) sits outside the timed
                    # span, like the reference; per-chunk uint8 uploads land
                    # inside it (the reference moves the video to device before
                    # tic, basic_evaluator.py:160-171 — ~4 ms/video of H2D on a
                    # real host, counted here for honesty)
                    runner = self._runner((Ho, Wo), n_slots=bucket)
                    fps.tic()
                    preds = runner(self.variables, rng, frames, init_mask, active)
                    fps.toc(T)

                first = np.argmax(video.init_mask, axis=-1).astype(np.uint8)
                writer.submit(
                    save_seg_mask, first,
                    os.path.join(out_dir, f"{video.frame_names[0]}.png"),
                    self.davis_palette)
                for t in range(1, T):
                    writer.submit(
                        save_seg_mask, preds[t - 1, 0],
                        os.path.join(out_dir, f"{video.frame_names[t]}.png"),
                        self.davis_palette)
                if self.cfg.eval.visualize:
                    self._save_overlays(video, preds, out_dir)
        fps.end()
        self.logger.info(f"fps: {fps.fps}")
        return fps.fps

    def evaluate_davis_batched(self, vb: int):
        """Throughput mode: run ``vb`` videos per device batch.

        Videos sharing (output size, slot bucket) are grouped, sorted by
        length (so batch-mates pad minimally), padded to a common length by
        repeating each video's final frame (extra predictions are discarded;
        padded frames only touch their own video's memory), and run through
        a slot-bucketed chunked-scan runner with batch dim vb. A TPU-native
        capability the strictly-sequential reference lacks — per-video
        results are identical to the B=1 path.
        """
        fps = FrameSecondMeter()
        rng = jax.random.PRNGKey(self.cfg.data.seed)
        # multi-chip throughput: shard the video batch over a 'data' mesh
        # when the batch divides the device count (every video is
        # independent, so this is embarrassingly parallel — a capability
        # the strictly single-GPU-sequential reference has no analogue for)
        mesh = None
        # 2-D: videos over 'data', each video's slots over 'obj'; a video
        # batch that doesn't divide the device count shards over fewer
        # chips (some idle) rather than not at all. Process-local devices:
        # distributed eval gives each process disjoint batches, so meshes
        # must not span other hosts' devices.
        from swem_tpu.parallel import derive_eval_mesh_extents, eval_devices

        devs = eval_devices()
        n_data, n_obj = derive_eval_mesh_extents(
            len(devs), self.cfg.eval.obj_parallel, vb)
        if n_data * n_obj > 1:
            if n_obj > 1:
                # slot buckets vary per group; the mesh obj-extent is fixed,
                # so _runner re-derives the bucket-clamped mesh per group
                mesh = "obj2d"
            else:
                from swem_tpu.parallel import make_mesh

                mesh = make_mesh(n_data, devices=devs)
            self.logger.info(
                f"sharding video batches over {n_data} devices"
                + ("" if n_obj == 1 else f" x {n_obj} object shards"))
        # group by (output size, slot bucket) from file headers only —
        # videos are decoded one batch at a time (a full eager pass would
        # hold the whole dataset's frame stacks in host RAM) — and sort each
        # group by length so batch-mates pad minimally against each other
        groups: Dict[tuple, list] = {}
        for idx in range(len(self.dataset)):
            _, out_size, n_objs, n_frames = self.dataset.peek(idx)
            bucket = self._slot_bucket(n_objs)
            groups.setdefault((out_size, bucket), []).append((idx, n_frames))

        # flat batch plan so the decode-ahead thread crosses group
        # boundaries: batch P+1 decodes while batch P computes; multi-host
        # takes a round-robin slice of whole batches (grouping preserved)
        plan = []
        for (out_size, bucket), items in groups.items():
            items.sort(key=lambda t: t[1])
            indices = [t[0] for t in items]
            plan += [((out_size, bucket), indices[i : i + vb])
                     for i in range(0, len(indices), vb)]
        plan = plan[self._pid :: self._nproc]
        decoded = prefetch(
            lambda p: (p[0], [self.dataset[j] for j in p[1]]), plan, depth=1)

        with AsyncWriter() as writer:
            for (out_size, bucket), batch_videos in decoded:
                B = len(batch_videos)
                Ho, Wo = batch_videos[0].init_mask.shape[:2]
                T_max = max(v.frames.shape[0] for v in batch_videos)
                frames = np.stack([
                    np.concatenate(
                        [v.frames, np.repeat(v.frames[-1:], T_max - v.frames.shape[0], 0)]
                    ) if v.frames.shape[0] < T_max else v.frames
                    for v in batch_videos
                ], axis=1)  # (T_max, B, H, W, 3)
                init_mask = jnp.asarray(np.stack(
                    [v.init_mask[..., : bucket + 1] for v in batch_videos]
                ))
                active = np.zeros((B, bucket), bool)
                for b, v in enumerate(batch_videos):
                    active[b, : v.n_objs] = True
                group_mesh = None
                if mesh is not None and B % n_data == 0:
                    group_mesh = (self._obj_mesh(bucket, n_data=n_data)
                                  if mesh == "obj2d" else mesh)
                runner = self._runner(
                    (Ho, Wo), batch=B, n_slots=bucket, mesh=group_mesh,
                )
                fps.tic()
                preds = runner(self.variables, rng, frames, init_mask,
                               jnp.asarray(active))
                fps.toc(sum(v.frames.shape[0] for v in batch_videos))
                for b, v in enumerate(batch_videos):
                    out_dir = os.path.join(self.out_root, v.name)
                    mkdir(out_dir)
                    first = np.argmax(v.init_mask, axis=-1).astype(np.uint8)
                    writer.submit(
                        save_seg_mask, first,
                        os.path.join(out_dir, f"{v.frame_names[0]}.png"),
                        self.davis_palette)
                    for t in range(1, v.frames.shape[0]):
                        writer.submit(
                            save_seg_mask, preds[t - 1, b],
                            os.path.join(out_dir, f"{v.frame_names[t]}.png"),
                            self.davis_palette)
                self.logger.info(
                    f"batch of {B} videos ({[v.name for v in batch_videos]}) done"
                )
        fps.end()
        self.logger.info(f"fps (throughput, video_batch={vb}): {fps.fps}")
        return fps.fps

    def _run_multi_scale(self, rng, frames, init_mask, active, out_size, bucket,
                         fps=None, n_frames=None):
        """Multi-scale + flip score averaging (swem_evaluator.py:34-57).

        Each scale runs through a slot-bucketed scores-mode chunked runner
        (exact tail, decode-only final frame — no padded or post-video
        memorize work in the timed span); scores accumulate on device and
        only the argmaxed uint8 indices cross the host link. Runner
        creation/compilation happens outside the FPS span.
        """
        T = frames.shape[0]
        if T == 1:  # only the annotated frame: nothing to predict
            if fps is not None:
                fps.tic()
                fps.toc(n_frames if n_frames is not None else T)
            B = frames.shape[1]
            return np.zeros((0, B) + tuple(out_size), np.uint8)

        base_h, base_w = self.cfg.eval.davis_in_size
        raw_hw = tuple(frames.shape[2:4])
        scales = tuple(self.cfg.eval.scales)
        plans = []
        for scale in scales:
            h = scale
            # truncating int(), not round(): the reference computes
            # w = int((scale/480)*864) (swem_evaluator.py:42-43), so e.g.
            # scale 552 -> 993 (not 994); match it exactly
            w = int(scale * base_w / base_h)
            rkey = ("ms", (h, w), raw_hw, out_size, bucket)
            if rkey not in self._runners:
                # the uint8 -> /255 -> bicubic preprocess is fused into the
                # runner's fixed-shape programs (per-video frame counts never
                # trigger resize recompiles inside the timed span)
                runner = ChunkedVideoRunner(
                    self._model_for(bucket), out_size,
                    chunk=self.cfg.eval.chunk, scores=True,
                    preprocess=lambda f, _h=h, _w=w: resize(
                        f.astype(jnp.float32) / 255.0, (_h, _w), "bicubic"
                    ),
                    mesh=self._obj_mesh(bucket),
                )
                runner.warmup(self.variables, raw_hw, 1, bucket,
                              frame_dtype=frames.dtype)
                self._runners[rkey] = runner
            plans.append(self._runners[rkey])

        if fps is not None:
            fps.tic()
        total = None
        for runner in plans:
            scores = runner(self.variables, rng, frames, init_mask, active)
            total = scores if total is None else total + scores
            if self.cfg.eval.flip:
                # flips of the HOST inputs are free numpy views; only the
                # score un-flip runs on device
                flipped = runner(
                    self.variables, rng, np.flip(frames, axis=-2),
                    np.flip(init_mask, axis=-2), active,
                )
                total = total + jnp.flip(flipped, axis=-2)
        preds = np.asarray(jnp.argmax(total, axis=-1).astype(jnp.uint8))
        if fps is not None:
            fps.toc(n_frames if n_frames is not None else T)
        return preds

    def _save_overlays(self, video, preds, out_dir):
        from swem_tpu.utils.visualization import save_overlay

        overlay_dir = os.path.join(self.save_dir, "overlay", video.name)
        mkdir(overlay_dir)
        first = np.argmax(video.init_mask, axis=-1).astype(np.uint8)
        save_overlay(video.frames[0], first,
                     os.path.join(overlay_dir, f"{video.frame_names[0]}.png"),
                     self.davis_palette)
        for t in range(1, video.frames.shape[0]):
            save_overlay(video.frames[t], preds[t - 1, 0],
                         os.path.join(overlay_dir, f"{video.frame_names[t]}.png"),
                         self.davis_palette)

    # ------------------------------------------------------------------ #
    def _yt_runner(self, raw_hw, in_size, out_size, bucket, batch=1,
                   mesh=None) -> ChunkedVideoRunner:
        """Injectable chunked runner for YTVOS, cached per shape signature.

        Frames arrive uint8 at native resolution; /255 + bicubic resize to
        ``in_size`` fuse into the chunk programs (the DAVIS convention — 4x
        less H2D than a host-resized f32 path, YTVOS_Test.py:75-90).
        """
        if mesh is None:
            mesh = self._obj_mesh(bucket)
        mesh_key = None if mesh is None else (
            tuple(mesh.axis_names), tuple(mesh.devices.shape))
        key = ("yt", raw_hw, in_size, out_size, bucket, batch, mesh_key)
        if key not in self._runners:
            def yt_pre(f, _hw=in_size):
                f = f.astype(jnp.float32) / 255.0
                if tuple(f.shape[-3:-1]) != _hw:
                    f = resize(f, _hw, "bicubic")
                return f

            runner = ChunkedVideoRunner(
                self._model_for(bucket), out_size,
                chunk=self.cfg.eval.chunk, injectable=True,
                preprocess=yt_pre, mesh=mesh,
            )
            # compile + chip-load every program outside the FPS span
            runner.warmup(self.variables, raw_hw, batch, bucket,
                          frame_dtype=jnp.uint8)
            self._runners[key] = runner
        return self._runners[key]

    @staticmethod
    def _yt_video_inputs(video, bucket):
        """Per-video runner inputs: (init_mask (Ho,Wo,bucket+1), active
        (bucket,), injections {t: (idx_map (Ho,Wo) uint8, new (bucket,)
        bool)}) — batch-free; callers stack along B."""
        init_mask = video.init_mask[..., : bucket + 1]
        active = np.zeros((bucket,), bool)
        # exact frame-0 slot list from meta.json (an annotated object may
        # have an empty frame-0 mask; counting nonzero channels would
        # activate the wrong slots)
        active[[s_ for s_ in video.init_slots if s_ < bucket]] = True

        injections = {}
        for t, inj in video.injections.items():
            Ho, Wo = video.original_size
            idx_map = np.zeros((Ho, Wo), np.uint8)
            new = np.zeros((bucket,), bool)
            for slot in inj["new_slots"]:
                if slot >= bucket:
                    continue  # over-budget slot (dataset already warned)
                idx_map[inj["mask"][..., slot + 1] > 0] = slot + 1
                new[slot] = True
            injections[t] = (idx_map, new)
        return init_mask, active, injections

    def _save_ytvos_video(self, writer, video, preds_tb):
        """Palette-PNG output with slot -> original-id remap
        (basic_evaluator.py:201-206); only annotated frames are saved."""
        out_dir = os.path.join(self.out_root, video.name)
        mkdir(out_dir)
        writer.submit(
            save_seg_mask, video.first_label,
            os.path.join(out_dir, f"{video.frame_names[0]}.png"),
            self.ytvos_palette,
        )
        slot_map = np.zeros(self.n_slots + 1, np.uint8)
        for slot, orig in enumerate(video.slot_to_orig):
            slot_map[slot + 1] = orig
        for t in range(1, video.frames.shape[0]):
            if video.frame_names[t] not in video.names_to_save:
                continue
            writer.submit(
                save_seg_mask, slot_map[preds_tb[t - 1]],
                os.path.join(out_dir, f"{video.frame_names[t]}.png"),
                self.ytvos_palette,
            )

    def evaluate_ytvos(self):
        """YTVOS inference: whole videos as injection-folded chunked scans.

        Object injection at appearance frames runs as traced elementwise
        ops inside the scan (engine.run_chunk inject_idx/inject_new), so
        every video — with or without mid-video objects — runs through the
        same compiled chunk programs (full chunks + exact binary-ladder
        tail), and the true final frame's memorize is skipped inside its
        chunk (swem_evaluator.py:104-148 semantics, including line 139's
        decode-only last frame).

        ``--video_batch > 1`` routes to the batched throughput mode — the
        flag is never silently ignored.
        """
        if self.cfg.eval.video_batch > 1:
            return self.evaluate_ytvos_batched(self.cfg.eval.video_batch)
        fps = FrameSecondMeter()
        rng = jax.random.PRNGKey(self.cfg.data.seed)

        my_indices = list(range(len(self.dataset)))[self._pid :: self._nproc]
        videos = prefetch(self.dataset.__getitem__, my_indices)
        with AsyncWriter() as writer:
            for seq_idx, video in zip(my_indices, videos):
                T = video.frames.shape[0]
                Ho, Wo = video.original_size
                bucket = self._slot_bucket(video.n_objs)
                raw_hw = tuple(video.frames.shape[1:3])
                in_size = tuple(video.in_size)
                self.logger.info(
                    f"Testing video {seq_idx}: {video.name} ({T} frames, "
                    f"raw {raw_hw} -> in {in_size}, out {video.original_size}, "
                    f"{video.n_objs} objs -> {bucket} slots)"
                )
                runner = self._yt_runner(raw_hw, in_size, (Ho, Wo), bucket)

                # host arrays throughout: the jitted chunk programs upload their
                # own slices (device-array slicing would compile per offset)
                init_mask, active, injections = self._yt_video_inputs(video, bucket)
                injections = {t: (m[None], n[None]) for t, (m, n) in injections.items()}

                fps.tic()
                preds = runner(self.variables, rng, video.frames[:, None],
                               init_mask[None], jnp.asarray(active[None]),
                               injections=injections)
                fps.toc(T)
                self._save_ytvos_video(writer, video, preds[:, 0])
        fps.end()
        self.logger.info(f"fps: {fps.fps}")
        return fps.fps

    def evaluate_ytvos_batched(self, vb: int):
        """YTVOS throughput mode: ``vb`` videos per device batch.

        The DAVIS batched strategy (evaluate_davis_batched) composed with
        the injection protocol: videos sharing (raw size, inference size,
        output size, slot bucket) are grouped from file HEADERS only
        (YTVOSTestSet.peek), sorted by length so batch-mates pad minimally,
        padded to a common length by repeating each video's final frame
        (extra predictions are discarded; padded frames only touch their
        own video's memory), and run through one injectable batched runner.
        Each video's injection schedule occupies its own batch row of the
        per-frame (B, Ho, Wo)/(B, N) scan inputs — an all-zero row is an
        exact no-op (engine.run_chunk), so schedules never interact.

        YTVOS's per-video native/inference-size spread means group sizes
        are data-dependent: a video whose shape signature repeats nowhere
        runs through its own B=1 runner (correct, just not faster); the
        throughput win applies wherever signatures repeat — the 2018/2019
        valid sets are dominated by a handful of resolutions, so most
        videos do group.
        """
        fps = FrameSecondMeter()
        rng = jax.random.PRNGKey(self.cfg.data.seed)

        from swem_tpu.parallel import derive_eval_mesh_extents, eval_devices

        devs = eval_devices()
        n_data, n_obj = derive_eval_mesh_extents(
            len(devs), self.cfg.eval.obj_parallel, vb)
        mesh = None
        if n_data * n_obj > 1:
            if n_obj > 1:
                mesh = "obj2d"  # bucket-clamped per group (see _obj_mesh)
            else:
                from swem_tpu.parallel import make_mesh

                mesh = make_mesh(n_data, devices=devs)
            self.logger.info(
                f"sharding video batches over {n_data} devices"
                + ("" if n_obj == 1 else f" x {n_obj} object shards"))

        # group by shape signature from headers only (no frame decode), sort
        # each group by length so batch-mates pad minimally
        groups: Dict[tuple, list] = {}
        for idx in range(len(self.dataset)):
            _, raw_hw, in_size, out_size, n_objs, n_frames = self.dataset.peek(idx)
            bucket = self._slot_bucket(n_objs)
            groups.setdefault((raw_hw, in_size, out_size, bucket), []).append(
                (idx, n_frames))

        plan = []
        for sig, items in groups.items():
            items.sort(key=lambda t: t[1])
            indices = [t[0] for t in items]
            plan += [(sig, indices[i : i + vb])
                     for i in range(0, len(indices), vb)]
        # multi-host: round-robin over whole batches (grouping preserved)
        plan = plan[self._pid :: self._nproc]
        decoded = prefetch(
            lambda p: (p[0], [self.dataset[j] for j in p[1]]), plan, depth=1)

        with AsyncWriter() as writer:
            for (raw_hw, in_size, out_size, bucket), batch_videos in decoded:
                B = len(batch_videos)
                T_max = max(v.frames.shape[0] for v in batch_videos)
                frames = np.stack([
                    np.concatenate(
                        [v.frames,
                         np.repeat(v.frames[-1:], T_max - v.frames.shape[0], 0)]
                    ) if v.frames.shape[0] < T_max else v.frames
                    for v in batch_videos
                ], axis=1)  # (T_max, B, H, W, 3) uint8 host
                per_video = [self._yt_video_inputs(v, bucket)
                             for v in batch_videos]
                init_mask = np.stack([pv[0] for pv in per_video])
                active = np.stack([pv[1] for pv in per_video])
                # merge per-video schedules into batched per-frame inputs:
                # video b writes only row b; other rows stay zero (no-ops)
                injections: Dict[int, tuple] = {}
                for b, (_, _, inj) in enumerate(per_video):
                    for t, (idx_map, new) in inj.items():
                        if t not in injections:
                            injections[t] = (
                                np.zeros((B,) + tuple(out_size), np.uint8),
                                np.zeros((B, bucket), bool),
                            )
                        injections[t][0][b] = idx_map
                        injections[t][1][b] = new

                group_mesh = None
                if mesh is not None and B % n_data == 0:
                    group_mesh = (self._obj_mesh(bucket, n_data=n_data)
                                  if mesh == "obj2d" else mesh)
                runner = self._yt_runner(raw_hw, in_size, out_size, bucket,
                                         batch=B, mesh=group_mesh)
                fps.tic()
                preds = runner(self.variables, rng, frames,
                               jnp.asarray(init_mask), jnp.asarray(active),
                               injections=injections)
                fps.toc(sum(v.frames.shape[0] for v in batch_videos))
                for b, v in enumerate(batch_videos):
                    self._save_ytvos_video(writer, v, preds[:, b])
                self.logger.info(
                    f"batch of {B} videos ({[v.name for v in batch_videos]}) "
                    f"done ({raw_hw} -> {in_size}, {bucket} slots)"
                )
        fps.end()
        self.logger.info(f"fps (throughput, video_batch={vb}): {fps.fps}")
        return fps.fps

    # ------------------------------------------------------------------ #
    def get_metrics(self, per_object_csv: bool = False
                    ) -> Optional[Dict[str, float]]:
        from swem_tpu.eval.benchmark import DavisEvaluation, write_reports

        if self.eval_set not in ("DAVIS16", "DAVIS17"):
            return None
        year = "2016" if self.eval_set == "DAVIS16" else "2017"
        ev = DavisEvaluation(self.cfg.eval.data_root, year=year, gt_set="val")
        metrics = ev.evaluate(self.out_root)
        return write_reports(metrics, self.save_dir, self.eval_set, self.logger,
                             per_object_csv=per_object_csv)

    def val(self) -> Optional[Dict[str, float]]:
        """Full evaluation flow (swem_evaluator.py:150-160).

        Multi-host: every process evaluates its video slice, all barrier,
        then process 0 alone computes metrics over the combined PNGs
        (shared filesystem assumed, as for checkpoints).
        """
        if "DAVIS" in self.eval_set:
            self.evaluate_davis()
            self._barrier("davis_pngs")
            if self.eval_set != "DAVIS17Test" and self._pid == 0:
                return self.get_metrics(
                    per_object_csv=self.cfg.eval.per_object_csv)
            return None
        self.evaluate_ytvos()
        self._barrier("ytvos_pngs")
        return None

    def _barrier(self, tag: str) -> None:
        if self._nproc > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"swem_eval_{tag}")
