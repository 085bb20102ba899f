"""Frame-sequential inference engine.

Functional re-design of the reference's evaluator inner loops
(/root/reference/methods/SWEM/swem_evaluator.py:59-148): the EM memory is an
explicit ``VOSMemory`` carried either through per-frame jitted steps (used by
the evaluator, which interleaves host-side PNG output and YouTube-VOS object
injection) or through a whole-video ``lax.scan`` (used for benchmarking and
the DAVIS fast path — the entire video runs on-device in one XLA program).

Static-shape strategy: the object axis is padded to ``max_objs``; per-frame
``active`` flags select live slots. Mid-video object injection
(swem_evaluator.py:124-130) becomes a channel-select on the padded mask.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from swem_tpu.models import em
from swem_tpu.models.swem import (
    SWEM,
    at_least_f32,
    prepare_em_masks,
    prepare_em_masks_from_idx,
)
from swem_tpu.ops.policy import resolve_use_pallas
from swem_tpu.ops.resize import resize


def _flat_qk(qk16):
    B, h, w, Ck = qk16.shape
    return at_least_f32(qk16.reshape(B, h * w, Ck))


def _flat_mv(mv16):
    B, N, h, w, Cv = mv16.shape
    return at_least_f32(mv16.reshape(B, N, h * w, Cv))


def init_memory(
    model: SWEM,
    variables,
    rng: jax.Array,
    frame0: jnp.ndarray,
    init_mask: jnp.ndarray,
    active: jnp.ndarray,
    sharding=None,
) -> em.VOSMemory:
    """Frame-0 memory initialization (swem_evaluator.py:65-69, swem.py:64-67).

    frame0: (B, H, W, 3) at inference size; init_mask: (B, Ho, Wo, N+1) hard
    one-hot at output size (memorize interpolates it to 1/16 itself);
    active: (B, N) live-object flags. ``sharding``: optional
    ``parallel.EngineSharding`` for object-parallel execution.
    """
    cfg = model.cfg
    qk16, _, s16, _, _ = model.apply(variables, frame0, method="encode_key")
    in_size = frame0.shape[1:3]
    init_mask_in = resize(at_least_f32(init_mask), in_size, "nearest")
    mv16 = model.apply(variables, frame0, init_mask_in, s16, method="encode_value")
    if sharding is not None:
        mv16 = sharding.bn(mv16)
    B, h, w, _ = qk16.shape
    # The random prototype draw is shared across the batch so a video's
    # result is independent of its batch position (video_batch throughput
    # mode matches sequential mode up to f32 batched-conv reduction-order
    # ties at the argmax). The draw only warm-starts the first EM update
    # (zita=1e-6) and washes out against real data.
    one = em.fresh_memory(rng, 1, cfg.max_objs, cfg.keydim, cfg.valdim, cfg.num_bases)
    mem = jax.tree.map(lambda t: jnp.broadcast_to(t, (B,) + t.shape[1:])
                       if t.ndim > 0 else t, one)
    if sharding is not None:
        mem = sharding.mem(mem)
    em_masks = prepare_em_masks(init_mask, at_least_f32(init_mask), (h, w))
    mem = em.memorize(
        mem, _flat_qk(qk16), _flat_mv(mv16), em_masks, active,
        n_iters=cfg.num_em_iters, tau=cfg.em_tau,
        use_pallas=resolve_use_pallas(
            cfg.use_pallas, op="em", L=cfg.num_bases, n_objs=cfg.max_objs,
            P=h * w,
        ),
    )
    return sharding.mem(mem) if sharding is not None else mem


def encode_keys_batched(model: SWEM, variables, frames: jnp.ndarray):
    """Key-encode a whole frame stack in one batched conv pass.

    frames: (T, B, H, W, 3) -> per-frame key tuples shaped (T, B, ...).

    The key encoder depends only on the frame (never on the EM memory), so
    hoisting it out of the sequential frame loop and folding T into the conv
    batch dim trades nothing for a large MXU-utilization win: 2.9 ms/frame
    at B=1 vs 0.8 ms/frame at B=16 for the R50 tower at 480x864 on v5e (the
    per-frame path keeps the MXU idle while weights stream per conv op).
    """
    T, B = frames.shape[:2]
    flat = frames.reshape((T * B,) + frames.shape[2:])
    keys = model.apply(variables, flat, method="encode_frame")
    return tuple(k.reshape((T, B) + k.shape[1:]) for k in keys)


def step(
    model: SWEM,
    variables,
    mem: em.VOSMemory,
    frame: jnp.ndarray,
    active: jnp.ndarray,
    out_size: Tuple[int, int],
    *,
    do_memorize: bool = True,
    inject_mask: Optional[jnp.ndarray] = None,
    inject_new: Optional[jnp.ndarray] = None,
    keys=None,
    sharding=None,
):
    """One inference frame (swem_evaluator.py:72-101).

    frame: (B, H, W, 3); active: (B, N) slots live *before* this frame;
    inject_mask/(B,Ho,Wo,N+1) + inject_new/(B,N): ground-truth masks for
    objects appearing at this frame (YTVOS, swem_evaluator.py:124-130).
    ``keys``: optionally this frame's precomputed ``encode_frame`` 6-tuple
    (qk16, qv16, s16, skip8, skip4, vf) — NOT ``encode_key`` output; see
    ``encode_keys_batched``.

    Returns (mem, pred_idx (B,Ho,Wo) uint8, pred_mask (B,Ho,Wo,N+1)).
    """
    cfg = model.cfg
    if keys is None:
        keys = model.apply(variables, frame, method="encode_frame")
    qk16, qv16, s16, skip8, skip4, vf = keys
    context = model.apply(variables, qk16, qv16, mem, method="match")
    if sharding is not None:
        context = sharding.bn(context)
    _, pred_mask = model.apply(
        variables, context, skip8, skip4, active.astype(jnp.float32), out_size,
        method="decode",
    )

    if inject_mask is not None:
        # zero predictions under newly-injected objects, then overwrite the
        # new slots' channels with the provided ground truth
        new_any = jnp.sum(inject_mask[..., 1:], axis=-1, keepdims=True) > 0
        pred_mask = jnp.where(new_any, 0.0, pred_mask)
        ch_sel = jnp.concatenate(
            [jnp.zeros((inject_new.shape[0], 1), bool), inject_new], axis=-1
        )
        pred_mask = jnp.where(ch_sel[:, None, None, :], inject_mask, pred_mask)
        active = jnp.logical_or(active, inject_new)

    # uint8: the slot budget is < 256 and predictions cross the host link
    pred_idx = jnp.argmax(pred_mask, axis=-1).astype(jnp.uint8)

    if do_memorize:
        mem = _memorize_from_pred(
            model, variables, mem, frame, active, qk16, s16, vf,
            pred_idx, pred_mask, sharding=sharding,
        )

    return mem, pred_idx, pred_mask


def _memorize_from_pred(model, variables, mem, frame, active,
                        qk16, s16, vf, pred_idx, pred_mask, sharding=None):
    """Value-encode the predicted mask and EM-update the memory
    (swem_evaluator.py:91-93 re-encode + memorize)."""
    cfg = model.cfg
    in_size = frame.shape[1:3]
    soft_in = resize(pred_mask, in_size, "bilinear")
    mv16 = model.apply(variables, frame, soft_in, s16, vf, method="encode_value")
    if sharding is not None:
        mv16 = sharding.bn(mv16)
    h, w = qk16.shape[1:3]
    # the hard mask enters EM only at 1/16: one-hot after the nearest
    # resize instead of materializing the (Ho, Wo, N+1) one-hot
    em_masks = prepare_em_masks_from_idx(pred_idx, soft_in, (h, w))
    mem = em.memorize(
        mem, _flat_qk(qk16), _flat_mv(mv16), em_masks, active,
        n_iters=cfg.num_em_iters, tau=cfg.em_tau,
        use_pallas=resolve_use_pallas(
            cfg.use_pallas, op="em", L=cfg.num_bases, n_objs=cfg.max_objs,
            P=h * w,
        ),
    )
    return sharding.mem(mem) if sharding is not None else mem


def run_video(
    model: SWEM,
    variables,
    rng: jax.Array,
    frames: jnp.ndarray,
    init_mask: jnp.ndarray,
    active: jnp.ndarray,
    out_size: Tuple[int, int],
) -> jnp.ndarray:
    """Whole-video inference as one on-device ``lax.scan``.

    frames: (T, B, H, W, 3); init_mask: (B, Ho, Wo, N+1); active: (B, N).
    Returns pred indices (T-1, B, Ho, Wo) uint8 for frames 1..T-1.

    The final frame's memorize is skipped via run_chunk's traced
    ``final_mask``, like the reference (swem_evaluator.py:90-93) — the
    post-video memory is never read, so this is a pure speed win.

    Memory note: the whole video's frame features are pre-encoded at once
    (~40 MB/frame in bf16 at 480p), so this single-program API is for
    benchmarking/tests and bounded-length clips; production evaluation goes
    through ``ChunkedVideoRunner``, which bounds feature memory by the
    chunk size.
    """
    mem0 = init_memory(model, variables, rng, frames[0], init_mask, active)
    T = frames.shape[0]
    if T == 1:
        B = frames.shape[1]
        return jnp.zeros((0, B) + tuple(out_size), jnp.uint8)

    final = jnp.arange(T - 1) == T - 2
    _, preds = run_chunk(model, variables, mem0, frames[1:], active, out_size,
                         final_mask=final)
    return preds


def run_video_scores(
    model: SWEM,
    variables,
    rng: jax.Array,
    frames: jnp.ndarray,
    init_mask: jnp.ndarray,
    active: jnp.ndarray,
    out_size: Tuple[int, int],
) -> jnp.ndarray:
    """Whole-video inference returning soft scores (multi-scale/flip eval).

    Like ``run_video`` but stacks pred_mask (T-1, B, Ho, Wo, N+1); the
    evaluator averages scores over scales/flips before the argmax
    (swem_evaluator.py:34-57). The final frame's memorize is skipped,
    matching the reference (swem_evaluator.py:90-93) and ``run_video``.
    """
    mem0 = init_memory(model, variables, rng, frames[0], init_mask, active)
    T = frames.shape[0]
    if T == 1:
        B, n_ch = frames.shape[1], init_mask.shape[-1]
        return jnp.zeros((0, B) + tuple(out_size) + (n_ch,), jnp.float32)

    final = jnp.arange(T - 1) == T - 2
    _, scores = run_chunk(model, variables, mem0, frames[1:], active, out_size,
                          scores=True, final_mask=final)
    return scores


def run_chunk(
    model: SWEM,
    variables,
    mem: em.VOSMemory,
    frames: jnp.ndarray,
    active: jnp.ndarray,
    out_size: Tuple[int, int],
    scores: bool = False,
    final_mask: Optional[jnp.ndarray] = None,
    inject_idx: Optional[jnp.ndarray] = None,
    inject_new: Optional[jnp.ndarray] = None,
    sharding=None,
) -> Tuple[em.VOSMemory, jnp.ndarray]:
    """Scan a fixed-size chunk of frames, carrying the memory.

    frames: (C, B, H, W, 3). Returns (mem, preds) with preds either
    (C, B, Ho, Wo) uint8 indices or, with ``scores``, (C, B, Ho, Wo, N+1)
    f32 soft masks (multi-scale/flip averaging needs the scores).

    ``final_mask`` (C,) bool marks the video's true final frame: its
    memorize is skipped under a traced ``lax.cond`` (the post-video memory
    is never read, swem_evaluator.py:90-93). A traced flag — rather than a
    separate decode-only program — keeps one compiled scan per chunk size
    AND avoids the solo final step, whose standalone decode picked
    pathological layouts (~15 ms/video in the round-2 trace).

    ``inject_idx`` (C, B, Ho, Wo) uint8 slot-index maps + ``inject_new``
    (C, B, N) bool fold YTVOS mid-video object injection
    (swem_evaluator.py:124-130) into the scan: a frame's ground-truth
    overwrite of newly-appearing slots runs as cheap traced elementwise ops
    (an all-False ``inject_new`` row is an exact no-op), and ``active`` —
    the slot state at the chunk's FIRST frame — is carried through the scan
    so later frames see the activation. One compiled scan per chunk size
    therefore serves plain and injection frames alike.

    Chunking keeps compilation independent of video length: full chunks run
    under one compiled scan, the remainder through a binary ladder of
    smaller chunks (see ChunkedVideoRunner). The chunk's key features are
    encoded in one batched conv pass before the scan (the key encoder never
    depends on the memory; see ``encode_keys_batched``).
    """
    keys = encode_keys_batched(model, variables, frames)
    if final_mask is None:
        final_mask = jnp.zeros((frames.shape[0],), bool)
    injectable = inject_idx is not None

    def body(carry, xs):
        mem, active = carry
        if injectable:
            frame, k, is_final, inj_idx, inj_new = xs
        else:
            frame, k, is_final = xs
        qk16, qv16, s16, skip8, skip4, vf = k
        context = model.apply(variables, qk16, qv16, mem, method="match")
        if sharding is not None:
            context = sharding.bn(context)
        _, pred_mask = model.apply(
            variables, context, skip8, skip4, active.astype(jnp.float32),
            out_size, method="decode",
        )
        if injectable:
            # zero predictions under newly-injected objects, then write the
            # new slots' ground-truth channels (swem_evaluator.py:124-130)
            n = pred_mask.shape[-1] - 1
            slots = jnp.arange(1, n + 1, dtype=jnp.int32)
            new_hot = jnp.logical_and(
                inj_idx[..., None].astype(jnp.int32) == slots,
                inj_new[:, None, None, :],
            )  # (B, Ho, Wo, N) one-hot GT of the newly-appearing slots
            new_any = jnp.any(new_hot, axis=-1, keepdims=True)
            pred_mask = jnp.where(new_any, 0.0, pred_mask)
            ch_sel = jnp.concatenate(
                [jnp.zeros((inj_new.shape[0], 1), bool), inj_new], axis=-1
            )
            inj_full = jnp.concatenate(
                [jnp.zeros_like(new_hot[..., :1]), new_hot], axis=-1
            ).astype(pred_mask.dtype)
            pred_mask = jnp.where(ch_sel[:, None, None, :], inj_full, pred_mask)
            active = jnp.logical_or(active, inj_new)
        pred_idx = jnp.argmax(pred_mask, axis=-1).astype(jnp.uint8)
        mem = jax.lax.cond(
            is_final,
            lambda m: m,
            lambda m: _memorize_from_pred(
                model, variables, m, frame, active, qk16, s16, vf,
                pred_idx, pred_mask, sharding=sharding,
            ),
            mem,
        )
        return (mem, active), (pred_mask if scores else pred_idx)

    if sharding is not None:
        mem = sharding.mem(mem)
    xs = (frames, keys, final_mask)
    if injectable:
        xs = xs + (inject_idx, inject_new)
    (mem, _), preds = jax.lax.scan(body, (mem, active), xs)
    return mem, preds


def ladder_sizes(chunk: int):
    """Descending powers of two below ``chunk``.

    Greedy selection over distinct powers {2^k, ..., 2, 1} covers ANY
    remainder < 2^(k+1) >= chunk (binary representation), so the tail
    decomposition is exact for every chunk size — starting at chunk//2
    would leave gaps for non-power-of-two chunks (chunk=6 -> [3, 1]
    cannot represent remainders 2 or 5).
    """
    s = 1
    while s * 2 < chunk:
        s *= 2
    sizes = []
    while s >= 1:
        sizes.append(s)
        s //= 2
    return sizes


class ChunkedVideoRunner:
    """Compile-once-per-(chunk,out_size) whole-video inference.

    Avoids per-frame dispatch overhead, per-video-length recompilation, AND
    wasted tail compute: frames 1..T-1 run through fixed-size scan chunks —
    the remainder through a binary ladder of power-of-two chunks (exact
    binary decomposition, zero padded frames) — and the final frame's
    memorize is skipped via a traced flag inside its chunk (the post-video
    memory is never read, swem_evaluator.py:90-93; see run_chunk's
    ``final_mask``).

    ``scores=True`` emits (T-1, B, Ho, Wo, N+1) f32 soft masks as a device
    array (the multi-scale/flip path accumulates on device and only ships
    the argmax across the host link); default emits uint8 indices on host.

    ``preprocess`` (e.g. uint8 -> /255 -> bicubic scale resize) is fused
    into each fixed-shape jitted program, so per-video frame counts never
    trigger preprocessing recompiles inside the timed span.
    """

    def __init__(self, model: SWEM, out_size: Tuple[int, int], chunk: int = 16,
                 scores: bool = False, preprocess=None, mesh=None,
                 injectable: bool = False):
        """``mesh``: optional device mesh. A 1-D 'data' mesh shards the
        video-batch dim, so B videos evaluate concurrently on B/n_devices
        chips each carrying an independent memory (multi-chip throughput
        eval; the computation follows the input shardings, no collectives
        needed — every video is independent). A mesh with an 'obj' axis
        (``parallel.make_mesh2``) additionally shards the padded object
        slots: the per-object value-encoder/fusion/decoder towers split
        across chips with one all-gather per frame at the soft-aggregation
        (see ``parallel.EngineSharding``) — multi-chip *latency* for
        many-object videos, composable with 'data'. 'obj' must divide the
        model's ``max_objs``.

        ``injectable``: compile the chunk programs with per-frame
        (inject_idx, inject_new) scan inputs for YTVOS mid-video object
        injection (see run_chunk). Costs one (C, B, Ho, Wo) uint8 upload
        per chunk (mostly zeros; ~ms on PCIe hosts), so the DAVIS path
        keeps it off."""
        self.model = model
        self.out_size = out_size
        self.chunk = chunk
        self.scores = scores
        self.mesh = mesh
        self.injectable = injectable
        esh = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as Pspec

            data = "data" if "data" in mesh.axis_names else None
            self._shard_b = NamedSharding(mesh, Pspec(data))      # (B, ...)
            self._shard_tb = NamedSharding(mesh, Pspec(None, data))  # (T, B, ...)
            self._shard_rep = NamedSharding(mesh, Pspec())        # replicated
            self._vars_cache = (None, None)  # (variables ref, replicated copy)
            if "obj" in mesh.axis_names:
                from swem_tpu.parallel import EngineSharding

                esh = EngineSharding(mesh)
                if model.cfg.max_objs % esh.n_obj:
                    raise ValueError(
                        f"max_objs={model.cfg.max_objs} not divisible by "
                        f"the mesh 'obj' axis ({esh.n_obj})")
        pre = preprocess if preprocess is not None else (lambda f: f)
        self._init = jax.jit(
            lambda v, r, f, m, a: init_memory(model, v, r, pre(f), m, a,
                                              sharding=esh)
        )
        if injectable:
            self._chunk = jax.jit(
                lambda v, mem, f, a, fin, ii, inw: run_chunk(
                    model, v, mem, pre(f), a, out_size, scores=scores,
                    final_mask=fin, inject_idx=ii, inject_new=inw,
                    sharding=esh,
                ),
                donate_argnums=(1,),
            )
        else:
            self._chunk = jax.jit(
                lambda v, mem, f, a, fin: run_chunk(
                    model, v, mem, pre(f), a, out_size, scores=scores,
                    final_mask=fin, sharding=esh,
                ),
                donate_argnums=(1,),
            )
        self._pre = pre

    def _mesh_vars(self, variables):
        """Replicate the variables over the mesh (cached per pytree).

        Checkpoint-restored variables arrive COMMITTED to one device
        (orbax gives SingleDeviceSharding arrays); jitting them together
        with mesh-sharded inputs is an error ("incompatible devices"), so
        they must be explicitly replicated. ``model.init`` outputs are
        uncommitted and would auto-replicate, but going through the same
        device_put is free for them and keeps one code path. Cached by
        pytree identity: the evaluator calls with the same variables dict
        every video.
        """
        key, rep = self._vars_cache
        # identity via a held strong reference — caching a raw id() would
        # silently serve stale weights if the old dict were GC'd and a new
        # checkpoint's dict reused its id
        if key is not variables:
            rep = jax.device_put(variables, self._shard_rep)
            self._vars_cache = (variables, rep)
        return rep

    def _ladder(self):
        return ladder_sizes(self.chunk)

    def warmup(self, variables, frame_hw, batch: int, n_slots: int,
               frame_dtype=jnp.float32):
        """Compile AND load init + every chunk-scan program (full + ladder).

        Executes each program once on zeros rather than ``lower().compile()``:
        on this stack the AOT compile does not populate the jit dispatch
        cache (the first real call recompiled — measured 134 s inside the
        FPS span), a pre-compiled executable lazily loads onto the chip on
        first use (~6 s), and the first bulk device->host fetch initializes
        the transfer path (~28 s through the dev tunnel). A dummy execution
        + prediction fetch pays all of it here, outside any timed region. ``frame_hw``/``frame_dtype`` describe the
        RAW frames handed to __call__ (before ``preprocess``).
        """
        h, w = frame_hw
        f0 = jnp.zeros((batch, h, w, 3), frame_dtype)
        m = jnp.zeros((batch,) + tuple(self.out_size) + (n_slots + 1,),
                      jnp.float32)
        a = jnp.zeros((batch, n_slots), jnp.bool_)
        if self.mesh is not None:
            f0 = jax.device_put(f0, self._shard_b)
            m = jax.device_put(m, self._shard_b)
            a = jax.device_put(a, self._shard_b)
            variables = self._mesh_vars(variables)
        rng = jax.random.PRNGKey(0)
        mem = self._init(variables, rng, f0, m, a)
        for size in [self.chunk] + self._ladder():
            fc = jnp.zeros((size, batch, h, w, 3), frame_dtype)
            if self.mesh is not None:
                fc = jax.device_put(fc, self._shard_tb)
            fin = jnp.zeros((size,), jnp.bool_)
            extra = ()
            if self.injectable:
                extra = (
                    jnp.zeros((size, batch) + tuple(self.out_size), jnp.uint8),
                    jnp.zeros((size, batch, n_slots), jnp.bool_),
                )
                if self.mesh is not None:
                    # same committed sharding the real calls use, or the jit
                    # cache misses and the first real chunk recompiles
                    extra = tuple(jax.device_put(e, self._shard_tb)
                                  for e in extra)
            # mem is donated and a fresh one returned, so the dummy memory
            # chains through every program; fetching the predictions also
            # initializes the lazy device->host path per output shape
            # (scores mode keeps its f32 stacks on device, so only sync)
            mem, p = self._chunk(variables, mem, fc, a, fin, *extra)
            if self.scores:
                jax.block_until_ready(p)
            else:
                np.asarray(p)
        jax.block_until_ready(mem.mem_count)

    def __call__(self, variables, rng, frames, init_mask, active,
                 injections=None):
        """frames: (T, B, H, W, 3) HOST array (numpy, commonly uint8).

        Keep frames on host: the runner slices them per chunk, and host
        slices are free views, whereas slicing a device array compiles (and
        chip-loads) a fresh executable per static offset — seconds per
        slice on a tunneled dev box, milliseconds-but-nonzero anywhere.
        Each chunk program uploads its own slice (uint8 recommended: 4x
        less transfer, normalized by ``preprocess`` on device).

        ``injections`` (requires ``injectable=True``): {frame_idx:
        (idx_map (B, Ho, Wo) uint8 slot-index map, new (B, N) bool)} —
        ground-truth masks of objects appearing at that frame (YTVOS,
        swem_evaluator.py:124-130). ``active`` is the frame-0 slot state;
        later activations happen inside the traced scans, with the host
        mirroring them between chunks.

        Returns preds for frames 1..T-1: (T-1, B, Ho, Wo) uint8 on host, or
        (T-1, B, Ho, Wo, N+1) f32 on device with ``scores=True``.
        """
        if isinstance(frames, jax.Array):
            raise TypeError(
                "ChunkedVideoRunner wants HOST frames (numpy): a device-"
                "resident video would round-trip device->host->device "
                "(~50 MB/s on tunneled platforms). Pass np.asarray(frames) "
                "explicitly if that is really intended."
            )
        frames = np.asarray(frames) if not isinstance(frames, np.ndarray) else frames
        if injections and not self.injectable:
            raise ValueError("injections require ChunkedVideoRunner(injectable=True)")
        injections = injections or {}
        T = frames.shape[0]
        B = frames.shape[1]
        n_slots = np.asarray(active).shape[-1]
        host_active = np.asarray(active)
        if self.mesh is not None:
            # pin the batch dim's sharding; the whole video pipeline then
            # runs data-parallel (computation follows the input shardings)
            init_mask = jax.device_put(init_mask, self._shard_b)
            active = jax.device_put(active, self._shard_b)
            variables = self._mesh_vars(variables)
        mem = self._init(variables, rng, frames[0] if self.mesh is None
                         else jax.device_put(frames[0], self._shard_b),
                         init_mask, active)
        if T == 1:  # only the annotated frame: nothing to predict
            if self.scores:
                n_ch = init_mask.shape[-1]
                return jnp.zeros((0, B) + tuple(self.out_size) + (n_ch,), jnp.float32)
            return np.zeros((0, B) + tuple(self.out_size), np.uint8)

        def run_sub(mem, active, t, size):
            fin = np.zeros((size,), bool)
            if t + size == T:
                fin[-1] = True  # the video's true final frame: skip memorize
            fc = frames[t : t + size]
            if self.mesh is not None:
                fc = jax.device_put(fc, self._shard_tb)
            extra = ()
            if self.injectable:
                inj_idx = np.zeros((size, B) + tuple(self.out_size), np.uint8)
                inj_new = np.zeros((size, B, n_slots), bool)
                for j in range(size):
                    inj = injections.get(t + j)
                    if inj is not None:
                        inj_idx[j], inj_new[j] = inj
                if self.mesh is not None:
                    # batch-dim sharding like the frames (dim 1 of (C, B, ...))
                    extra = (jax.device_put(inj_idx, self._shard_tb),
                             jax.device_put(inj_new, self._shard_tb))
                else:
                    extra = (jnp.asarray(inj_idx), jnp.asarray(inj_new))
            return self._chunk(variables, mem, fc, active, jnp.asarray(fin),
                               *extra)

        preds = []
        t = 1

        def advance(mem, active, host_active, t, size):
            mem, p = run_sub(mem, active, t, size)
            # keep the device handle: fetching here would serialize each
            # chunk's device->host prediction transfer with the next
            # chunk's compute. All chunks are dispatched first (async), the
            # fetches below then stream while the device runs ahead.
            preds.append(p)
            # mirror in-scan slot activations for the next chunk's input
            changed = False
            for j in range(size):
                inj = injections.get(t + j)
                if inj is not None:
                    host_active = np.logical_or(host_active, inj[1])
                    changed = True
            if changed:
                active = jnp.asarray(host_active)
                if self.mesh is not None:
                    active = jax.device_put(active, self._shard_b)
            return mem, active, host_active, t + size

        while t + self.chunk <= T:
            mem, active, host_active, t = advance(
                mem, active, host_active, t, self.chunk)
        for size in self._ladder():
            if t + size <= T:
                mem, active, host_active, t = advance(
                    mem, active, host_active, t, size)
        if self.scores:
            return jnp.concatenate(preds, axis=0)
        return np.concatenate([np.asarray(p, dtype=np.uint8) for p in preds],
                              axis=0)
