"""Serialized inference artifacts (jax.export / StableHLO).

The reference has no deployment story beyond a pickled ``state_dict`` plus
the full Python model code to rebuild the module tree
(/root/reference/methods/__init__.py:26-38). The TPU-native equivalent of a
TorchScript export is ``jax.export``: every jitted inference program the
``ChunkedVideoRunner`` uses (memory init + one chunked scan per ladder size)
is lowered once to versioned, portable StableHLO and written to disk next to
the weights and a JSON manifest. Loading needs jax only — no flax module
re-trace, no model classes, no config plumbing — and XLA recompiles the
portable bytes for whatever backend is present (artifacts carry lowerings
for both ``cpu`` and ``tpu`` by default).

The EM memory crosses the program boundary as a flat tuple of arrays
(``jax.tree_util.tree_flatten`` order) so no custom-pytree serialization is
needed; the loader threads the tuple between calls without ever
reconstructing a ``VOSMemory``.

Layout of an artifact directory::

    manifest.json            shapes, dtypes, chunk ladder, provenance
    weights.msgpack          flax state-dict of {params, batch_stats}
    programs/init.stablehlo  frame-0 memory initialization
    programs/chunk_<k>.stablehlo   k-frame scan, one per ladder size
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization as flax_ser
from jax import export as jexport

FORMAT_VERSION = 1
_MANIFEST = "manifest.json"
_WEIGHTS = "weights.msgpack"
_PROGRAMS = "programs"


def _spec_tree(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tree
    )


def export_runner(
    model,
    variables,
    path: str,
    *,
    frame_hw: Tuple[int, int],
    out_size: Optional[Tuple[int, int]] = None,
    batch: int = 1,
    n_slots: Optional[int] = None,
    chunk: int = 16,
    frame_dtype=np.uint8,
    preprocess=None,
    scores: bool = False,
    injectable: bool = False,
    seed: int = 0,
    platforms: Tuple[str, ...] = ("cpu", "tpu"),
) -> None:
    """Export a ChunkedVideoRunner-equivalent inference pipeline to ``path``.

    ``frame_hw``/``frame_dtype`` describe the RAW frames the artifact will
    accept (before ``preprocess``); with ``preprocess=None`` and uint8
    frames, the standard uint8 -> /255 normalization is fused in (the DAVIS
    eval path's preprocess, eval/evaluator.py). The frame-0 random prototype
    draw is baked in from ``seed`` (it only warm-starts the first EM update
    and washes out against real data; see engine.init_memory).

    ``injectable`` exports the chunk programs with per-frame
    (inject_idx, inject_new) scan inputs for YTVOS mid-video object
    injection (swem_evaluator.py:124-130; see engine.run_chunk) — the
    deployed artifact then supports ``ExportedRunner(injections=...)`` and
    ``ExportedSession.add_objects``, at the cost of one extra uint8 index
    map per frame crossing the host link.
    """
    # model code is an EXPORT-time dependency only; artifacts reload with
    # jax alone (the loaders below never touch swem_tpu)
    from swem_tpu import engine

    cfg = model.cfg
    if n_slots is None:
        n_slots = cfg.max_objs
    if out_size is None:
        out_size = frame_hw
    frame_dtype = np.dtype(frame_dtype)
    if preprocess is None:
        if frame_dtype == np.uint8:
            def preprocess(f):
                return f.astype(jnp.float32) / 255.0
        else:
            def preprocess(f):
                return f
    pre = preprocess

    var_sd = flax_ser.to_state_dict(variables)
    h, w = frame_hw
    vspec = _spec_tree(var_sd)
    f0spec = jax.ShapeDtypeStruct((batch, h, w, 3), frame_dtype)
    mspec = jax.ShapeDtypeStruct(
        (batch,) + tuple(out_size) + (n_slots + 1,), np.float32)
    aspec = jax.ShapeDtypeStruct((batch, n_slots), np.bool_)

    def init_fn(var_sd, frame0, init_mask, active):
        mem = engine.init_memory(
            model, var_sd, jax.random.PRNGKey(seed), pre(frame0),
            init_mask, active,
        )
        return tuple(jax.tree_util.tree_leaves(mem))

    # the chunk program reconstructs the VOSMemory from the flat leaves via
    # the treedef observed at trace time (structure is static)
    mem_aval = jax.eval_shape(
        lambda v, f, m, a: engine.init_memory(
            model, v, jax.random.PRNGKey(seed), pre(f), m, a),
        vspec, f0spec, mspec, aspec,
    )
    mem_treedef = jax.tree_util.tree_structure(mem_aval)
    mem_specs = tuple(
        jax.ShapeDtypeStruct(l.shape, l.dtype)
        for l in jax.tree_util.tree_leaves(mem_aval)
    )

    if injectable:
        def chunk_fn(var_sd, mem_leaves, frames, active, final_mask,
                     inject_idx, inject_new):
            mem = jax.tree_util.tree_unflatten(mem_treedef, list(mem_leaves))
            mem, preds = engine.run_chunk(
                model, var_sd, mem, pre(frames), active, tuple(out_size),
                scores=scores, final_mask=final_mask,
                inject_idx=inject_idx, inject_new=inject_new,
            )
            # the scan also carries slot activations forward; return the
            # post-chunk flags so the replayer can thread them like the mem
            act = jnp.any(
                jnp.concatenate([active[None], inject_new], axis=0), axis=0)
            return tuple(jax.tree_util.tree_leaves(mem)), preds, act
    else:
        def chunk_fn(var_sd, mem_leaves, frames, active, final_mask):
            mem = jax.tree_util.tree_unflatten(mem_treedef, list(mem_leaves))
            mem, preds = engine.run_chunk(
                model, var_sd, mem, pre(frames), active, tuple(out_size),
                scores=scores, final_mask=final_mask,
            )
            return tuple(jax.tree_util.tree_leaves(mem)), preds

    os.makedirs(os.path.join(path, _PROGRAMS), exist_ok=True)
    plats = list(platforms)

    exp_init = jexport.export(jax.jit(init_fn), platforms=plats)(
        vspec, f0spec, mspec, aspec)
    with open(os.path.join(path, _PROGRAMS, "init.stablehlo"), "wb") as f:
        f.write(exp_init.serialize())

    # dedupe: chunk=1's ladder is [1] again — one program, one manifest entry
    sizes = list(dict.fromkeys([chunk] + engine.ladder_sizes(chunk)))
    for size in sizes:
        fspec = jax.ShapeDtypeStruct((size, batch, h, w, 3), frame_dtype)
        finspec = jax.ShapeDtypeStruct((size,), np.bool_)
        specs = (vspec, mem_specs, fspec, aspec, finspec)
        if injectable:
            specs = specs + (
                jax.ShapeDtypeStruct(
                    (size, batch) + tuple(out_size), np.uint8),
                jax.ShapeDtypeStruct((size, batch, n_slots), np.bool_),
            )
        exp = jexport.export(jax.jit(chunk_fn), platforms=plats)(*specs)
        with open(os.path.join(path, _PROGRAMS, f"chunk_{size}.stablehlo"),
                  "wb") as f:
            f.write(exp.serialize())

    with open(os.path.join(path, _WEIGHTS), "wb") as f:
        f.write(flax_ser.msgpack_serialize(
            jax.tree.map(np.asarray, var_sd)))

    manifest = {
        "format_version": FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": plats,
        "frame_hw": list(frame_hw),
        "out_size": list(out_size),
        "batch": batch,
        "n_slots": n_slots,
        "chunk": chunk,
        "sizes": sizes,
        "frame_dtype": frame_dtype.name,
        "scores": scores,
        "injectable": injectable,
        "seed": seed,
        "model_config": dataclasses.asdict(cfg),
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2, default=str)


class ExportedRunner:
    """Run an exported artifact — jax only, no model code.

    Mirrors ``ChunkedVideoRunner.__call__``'s contract: ``frames`` is a
    (T, B, H, W, 3) HOST numpy array of the manifest's dtype; returns
    (T-1, B, Ho, Wo) uint8 predictions on host (or stacked f32 scores on
    device when the artifact was exported with ``scores=True``).
    """

    def __init__(self, path: str):
        with open(os.path.join(path, _MANIFEST)) as f:
            self.manifest = json.load(f)
        m = self.manifest
        if m["format_version"] != FORMAT_VERSION:
            raise ValueError(
                f"artifact format {m['format_version']} != {FORMAT_VERSION}")
        with open(os.path.join(path, _WEIGHTS), "rb") as f:
            var_sd = flax_ser.msgpack_restore(f.read())
        # weights live on device once; every call reuses the handles
        self._vars = jax.device_put(var_sd)

        def _load(name):
            with open(os.path.join(path, _PROGRAMS, name), "rb") as f:
                exp = jexport.deserialize(f.read())
            return jax.jit(exp.call)

        self._init = _load("init.stablehlo")
        self._chunks = {k: _load(f"chunk_{k}.stablehlo") for k in m["sizes"]}
        self.frame_dtype = np.dtype(m["frame_dtype"])
        self.frame_hw = tuple(m["frame_hw"])
        self.out_size = tuple(m["out_size"])
        self.batch = m["batch"]
        self.n_slots = m["n_slots"]
        self.chunk = m["chunk"]
        self.scores = m["scores"]
        self.injectable = m.get("injectable", False)
        # the manifest stores [chunk] + its remainder ladder (deduped); the
        # replay loop below needs no model code to reconstruct it
        self._ladder = [s for s in m["sizes"] if s != self.chunk]

    def warmup(self) -> None:
        """Compile + chip-load every program outside any timed region."""
        B, (h, w), n = self.batch, self.frame_hw, self.n_slots
        f0 = np.zeros((B, h, w, 3), self.frame_dtype)
        mask = np.zeros((B,) + self.out_size + (n + 1,), np.float32)
        active = np.zeros((B, n), bool)
        mem = self._init(self._vars, f0, mask, active)
        for size in self._chunks:
            fc = np.zeros((size, B, h, w, 3), self.frame_dtype)
            fin = np.zeros((size,), bool)
            extra = ()
            if self.injectable:
                extra = (np.zeros((size, B) + self.out_size, np.uint8),
                         np.zeros((size, B, n), bool))
            out = self._chunks[size](self._vars, mem, fc, active, fin, *extra)
            mem, p = out[0], out[1]
            if self.scores:
                jax.block_until_ready(p)
            else:
                np.asarray(p)
        jax.block_until_ready(mem)

    def __call__(self, frames: np.ndarray, init_mask, active,
                 injections=None):
        """Replay a whole video. ``injections`` (needs an ``injectable``
        artifact): {frame_idx: (idx_map (B, Ho, Wo) uint8 slot-index map,
        new (B, N) bool)} — the ChunkedVideoRunner contract for YTVOS
        mid-video object injection."""
        frames = np.asarray(frames)
        if frames.dtype != self.frame_dtype:
            raise TypeError(
                f"artifact expects {self.frame_dtype} frames, got {frames.dtype}")
        if frames.shape[1:] != (self.batch,) + self.frame_hw + (3,):
            raise ValueError(
                f"artifact expects (T, {self.batch}, {self.frame_hw[0]}, "
                f"{self.frame_hw[1]}, 3) frames, got {frames.shape}")
        if injections and not self.injectable:
            raise ValueError(
                "injections need an artifact exported with injectable=True")
        injections = injections or {}
        T, B = frames.shape[:2]
        init_mask = np.asarray(init_mask, np.float32)
        active = np.asarray(active, bool)
        mem = self._init(self._vars, frames[0], init_mask, active)
        if T == 1:
            if self.scores:
                n_ch = init_mask.shape[-1]
                return jnp.zeros(
                    (0, B) + self.out_size + (n_ch,), jnp.float32)
            return np.zeros((0, B) + self.out_size, np.uint8)

        preds = []
        t = 1

        def run_sub(mem, active, t, size):
            fin = np.zeros((size,), bool)
            if t + size == T:
                fin[-1] = True  # final frame: memorize skipped in-scan
            args = (self._vars, mem, frames[t : t + size], active, fin)
            if self.injectable:
                inj_idx = np.zeros((size, B) + self.out_size, np.uint8)
                inj_new = np.zeros((size, B, self.n_slots), bool)
                for j in range(size):
                    inj = injections.get(t + j)
                    if inj is not None:
                        inj_idx[j], inj_new[j] = inj
                mem, p, active = self._chunks[size](*args, inj_idx, inj_new)
            else:
                mem, p = self._chunks[size](*args)
            preds.append(p)
            return mem, active, t + size

        while t + self.chunk <= T:
            mem, active, t = run_sub(mem, active, t, self.chunk)
        for size in self._ladder:
            if t + size <= T:
                mem, active, t = run_sub(mem, active, t, size)
        if self.scores:
            return jnp.concatenate(preds, axis=0)
        return np.concatenate(
            [np.asarray(p, dtype=np.uint8) for p in preds], axis=0)


class ExportedSession:
    """Online per-frame streaming from the SAME artifact.

    The chunk ladder always bottoms out at a 1-frame scan, so every
    exported artifact already contains a single-frame
    match -> decode -> memorize program; threading the memory through it
    frame by frame reproduces ``swem_tpu.serve.StreamingSession``'s
    start/push contract (single-video, batch-1 artifacts) with jax alone.
    Artifacts exported with ``injectable=True`` additionally support
    ``add_objects`` — the YTVOS mid-stream injection protocol
    (swem_evaluator.py:124-130), matching the live session's method.
    """

    def __init__(self, path: str):
        self._r = ExportedRunner(path)
        if self._r.batch != 1:
            raise ValueError("streaming replay wants a batch=1 artifact")
        if self._r.scores:
            raise ValueError("streaming replay wants a uint8 (scores=False) "
                             "artifact")
        self._step = self._r._chunks[1]
        self._fin = np.zeros((1,), bool)
        self._mem = None
        self._active = None
        self._frame_count = 0
        self.n_slots = self._r.n_slots
        self.frame_hw = self._r.frame_hw
        self.out_size = self._r.out_size

    def warmup(self) -> None:
        self._r.warmup()

    def start(self, frame0: np.ndarray, init_mask: np.ndarray) -> None:
        """Seed the memory. frame0 (H,W,3) of the artifact dtype; init_mask
        (Ho,Wo) uint8 labels (0 = background, 1..n = objects; ids beyond
        the slot budget drop to background)."""
        frame0 = np.asarray(frame0)
        if frame0.dtype != self._r.frame_dtype:
            raise TypeError(f"artifact expects {self._r.frame_dtype} frames, "
                            f"got {frame0.dtype}")
        labels = np.asarray(init_mask)
        # clip BEFORE one-hotting: ids beyond the slot budget must fall to
        # background (channel 0 == 1.0), the data.davis_test.to_onehot
        # contract — a bare ==arange would zero the whole pixel vector,
        # silently corrupting the background value encoding
        labels = np.where(labels <= self.n_slots, labels, 0)
        onehot = (labels[..., None] ==
                  np.arange(self.n_slots + 1)).astype(np.float32)
        active = np.zeros((1, self.n_slots), bool)
        present = np.unique(labels)
        for obj in present[present > 0]:  # post-clip: every id <= n_slots
            active[0, obj - 1] = True
        self._active = active
        self._mem = self._r._init(
            self._r._vars, frame0[None], onehot[None], active)
        self._frame_count = 1

    def push(self, frame: np.ndarray) -> np.ndarray:
        """Segment one frame and update the memory. Returns (Ho,Wo) uint8."""
        if self._mem is None:
            raise RuntimeError("call start() first")
        frame = np.asarray(frame)
        if frame.dtype != self._r.frame_dtype:
            raise TypeError(f"artifact expects {self._r.frame_dtype} frames, "
                            f"got {frame.dtype}")
        extra = ()
        if self._r.injectable:
            # an all-False inject_new row is an exact no-op in-program
            extra = (np.zeros((1, 1) + self.out_size, np.uint8),
                     np.zeros((1, 1, self.n_slots), bool))
        out = self._step(
            self._r._vars, self._mem, frame[None, None], self._active,
            self._fin, *extra)
        self._mem, pred = out[0], out[1]
        self._frame_count += 1
        # slice AFTER the host transfer (device-array indexing compiles a
        # one-off gather program per offset)
        return np.asarray(pred)[0, 0]

    def add_objects(self, frame: np.ndarray, mask: np.ndarray,
                    new_ids) -> np.ndarray:
        """Mid-stream object injection (the YTVOS protocol,
        swem_evaluator.py:124-130) — needs an ``injectable`` artifact.

        Matches ``serve.StreamingSession.add_objects``: ``mask`` is a
        (Ho,Wo) uint8 label map containing the new objects; ``new_ids`` are
        their label values. Predictions under the new objects are replaced
        by the ground truth before the memorize, and the new slots join the
        active set for all later frames."""
        if self._mem is None:
            raise RuntimeError("call start() first")
        if not self._r.injectable:
            raise ValueError(
                "add_objects needs an artifact exported with injectable=True")
        frame = np.asarray(frame)
        if frame.dtype != self._r.frame_dtype:
            raise TypeError(f"artifact expects {self._r.frame_dtype} frames, "
                            f"got {frame.dtype}")
        labels = np.asarray(mask)
        labels = np.where(labels <= self.n_slots, labels, 0).astype(np.uint8)
        inew = np.zeros((1, 1, self.n_slots), bool)
        for obj in new_ids:
            if not 1 <= obj <= self.n_slots:
                raise ValueError(f"object id {obj} out of slot budget")
            inew[0, 0, obj - 1] = True
        self._mem, pred, act = self._step(
            self._r._vars, self._mem, frame[None, None], self._active,
            self._fin, labels[None, None], inew)
        self._active = np.asarray(act)
        self._frame_count += 1
        return np.asarray(pred)[0, 0]

    @property
    def frames_seen(self) -> int:
        return self._frame_count
