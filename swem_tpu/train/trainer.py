"""Training step — recurrent T-frame unroll with the EM memory carried
functionally (re-design of /root/reference/methods/SWEM/swem_trainer.py:59-108
and basic_trainer.py:192-307).

The torch trainer mutates hidden memory inside the module and backprops
through a Python loop; here the whole step (frame-0 init, T-1 supervised
decode steps, loss, grads, optimizer update) is a single pure function,
jit-compiled once. Data parallelism comes from sharding the batch over a
``Mesh`` 'data' axis — XLA inserts the gradient all-reduce (the NCCL DDP
equivalent of swem_trainer.py:42-43).

Batch layout (all channel-last):
  frames:    (B, T, H, W, 3) uint8, or float already in [0, 1]
  label:     (B, T, H, W) integer slot labels for all frames
  valid_obj: (B, N+1) float {0,1} validity incl. background channel
  masks:     optional (B, T, H, W, N+1) one-hot ground truth — derived
             in-graph from ``label`` when absent (the production loader
             ships the compact uint8 form; see _model_inputs)
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from swem_tpu.config import SWEMConfig
from swem_tpu.models import em
from swem_tpu.models.swem import (
    SWEM,
    at_least_f32,
    hard_mask_from_pred,
    prepare_em_masks,
)
from swem_tpu.ops.policy import resolve_use_pallas
from swem_tpu.train.losses import make_criterion


@struct.dataclass
class TrainState:
    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    step: jnp.ndarray  # () int32


def create_train_state(model: SWEM, rng: jax.Array, tx, sample_frame, sample_mask) -> TrainState:
    # jit the init: eager tracing of the full init forward is minutes on TPU
    variables = jax.jit(model.init)(rng, sample_frame, sample_mask)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def _model_inputs(batch: Dict[str, jnp.ndarray], n_slots: int):
    """Decompress a (possibly compact) batch into model inputs, in-graph.

    The loader ships uint8 frames and uint8 labels (8x fewer H2D bytes than
    f32 frames + f32 one-hot, and no host-side float conversion — the
    reference pays both on every batch, video_dataset.py:330-346); the
    [0,1] normalization and the frame-0 one-hot are derived here so XLA
    fuses them into the first consumers. f32 frames and an explicit
    "masks" key (hand-built test/script batches) pass through unchanged —
    uint8/255 in f32 is bit-identical to the host conversion it replaces.
    """
    frames = batch["frames"]
    if frames.dtype == jnp.uint8:
        frames = frames.astype(jnp.float32) / 255.0
    label = batch["label"].astype(jnp.int32)
    if "masks" in batch:
        init_mask = batch["masks"][:, 0]
    else:
        init_mask = (label[:, 0, ..., None]
                     == jnp.arange(n_slots, dtype=jnp.int32)).astype(jnp.float32)
    return frames, init_mask, label


def _unrolled_forward(model: SWEM, variables, frames, init_mask, valid_obj, rng,
                      sharding=None, remat=False):
    """Frame-0 init + supervised unroll over frames 1..T-1 (swem_trainer.py:59-91).

    Returns stacked logits (B, T-1, H, W, N+1). ``sharding``: optional
    ``parallel.EngineSharding`` — constrains the (B, N, ...) hand-off points
    so the per-object towers shard over a mesh 'obj' axis (object
    parallelism composed with data parallelism; the constraint transposes
    to itself under grad, so the backward towers shard identically).

    ``remat``: jax.checkpoint granularity — False (save all activations,
    fastest: 116.5 ms/step at bs8 384² bf16 on the v5e), 'encoder' (remat
    the key-trunk encode: +4% step time, -40% peak temp HBM at bs8 / -57%
    at bs12 — the capacity knob for bigger batches/resolutions), or
    True/'block' (whole frame block: measured strictly worse than
    'encoder' — slower AND higher peak). Full numbers + method in
    scripts/remat_mem.py and scripts/train_bench.py.
    """
    cfg = model.cfg

    def bn(x):  # (B, N, ...) constraint (no-op unsharded)
        return x if sharding is None else sharding.bn(x)

    def cmem(m):
        return m if sharding is None else sharding.mem(m)
    B, T, H, W, _ = frames.shape
    out_size = (H, W)
    active = valid_obj[:, 1:] > 0.5  # (B, N)

    def encode(variables, frame):
        return model.apply(variables, frame, method="encode_frame")

    if remat == "encoder":
        encode = jax.checkpoint(encode)

    # NOTE: batching all T frames' encodes into one (B*T) conv pass was
    # measured at 253.7 vs 247.3 ms/step — at B=8 the convs are already
    # efficient and the per-frame slices of the stacked features cost
    # copies, so frames encode per-step here (objects are still hoisted
    # via encode_frame/skip_feats/frame_stem).
    qk16, _, s16, _, _, vf0 = encode(variables, frames[:, 0])
    mv16 = bn(model.apply(variables, frames[:, 0], init_mask, s16, vf0,
                          method="encode_value"))
    h, w = qk16.shape[1:3]
    em_pallas = resolve_use_pallas(
        cfg.use_pallas, op="em", L=cfg.num_bases, n_objs=cfg.max_objs,
        P=h * w, train=True,
    )
    mem = cmem(em.fresh_memory(rng, B, cfg.max_objs, cfg.keydim, cfg.valdim,
                               cfg.num_bases))
    em_masks = prepare_em_masks(init_mask, at_least_f32(init_mask), (h, w))
    mem = em.memorize(
        mem,
        at_least_f32(qk16.reshape(B, h * w, -1)),
        at_least_f32(mv16.reshape(B, cfg.max_objs, h * w, -1)),
        em_masks, active, n_iters=cfg.num_em_iters, tau=cfg.em_tau,
        use_pallas=em_pallas,
    )
    mem = cmem(mem)

    def frame_block(variables, mem, frame, drop_rng, last):
        """One supervised step: encode -> match -> decode (-> memorize)."""
        qk16, qv16, s16, skip8, skip4, vf = encode(variables, frame)
        # train=True enables p_drop memory dropout (modules.py:258-263) when
        # configured; the 'memdrop' stream is unused (and free) at p_drop=0.
        context = bn(model.apply(
            variables, qk16, qv16, mem, True, method="match",
            rngs={"memdrop": drop_rng},
        ))
        logits, pred_mask = model.apply(
            variables, context, skip8, skip4, valid_obj[:, 1:], out_size,
            method="decode"
        )
        if not last:
            hard = hard_mask_from_pred(pred_mask)
            mv16 = bn(model.apply(variables, frame, pred_mask, s16, vf,
                                  method="encode_value"))
            em_masks = prepare_em_masks(hard, pred_mask, (h, w))
            mem = cmem(em.memorize(
                mem,
                at_least_f32(qk16.reshape(B, h * w, -1)),
                at_least_f32(mv16.reshape(B, cfg.max_objs, h * w, -1)),
                em_masks, active, n_iters=cfg.num_em_iters, tau=cfg.em_tau,
                use_pallas=em_pallas,
            ))
        return mem, logits

    from functools import partial

    whole_block = remat is True or remat == "block"
    blocks = {
        last: (jax.checkpoint(partial(frame_block, last=last)) if whole_block
               else partial(frame_block, last=last))
        for last in (False, True)
    }

    logits_list = []
    for i in range(1, T):
        mem, logits = blocks[i == T - 1](
            variables, mem, frames[:, i], jax.random.fold_in(rng, i))
        logits_list.append(logits)
    return jnp.stack(logits_list, axis=1)


def make_train_step(model: SWEM, cfg: SWEMConfig, tx, sharding=None,
                    remat=False) -> Callable:
    """Build the jittable train step: (state, batch, rng) -> (state, metrics).

    ``sharding``: optional ``parallel.EngineSharding`` to shard the unroll's
    per-object towers over a mesh 'obj' axis (composes with 'data' batch
    sharding; see _unrolled_forward). ``remat``: jax.checkpoint each frame
    block (see _unrolled_forward — bit-identical results, less activation
    HBM traffic, more recompute FLOPs).
    """
    criterion = make_criterion(cfg.loss)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        mem_rng = jax.random.fold_in(rng, state.step)

        frames, init_mask, label = _model_inputs(batch, model.cfg.max_objs + 1)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            logits = _unrolled_forward(
                model, variables, frames, init_mask,
                batch["valid_obj"], mem_rng, sharding=sharding, remat=remat,
            )
            losses = criterion(
                logits, label[:, 1:], state.step, batch["valid_obj"]
            )
            return losses["total_loss"], losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            batch_stats=state.batch_stats,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, losses

    return train_step


def make_predict_batch(model: SWEM, cfg: SWEMConfig) -> Callable:
    """Forward-only batch prediction for training visualization
    (basic_trainer.py:259-282 overlay grids)."""

    def predict(state: TrainState, batch, rng):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        frames, init_mask, _ = _model_inputs(batch, model.cfg.max_objs + 1)
        logits = _unrolled_forward(
            model, variables, frames, init_mask, batch["valid_obj"], rng,
        )
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)  # (B, T-1, H, W)

    return predict
