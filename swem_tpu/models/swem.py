"""SWEM top-level network (re-design of /root/reference/methods/SWEM/swem.py).

The torch reference is a stateful nn.Module with a mode-dispatching forward
and memory hidden in ``self.swem_core.memories``. Here the network is a flax
module exposing the five pure stages as methods, and the EM memory is an
explicit ``VOSMemory`` pytree threaded by the caller (see engine.py) — the
shape JAX needs for ``lax.scan`` over frames.

Object-axis convention: all multi-object tensors are padded to a static
``max_objs`` with per-object validity flags. Masks are channel-last
``(B, H, W, N+1)`` with channel 0 = background.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from swem_tpu.config import ModelConfig
from swem_tpu.models import em
from swem_tpu.models.decoder import Decoder
from swem_tpu.models.encoders import KeyEncoder, KeyProjection, ValueEncoder
from swem_tpu.models.layers import GLUFusion, conv3x3
from swem_tpu.ops.policy import resolve_use_pallas
from swem_tpu.models.resnet import BACKBONE_FEATURES
from swem_tpu.ops.resize import resize


def _dtype_of(cfg: ModelConfig):
    if cfg.dtype == "bfloat16":
        return jnp.bfloat16
    if cfg.dtype == "float64":
        # test-only (requires jax.enable_x64): the composed full-model
        # parity oracle runs the whole network in f64
        return jnp.float64
    return jnp.float32


def at_least_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Promote to >= f32 (bf16 -> f32) without truncating f64.

    EM statistics and mask math run in f32 minimum; the f64 parity oracle
    must keep f64 end-to-end, so these casts promote instead of hard-casting
    to f32 (with x64 disabled, f64 inputs cannot occur in production).
    """
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


class SWEM(nn.Module):
    """Encoders + EM fusion + decoder (swem.py:9-132)."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = _dtype_of(cfg)
        self.key_encoder = KeyEncoder(cfg.backbone, name="key_encoder", dtype=dtype)
        self.key_proj = KeyProjection(cfg.keydim, name="key_proj", dtype=dtype)
        # Compress f16 for decoding (swem.py:33)
        self.key_comp = conv3x3(cfg.valdim, name="key_comp", dtype=dtype)
        self.value_encoder = ValueEncoder(
            single_object=cfg.single_object, valdim=cfg.valdim,
            name="value_encoder", dtype=dtype,
        )
        self.fusion = GLUFusion(cfg.valdim, name="fusion", dtype=dtype)
        self.decoder = Decoder(cfg.mdim, name="decoder", dtype=dtype)

    # ------------------------------------------------------------------ #
    def encode_key(self, frame):
        """frame (B,H,W,3) -> (qk16, qv16, s16, s8, s4) (swem.py:39-43)."""
        s16, s8, s4 = self.key_encoder(frame)
        qk16 = self.key_proj(s16)
        qv16 = self.key_comp(s16)
        return qk16, qv16, s16, s8, s4

    def encode_frame(self, frame):
        """All frame-only (memory-independent) features in one pass.

        Returns (qk16, qv16, s16, skip8, skip4, vf): ``encode_key`` outputs,
        the decoder's skip convolutions (Decoder.skip_feats) and the value
        encoder's stem-conv frame slice (ValueEncoder.frame_stem). None of
        these depend on the EM memory or predictions, so the inference
        engine computes them here — once per frame, batchable across frames
        — instead of per object inside the sequential loop.
        """
        qk16, qv16, s16, s8, s4 = self.encode_key(frame)
        skip8, skip4 = self.decoder.skip_feats(s8, s4)
        vf = self.value_encoder.frame_stem(frame)
        return qk16, qv16, s16, skip8, skip4, vf

    def encode_value(self, frame, masks, s16, vf=None):
        """Per-object value features (swem.py:45-62).

        frame (B,H,W,3); masks (B,H,W,N+1) soft, channel 0 = bg;
        s16 (B,h16,w16,Cf); vf: optional precomputed stem frame slice
        (ValueEncoder.frame_stem). Returns mv16 (B,N,h16,w16,valdim).
        Objects are folded into the batch dim (the reference's
        expand+flatten), so one conv tower runs for all objects.
        """
        B, H, W, _ = frame.shape
        N = masks.shape[-1] - 1
        mask_fg = jnp.moveaxis(masks[..., 1:], -1, 1)[..., None]  # (B,N,H,W,1)
        mask_ot = 1.0 - mask_fg - masks[..., 0][:, None, :, :, None]
        frame_n = jnp.broadcast_to(frame[:, None], (B, N, H, W, 3))
        s16_n = jnp.broadcast_to(s16[:, None], (B, N) + s16.shape[1:])

        def fold(t):
            return t.reshape((B * N,) + t.shape[2:])

        vf_n = None
        if vf is not None:
            vf_n = fold(jnp.broadcast_to(vf[:, None], (B, N) + vf.shape[1:]))
        if self.cfg.single_object:
            mv = self.value_encoder(fold(frame_n), fold(s16_n), fold(mask_fg),
                                    frame_stem=vf_n)
        else:
            mv = self.value_encoder(fold(frame_n), fold(s16_n), fold(mask_fg),
                                    fold(mask_ot), frame_stem=vf_n)
        return mv.reshape((B, N) + mv.shape[1:])

    def match(self, qk16, qv16, mem: em.VOSMemory, train: bool = False):
        """Memory read + GLU fusion -> object context (modules.py:278-293).

        qk16 (B,h,w,Ck); qv16 (B,h,w,Cv). Returns context (B,N,h,w,Cv).
        ``train=True`` enables p_drop memory dropout (modules.py:258-263)
        when cfg.p_drop > 0, drawing from the 'memdrop' rng stream.
        """
        B, h, w, Ck = qk16.shape
        mk, mv, base_valid = em.gather_memory(mem)
        N = mk.shape[1]
        qk_flat = at_least_f32(qk16.reshape(B, h * w, Ck))
        drop_rng = (
            self.make_rng("memdrop") if train and self.cfg.p_drop > 0 else None
        )
        mem_out, S = em.read_memory(
            qk_flat, mk, mv, base_valid,
            tau=self.cfg.em_tau, topl=self.cfg.topl_eff,
            n_kernel=self.cfg.n_kernel, sigma=self.cfg.kernel_sigma, hw=(h, w),
            p_drop=self.cfg.p_drop if train else 0.0, drop_rng=drop_rng,
            use_pallas=resolve_use_pallas(
                self.cfg.use_pallas, op="read", L=self.cfg.num_bases,
                n_objs=N, P=h * w, train=train,
            ),
            differentiable=train,
        )
        Cv = mem_out.shape[-1]
        qv = jnp.broadcast_to(
            at_least_f32(qv16.reshape(B, 1, h * w, Cv)), mem_out.shape
        )
        feats = jnp.concatenate([mem_out, qv, S], axis=-1)  # (B,N,P,2Cv+2topl)
        feats = feats.reshape(B * N, h, w, feats.shape[-1])
        dtype = _dtype_of(self.cfg)
        context = self.fusion(feats.astype(dtype))
        return context.reshape(B, N, h, w, Cv)

    def decode(self, context, skip8, skip4, valid_obj, out_size: Tuple[int, int]):
        """Per-object logits -> soft-aggregated multi-object mask (swem.py:92-108).

        context (B,N,h,w,Cv); skip8/skip4: precomputed ``Decoder.skip_feats``
        outputs at batch B (broadcast over objects here — the broadcast fuses
        into the merge add); valid_obj (B,N) or None.
        Returns (logits (B,Ho,Wo,N+1), pred_mask (B,Ho,Wo,N+1)).
        """
        B, N = context.shape[:2]

        def fold(t):
            t = jnp.broadcast_to(t[:, None], (B, N) + t.shape[1:])
            return t.reshape((B * N,) + t.shape[2:])

        logit = self.decoder.decode_with_skips(
            context.reshape((B * N,) + context.shape[2:]), fold(skip8), fold(skip4),
            out_size,
        )  # (BN, Ho, Wo, 1)
        preds = nn.sigmoid(logit)[..., 0].reshape(B, N, *out_size)
        preds = jnp.moveaxis(preds, 1, -1)  # (B, Ho, Wo, N)
        if valid_obj is not None:
            preds = preds * valid_obj[:, None, None, :]
        logits = aggregate(preds)
        pred_mask = nn.softmax(logits, axis=-1)
        return logits, pred_mask

    def __call__(self, frame, masks, out_size=None):
        """Init-only forward touching every submodule (for parameter init)."""
        out_size = out_size or frame.shape[1:3]
        qk16, qv16, s16, skip8, skip4, _vf = self.encode_frame(frame)
        masks_in = resize(masks.astype(jnp.float32), frame.shape[1:3], "nearest")
        mv16 = self.encode_value(frame, masks_in, s16)
        B, h, w, Ck = qk16.shape
        N = masks.shape[-1] - 1
        mem = em.fresh_memory(
            self.make_rng("memory") if self.has_rng("memory") else jax.random.PRNGKey(0),
            B, N, self.cfg.keydim, self.cfg.valdim, self.cfg.num_bases,
        )
        em_masks = prepare_em_masks(masks, masks, (h, w))
        mem = em.memorize(
            mem, qk16.reshape(B, h * w, Ck).astype(jnp.float32),
            mv16.reshape(B, N, h * w, self.cfg.valdim).astype(jnp.float32),
            em_masks, jnp.ones((B, N), bool),
            n_iters=self.cfg.num_em_iters, tau=self.cfg.em_tau,
        )
        context = self.match(qk16, qv16, mem)
        return self.decode(context, skip8, skip4, None, out_size)


def aggregate(prob: jnp.ndarray) -> jnp.ndarray:
    """Soft-aggregation of per-object probabilities (swem.py:110-116).

    prob (B,H,W,N) fg probabilities -> logits (B,H,W,N+1) with bg channel 0:
    bg = prod(1 - p); logit = log(p / (1 - p)) after clamping.
    """
    bg = jnp.prod(1.0 - prob, axis=-1, keepdims=True)
    new_prob = jnp.clip(jnp.concatenate([bg, prob], axis=-1), 1e-7, 1.0 - 1e-7)
    return jnp.log(new_prob / (1.0 - new_prob))


def prepare_em_masks(
    masks_hard: jnp.ndarray, masks_soft: jnp.ndarray, size16: Tuple[int, int]
) -> jnp.ndarray:
    """Build the [bg, fg] EM pixel weights at 1/16 (swem.py:77-84).

    masks_hard/masks_soft: (B, H, W, N+1) (possibly different H,W).
    fg = nearest(hard) * bilinear(soft); bg = (1-hard)*(1-soft).
    Returns (B, N, 2, P) with P = h16*w16.
    """
    hard = resize(at_least_f32(masks_hard[..., 1:]), size16, "nearest")
    soft = resize(at_least_f32(masks_soft[..., 1:]), size16, "bilinear")
    fg = hard * soft
    bg = (1.0 - hard) * (1.0 - soft)
    stacked = jnp.stack([bg, fg], axis=1)  # (B, 2, h, w, N)
    B, _, h, w, N = stacked.shape
    return jnp.moveaxis(stacked, -1, 1).reshape(B, N, 2, h * w)


def prepare_em_masks_from_idx(
    pred_idx: jnp.ndarray, masks_soft: jnp.ndarray, size16: Tuple[int, int]
) -> jnp.ndarray:
    """``prepare_em_masks`` from the argmax index map (inference fast path).

    pred_idx: (B, Ho, Wo) integer argmax of the prediction;
    masks_soft: (B, H, W, N+1). Equivalent to building the full-resolution
    one-hot and nearest-resizing it (both are per-pixel gathers, so nearest
    resize commutes with one-hot), but skips the (Ho, Wo, N+1) one-hot
    materialization — an ~0.8 ms/frame gather+copy at 480p in the round-1
    profile.
    """
    idx16 = resize(pred_idx[..., None], size16, "nearest")[..., 0]
    n_ch = masks_soft.shape[-1]
    hard = (
        idx16[..., None].astype(jnp.int32) == jnp.arange(1, n_ch, dtype=jnp.int32)
    ).astype(jnp.promote_types(masks_soft.dtype, jnp.float32))  # (B, h, w, N)
    soft = resize(at_least_f32(masks_soft[..., 1:]), size16, "bilinear")
    fg = hard * soft
    bg = (1.0 - hard) * (1.0 - soft)
    stacked = jnp.stack([bg, fg], axis=1)  # (B, 2, h, w, N)
    B, _, h, w, N = stacked.shape
    return jnp.moveaxis(stacked, -1, 1).reshape(B, N, 2, h * w)


def hard_mask_from_pred(pred_mask: jnp.ndarray) -> jnp.ndarray:
    """One-hot argmax over the object axis (swem_trainer.py:80-85).

    pred_mask (B,H,W,N+1) -> one-hot float (B,H,W,N+1). Built by channel
    comparison rather than an ``eye``-gather (XLA lowers the gather to a
    slow scatter-shaped op at 480p; the compare fuses).
    """
    n_ch = pred_mask.shape[-1]
    idx = jnp.argmax(pred_mask, axis=-1)
    return (
        idx[..., None].astype(jnp.int32) == jnp.arange(n_ch, dtype=jnp.int32)
    ).astype(pred_mask.dtype)


def model_feature_dims(cfg: ModelConfig):
    """(f16, f8, f4) channel dims of the configured backbone."""
    return BACKBONE_FEATURES[cfg.backbone]
