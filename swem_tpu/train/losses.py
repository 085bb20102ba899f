"""VOS training losses — vectorized JAX re-design.

Semantics of /root/reference/losses/ (bce_losses.py:7-136, __init__.py:15-63,
lovasz_losses.py:19-253) with the per-batch-element Python loops replaced by
channel masking: invalid object channels get -1e9 logits, which restricts the
softmax/CE to the valid channel subset exactly (targets never index invalid
channels).

Layout: logits (B, T, H, W, C) channel-last, target (B, T, H, W) int32,
valid_obj (B, C) float {0,1} including the background channel (always 1).
The bootstrapped top-p pixel selection uses a sort + rank mask so the
annealed fraction p can stay a traced scalar under one jit compilation.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e9


def _mask_logits(logits: jnp.ndarray, valid_obj: Optional[jnp.ndarray]) -> jnp.ndarray:
    if valid_obj is None:
        return logits
    return jnp.where(valid_obj[:, None, None, None, :] > 0.5, logits, _NEG_INF)


def pixel_ce(logits: jnp.ndarray, target: jnp.ndarray,
             valid_obj: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Per-pixel cross entropy restricted to valid channels. (B,T,H,W)."""
    logp = jax.nn.log_softmax(_mask_logits(logits, valid_obj), axis=-1)
    return -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]


def bootstrap_fraction(it: jnp.ndarray, start_warm: int, end_warm: int,
                       top_p: float) -> jnp.ndarray:
    """Annealed hardest-pixel fraction (bce_losses.py:45-48).

    1.0 before start_warm, then linear 1.0 -> top_p by end_warm.
    """
    frac = top_p + (1.0 - top_p) * (end_warm - it) / (end_warm - start_warm)
    frac = jnp.clip(frac, top_p, 1.0)
    return jnp.where(it < start_warm, 1.0, frac)


def bootstrapped_ce(logits, target, it, valid_obj=None, *,
                    start_warm=20000, end_warm=70000, top_p=0.30):
    """Bootstrapped CE (bce_losses.py:7-50): mean over the top-p hardest pixels.

    Dynamic k under jit: sort pixel losses descending and average the first
    k = floor(HW * p) via a rank mask (k is traced; shapes stay static).
    Returns (loss, p).
    """
    B, T, H, W = target.shape
    raw = pixel_ce(logits, target, valid_obj).reshape(B, T, H * W)
    p = bootstrap_fraction(it, start_warm, end_warm, top_p)
    k = jnp.floor(H * W * p).astype(jnp.int32)
    sorted_desc = -jnp.sort(-raw, axis=-1)
    ranks = jnp.arange(H * W)
    sel = (ranks[None, None, :] < k).astype(raw.dtype)
    loss = jnp.sum(sorted_desc * sel) / (B * T * jnp.maximum(k, 1))
    return loss, p


def plain_ce(logits, target, it, valid_obj=None, **_):
    """Plain CE (bce_losses.py:53-77). Returns (loss, 1.0)."""
    return jnp.mean(pixel_ce(logits, target, valid_obj)), jnp.asarray(1.0)


def mask_iou_loss(logits, target, valid_obj=None):
    """Soft mask-IoU auxiliary loss (bce_losses.py:109-136, __init__.py:49-56).

    pred = softmax over valid channels; per (b, t, channel): soft IoU with
    the one-hot target; averaged over valid channels and frames per batch
    element, then 1 - iou averaged over the batch.
    """
    B, T, H, W = target.shape
    C = logits.shape[-1]
    pred = jax.nn.softmax(_mask_logits(logits, valid_obj), axis=-1)
    tgt = jax.nn.one_hot(target, C, dtype=pred.dtype)
    inter = jnp.sum(jnp.minimum(pred, tgt), axis=(2, 3))  # (B, T, C)
    union = jnp.sum(jnp.maximum(pred, tgt), axis=(2, 3)) + 1e-6
    iou = inter / union
    if valid_obj is None:
        valid = jnp.ones((B, C), iou.dtype)
    else:
        valid = (valid_obj > 0.5).astype(iou.dtype)
    per_b = jnp.sum(iou * valid[:, None, :], axis=(1, 2)) / (
        T * jnp.maximum(jnp.sum(valid, axis=-1), 1.0)
    )
    return jnp.mean(1.0 - per_b)


def _lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovász extension w.r.t. sorted errors (Berman 2018)."""
    p = gt_sorted.shape[-1]
    gts = jnp.sum(gt_sorted, axis=-1, keepdims=True)
    cum = jnp.cumsum(gt_sorted, axis=-1)
    intersection = gts - cum
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=-1)
    jaccard = 1.0 - intersection / union
    if p > 1:
        jaccard = jnp.concatenate(
            [jaccard[..., :1], jaccard[..., 1:] - jaccard[..., :-1]], axis=-1
        )
    return jaccard


def lovasz_softmax_loss(logits, target, valid_obj=None):
    """Lovász-Softmax over present classes (lovasz_losses.py:157-201).

    Flattens all pixels (per_image=False); classes = 'present' expressed as
    a presence mask over the static channel axis. Probabilities are softmax
    over valid channels.
    """
    C = logits.shape[-1]
    pred = jax.nn.softmax(_mask_logits(logits, valid_obj), axis=-1)
    B = pred.shape[0]
    probas = pred.reshape(B, -1, C)  # (B, P, C)
    labels = target.reshape(B, -1)

    def per_image(prob, lab, vmask):
        fg = jax.nn.one_hot(lab, C, dtype=prob.dtype)  # (P, C)
        present = (jnp.sum(fg, axis=0) > 0) & (vmask > 0.5)
        errors = jnp.abs(fg - prob)  # (P, C)
        order = jnp.argsort(-errors, axis=0)
        err_sorted = jnp.take_along_axis(errors, order, axis=0)
        fg_sorted = jnp.take_along_axis(fg, order, axis=0)
        grad = _lovasz_grad(fg_sorted.T).T  # sort axis last for the helper
        per_class = jnp.sum(err_sorted * grad, axis=0)  # (C,)
        denom = jnp.maximum(jnp.sum(present), 1)
        return jnp.sum(jnp.where(present, per_class, 0.0)) / denom

    if valid_obj is None:
        vmask = jnp.ones((B, C), probas.dtype)
    else:
        vmask = valid_obj
    return jnp.mean(jax.vmap(per_image)(probas, labels, vmask))


MAIN_LOSSES = {"ce": plain_ce, "boots_ce": bootstrapped_ce}
AUX_LOSSES = {"iou": mask_iou_loss, "lovasz": lovasz_softmax_loss}


def make_criterion(loss_cfg):
    """Build the combined VOS loss (losses/__init__.py:15-63).

    Returns fn(logits, target, it, valid_obj) -> dict with total/main/aux/p.
    logits: (B, T, H, W, C); target: (B, T, H, W); valid_obj: (B, C) or None.
    """
    main_fn = MAIN_LOSSES[loss_cfg.name]
    aux_fn = AUX_LOSSES[loss_cfg.aux] if loss_cfg.aux else None
    start_warm, end_warm = loss_cfg.bs_period

    def criterion(logits, target, it, valid_obj=None) -> Dict[str, jnp.ndarray]:
        loss_main, p = main_fn(
            logits, target, it, valid_obj,
            start_warm=start_warm, end_warm=end_warm, top_p=loss_cfg.bs_ratio,
        )
        if aux_fn is not None:
            loss_aux = aux_fn(logits, target, valid_obj)
        else:
            loss_aux = jnp.asarray(0.0)
        total = loss_main + loss_cfg.aux_ratio * loss_aux
        return {
            "total_loss": total,
            "main_loss": loss_main,
            "aux_loss": loss_aux,
            "p": p,
        }

    return criterion
