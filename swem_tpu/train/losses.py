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
    """Per-pixel cross entropy restricted to valid channels. (B,T,H,W).

    The target log-prob is selected by one-hot multiply-sum over the small
    channel axis rather than ``take_along_axis``: XLA lowers the 1-element
    gather (and its backward scatter) to flat serialized ops costing tens of
    ms at training shapes; the compare+sum fuses into the log_softmax.

    Out-of-range targets (< 0 or >= C) have an all-zero one_hot row and so
    contribute exactly 0 loss — silently, unlike take_along_axis's clamp.
    The training loaders guarantee target in [0, C): labels are argmax over
    the (C)-channel one-hot masks. Callers feeding raw label maps must clamp
    ids to the slot budget first (as data/*_dataset.py do).
    """
    logp = jax.nn.log_softmax(_mask_logits(logits, valid_obj), axis=-1)
    onehot = jax.nn.one_hot(target, logits.shape[-1], dtype=logp.dtype)
    return -jnp.sum(logp * onehot, axis=-1)


def bootstrap_fraction(it: jnp.ndarray, start_warm: int, end_warm: int,
                       top_p: float) -> jnp.ndarray:
    """Annealed hardest-pixel fraction (bce_losses.py:45-48).

    1.0 before start_warm, then linear 1.0 -> top_p by end_warm.
    """
    frac = top_p + (1.0 - top_p) * (end_warm - it) / (end_warm - start_warm)
    frac = jnp.clip(frac, top_p, 1.0)
    return jnp.where(it < start_warm, 1.0, frac)


def _kth_largest_nonneg(rows: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Exact per-row k-th largest of non-negative f32 rows, sort-free.

    Non-negative IEEE-754 floats order like their bit patterns, so the k-th
    largest is found by setting the 32 bits of its pattern from the MSB
    down: keep a candidate bit iff at least ``k`` elements are >= it. 32
    compare+reduce passes instead of a sort — and, unlike sort, nothing
    here needs a backward permutation (the result is used under
    stop-gradient semantics).

    rows: (R, P) f32/f64 >= 0; k: () or (R,) int32 in [1, P].
    Returns (R,) — the exact k-th largest value of each row. The f64 branch
    (64 passes, uint64 patterns) exists for the f64 parity oracles; the
    production train step runs the 32-pass f32 branch.
    """
    uint = jnp.uint64 if rows.dtype == jnp.float64 else jnp.uint32
    nbits = jnp.dtype(uint).itemsize * 8
    bits = jax.lax.bitcast_convert_type(rows, uint)
    R = rows.shape[0]
    t = jnp.zeros((R,), uint)
    for b in range(nbits - 1, -1, -1):
        cand = t | uint(1 << b)
        cnt = jnp.sum((bits >= cand[:, None]).astype(jnp.int32), axis=-1)
        t = jnp.where(cnt >= k, cand, t)
    return jax.lax.bitcast_convert_type(t, rows.dtype)


def bootstrapped_ce(logits, target, it, valid_obj=None, *,
                    start_warm=20000, end_warm=70000, top_p=0.30):
    """Bootstrapped CE (bce_losses.py:7-50): mean over the top-p hardest pixels.

    Dynamic k under jit with NO sort: the per-row top-k sum equals
    ``sum(raw * (raw > t)) + t * (k - count(raw > t))`` where ``t`` is the
    exact k-th largest pixel loss (found bit-bisection style, see
    ``_kth_largest_nonneg``) — exact under ties, since the duplicate slots
    are filled by ``t`` itself. A full ``jnp.sort`` at training shapes cost
    16.6 ms forward (variadic, with iota companions for the autodiff
    permutation) plus a backward scatter; the threshold form is a handful
    of fused compare/sum passes. Exactly k pixels are selected at weight
    1/k, matching the sort/topk gradient structure: every pixel above the
    threshold, plus the first (in memory order) k - count(>t) of the
    t-valued pixels — the same "arbitrary tie subset" semantics as
    torch.topk, which only matters at random init where aggregation
    clamping saturates many pixels to identical CE values.
    Returns (loss, p).
    """
    B, T, H, W = target.shape
    # +0.0 normalizes any -0.0 pixels (bit-pattern ordering needs +0.0)
    raw = pixel_ce(logits, target, valid_obj).reshape(B, T, H * W) + 0.0
    p = bootstrap_fraction(it, start_warm, end_warm, top_p)
    k = jnp.floor(H * W * p).astype(jnp.int32)
    t = _kth_largest_nonneg(
        jax.lax.stop_gradient(raw).reshape(B * T, H * W), k
    ).reshape(B, T, 1)
    sel_gt = raw > t
    sel_eq = raw == t
    cnt_gt = jnp.sum(sel_gt.astype(jnp.int32), axis=-1, keepdims=True)
    eq_rank = jnp.cumsum(sel_eq.astype(jnp.int32), axis=-1)  # 1-based
    sel = jnp.logical_or(
        sel_gt, jnp.logical_and(sel_eq, eq_rank <= k - cnt_gt)
    ).astype(raw.dtype)
    topk_sum = jnp.sum(raw * sel, axis=-1)
    loss = jnp.sum(topk_sum) / (B * T * jnp.maximum(k, 1))
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


def lovasz_hinge_loss(logits, labels):
    """Binary Lovász hinge, flattened over the batch (lovasz_losses.py:76-112,
    per_image=False, no ignore class).

    logits: (...,) real-valued scores; labels: (...,) {0,1}. No reference
    config ever calls this (loss_map exposes only lovasz_softmax as aux) —
    ported for loss-surface completeness.
    """
    logits = logits.reshape(-1)
    labels = labels.reshape(-1).astype(logits.dtype)
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * jax.lax.stop_gradient(signs)
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    gt_sorted = labels[order]
    grad = _lovasz_grad(gt_sorted)
    return jnp.dot(nn_relu(errors_sorted), jax.lax.stop_gradient(grad))


def nn_relu(x):
    return jnp.maximum(x, 0.0)


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
