"""DAVIS J&F metrics — numpy implementation.

Same math as the official davis2017 evaluation package the reference vendors
(/root/reference/evaluation/davis2017/metrics.py:6-178, utils.py:136-162):

* ``jaccard``      — region similarity J with void handling (J=1 on empty union)
* ``boundary_f``   — contour F-measure via 1-pixel boundary maps dilated by a
                     disk of radius ceil(0.008 * image diagonal)
* ``statistics``   — (mean, recall@0.5, decay over 4 temporal bins)

Differences from the reference: modern numpy (no np.bool), a local ``disk``
structuring element (the reference pulls skimage), and vectorized boundary
extraction.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import cv2
import numpy as np


def disk(radius: int) -> np.ndarray:
    """Circular structuring element, matching skimage.morphology.disk."""
    r = int(radius)
    y, x = np.mgrid[-r : r + 1, -r : r + 1]
    return (x * x + y * y <= r * r).astype(np.uint8)


def jaccard(
    annotation: np.ndarray,
    segmentation: np.ndarray,
    void_pixels: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Region similarity J over the trailing two axes (metrics.py:6-37)."""
    assert annotation.shape == segmentation.shape
    ann = annotation.astype(bool)
    seg = segmentation.astype(bool)
    if void_pixels is None:
        valid = np.ones_like(seg)
    else:
        valid = ~void_pixels.astype(bool)
    inters = np.sum(seg & ann & valid, axis=(-2, -1))
    union = np.sum((seg | ann) & valid, axis=(-2, -1))
    with np.errstate(divide="ignore", invalid="ignore"):
        j = inters / union
    empty = np.isclose(union, 0)
    if j.ndim == 0:
        return np.asarray(1.0) if empty else j
    j[empty] = 1.0
    return j


def _boundary_map(seg: np.ndarray) -> np.ndarray:
    """1-pixel-wide boundary map, offset half a pixel toward the origin
    (the classic Martin bmap construction, metrics.py:124-178)."""
    seg = seg.astype(bool)
    e = np.zeros_like(seg)
    s = np.zeros_like(seg)
    se = np.zeros_like(seg)
    e[:, :-1] = seg[:, 1:]
    s[:-1, :] = seg[1:, :]
    se[:-1, :-1] = seg[1:, 1:]
    b = (seg ^ e) | (seg ^ s) | (seg ^ se)
    b[-1, :] = seg[-1, :] ^ e[-1, :]
    b[:, -1] = seg[:, -1] ^ s[:, -1]
    b[-1, -1] = False
    return b


def boundary_f(
    foreground: np.ndarray,
    gt: np.ndarray,
    void_pixels: Optional[np.ndarray] = None,
    bound_th: float = 0.008,
) -> float:
    """Contour F-measure for one frame (metrics.py:58-121)."""
    if void_pixels is not None:
        keep = ~void_pixels.astype(bool)
        foreground = foreground * keep
        gt = gt * keep
    radius = bound_th if bound_th >= 1 else math.ceil(
        bound_th * np.linalg.norm(foreground.shape)
    )
    fg_b = _boundary_map(foreground)
    gt_b = _boundary_map(gt)
    kernel = disk(radius)
    fg_dil = cv2.dilate(fg_b.astype(np.uint8), kernel)
    gt_dil = cv2.dilate(gt_b.astype(np.uint8), kernel)

    n_fg = fg_b.sum()
    n_gt = gt_b.sum()
    if n_fg == 0 and n_gt > 0:
        return 0.0  # precision 1, recall 0 -> F 0
    if n_fg > 0 and n_gt == 0:
        return 0.0  # precision 0, recall 1 -> F 0
    if n_fg == 0 and n_gt == 0:
        return 1.0
    precision = float((fg_b & (gt_dil > 0)).sum()) / n_fg
    recall = float((gt_b & (fg_dil > 0)).sum()) / n_gt
    if precision + recall == 0:
        return 0.0
    return 2.0 * precision * recall / (precision + recall)


def boundary_f_frames(
    annotation: np.ndarray,
    segmentation: np.ndarray,
    void_pixels: Optional[np.ndarray] = None,
    bound_th: float = 0.008,
) -> np.ndarray:
    """Per-frame F over a (T, H, W) stack (metrics.py:40-55)."""
    if annotation.ndim == 2:
        return np.asarray(
            boundary_f(segmentation, annotation, void_pixels, bound_th)
        )
    T = annotation.shape[0]
    out = np.zeros(T)
    for t in range(T):
        void_t = None if void_pixels is None else void_pixels[t]
        out[t] = boundary_f(segmentation[t], annotation[t], void_t, bound_th)
    return out


def statistics(per_frame: np.ndarray) -> Tuple[float, float, float]:
    """(mean, recall@0.5, decay) of a per-frame metric series (utils.py:136-162)."""
    with np.errstate(invalid="ignore"):
        M = np.nanmean(per_frame)
        O = np.nanmean(per_frame > 0.5)
    n = len(per_frame)
    ids = np.round(np.linspace(1, n, 5) + 1e-10) - 1
    ids = ids.astype(int)
    bins = [per_frame[ids[i] : ids[i + 1] + 1] for i in range(4)]
    with np.errstate(invalid="ignore"):
        D = np.nanmean(bins[0]) - np.nanmean(bins[3])
    return float(M), float(O), float(D)
