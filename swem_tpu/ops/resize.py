"""Image resizing with exact torch ``F.interpolate`` semantics.

The reference pipeline leans on torch interpolation at many points
(mask down/upsampling in memorize: /root/reference/methods/SWEM/swem.py:80-81,
decoder output resize: networks.py:215, eval-time frame resize:
basic_evaluator.py:160, soft-mask resize: swem_evaluator.py:91). J&F parity
requires bit-matching those conventions, which differ from
``jax.image.resize``:

* ``nearest``  — legacy torch: src = floor(dst * in/out)
* ``bilinear`` (align_corners=False) — half-pixel centers, negative source
  coordinates clamped to 0
* ``bicubic``  (align_corners=False) — cubic convolution A=-0.75 with border
  replication, no clamping of the source coordinate

All functions operate on channel-last arrays ``(..., H, W, C)`` and are
built from static gathers + weighted sums, which XLA fuses cleanly on TPU.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    # torch computes the source index in float32 (scalar_t for float tensors)
    scale = np.float32(in_size / out_size)
    idx = np.floor(np.arange(out_size, dtype=np.float32) * scale).astype(np.int32)
    return np.clip(idx, 0, in_size - 1)


def _linear_weights(in_size: int, out_size: int):
    """Half-pixel source coords; torch clamps negatives to 0 before floor.

    All coordinate arithmetic in float32 to bit-match torch CPU/GPU kernels.
    """
    scale = np.float32(in_size) / np.float32(out_size)
    src = (np.arange(out_size, dtype=np.float32) + np.float32(0.5)) * scale - np.float32(0.5)
    src = np.maximum(src, np.float32(0.0))
    i0 = np.floor(src).astype(np.int32)
    i0 = np.minimum(i0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0.astype(np.float32)).astype(np.float32)
    return i0, i1, w1


def _cubic_kernel(x: np.ndarray, A: float = -0.75) -> np.ndarray:
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w = np.where(
        ax <= 1.0,
        (A + 2.0) * ax3 - (A + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, A * ax3 - 5.0 * A * ax2 + 8.0 * A * ax - 4.0 * A, 0.0),
    )
    return w


def _cubic_weights(in_size: int, out_size: int):
    scale = np.float32(in_size) / np.float32(out_size)
    src = (np.arange(out_size, dtype=np.float32) + np.float32(0.5)) * scale - np.float32(0.5)
    i0 = np.floor(src).astype(np.int32)
    t = (src - i0.astype(np.float32)).astype(np.float32)
    idxs = np.stack([i0 - 1, i0, i0 + 1, i0 + 2], axis=-1)  # (out, 4)
    idxs = np.clip(idxs, 0, in_size - 1).astype(np.int32)
    offs = np.stack([1.0 + t, t, 1.0 - t, 2.0 - t], axis=-1)
    w = _cubic_kernel(offs).astype(np.float32)  # (out, 4)
    return idxs, w


def _resize_axis_nearest(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    idx = _nearest_indices(x.shape[axis], out_size)
    return jnp.take(x, jnp.asarray(idx), axis=axis)


def _resize_axis_linear(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    i0, i1, w1 = _linear_weights(in_size, out_size)
    x0 = jnp.take(x, jnp.asarray(i0), axis=axis)
    x1 = jnp.take(x, jnp.asarray(i1), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = jnp.asarray(w1, x.dtype).reshape(shape)
    return x0 * (1.0 - w) + x1 * w


def _resize_axis_cubic(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    idxs, w = _cubic_weights(in_size, out_size)
    shape = [1] * x.ndim
    shape[axis] = out_size
    out = None
    for tap in range(4):
        xt = jnp.take(x, jnp.asarray(idxs[:, tap]), axis=axis)
        wt = jnp.asarray(w[:, tap], x.dtype).reshape(shape)
        out = xt * wt if out is None else out + xt * wt
    return out


@lru_cache(maxsize=None)
def _dense_weights(in_size: int, out_size: int, method: str):
    """(out, in) dense interpolation matrix (rows have <= 4 nonzeros)."""
    w = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    if method == "bilinear":
        i0, i1, w1 = _linear_weights(in_size, out_size)
        np.add.at(w, (rows, i0), 1.0 - w1)
        np.add.at(w, (rows, i1), w1)
    else:  # bicubic
        idxs, ws = _cubic_weights(in_size, out_size)
        for tap in range(4):
            np.add.at(w, (rows, idxs[:, tap]), ws[:, tap])
    return w


def _resize_axis_matmul(x: jnp.ndarray, axis: int, out_size: int, method: str):
    """Interpolate one axis as a dense matmul — rides the MXU instead of
    VPU gathers (the interpolation matrices are tiny: <= out x in f32)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    w = jnp.asarray(_dense_weights(in_size, out_size, method))
    x = jnp.moveaxis(x, axis, -1)
    # adding the zero-weight taps is IEEE-exact, so this matches the gather
    # path up to reduction-order ulps
    y = jnp.einsum("...i,oi->...o", x, w.astype(x.dtype),
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(y, -1, axis)


@partial(jax.jit, static_argnames=("size", "method", "via_matmul"))
def resize(x: jnp.ndarray, size, method: str = "bilinear",
           via_matmul: bool = False) -> jnp.ndarray:
    """Resize the (-3, -2) spatial axes of ``x`` (..., H, W, C) to ``size``.

    method in {'nearest', 'bilinear', 'bicubic'} with torch
    ``F.interpolate(..., align_corners=False)`` semantics (nearest = legacy).
    ``via_matmul=True`` interpolates via dense matrices on the MXU; measured
    slightly slower than the gather path at 480p (90.8 vs 93.3 FPS
    end-to-end on v5e) because parity needs HIGHEST-precision f32 matmuls —
    kept as an option for bf16-tolerant pipelines.
    """
    h, w = size
    ax_h, ax_w = x.ndim - 3, x.ndim - 2
    if method == "nearest":
        x = _resize_axis_nearest(x, ax_h, h)
        x = _resize_axis_nearest(x, ax_w, w)
        return x
    if method == "bilinear":
        if via_matmul:
            x = _resize_axis_matmul(x, ax_h, h, "bilinear")
            return _resize_axis_matmul(x, ax_w, w, "bilinear")
        x = _resize_axis_linear(x, ax_h, h)
        x = _resize_axis_linear(x, ax_w, w)
        return x
    if method == "bicubic":
        if via_matmul:
            x = _resize_axis_matmul(x, ax_h, h, "bicubic")
            return _resize_axis_matmul(x, ax_w, w, "bicubic")
        x = _resize_axis_cubic(x, ax_h, h)
        x = _resize_axis_cubic(x, ax_w, w)
        return x
    raise ValueError(f"unknown resize method: {method}")


def resize_nchw(x: jnp.ndarray, size, method: str = "bilinear") -> jnp.ndarray:
    """Convenience wrapper for (..., C, H, W) arrays."""
    x = jnp.moveaxis(x, -3, -1)
    x = resize(x, size, method)
    return jnp.moveaxis(x, -1, -3)
