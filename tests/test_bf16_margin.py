"""bf16-vs-f32 deployment margin at flagship dims (pre-data proxy).

Every published FPS number runs the conv towers in bf16 while the torch
reference evaluates in f32 (methods/SWEM/swem.py — no autocast at eval).
Real-weight J&F cannot be computed in this image (no datasets/checkpoints),
so this is the pre-data proxy: full-video predictions at flagship channel
dims (R50 trunk, keydim 128, valdim 512, L=128, topl 64) must be nearly
invariant to the compute dtype.

Recorded margins (CPU, this box, random init — the WORST case for
stability: EM's tau=0.05 exponentials amplify rounding into different
basin assignments on degenerate pixels; trained weights have larger
score margins):

* random frames, 160x280, T=8: argmax flip rate 0.158%, mean |soft
  delta| 1.6e-3.
* structured (moving-square) video below: flip rate 0.274%, mean delta
  1.6e-3. The flipped pixels are mostly CONFIDENT basin switches
  (median f32 top1-top2 gap 0.97 at flips): at random init both dtypes
  produce confident-but-arbitrary EM assignments on degenerate pixels
  and rounding picks the basin — an artifact of untrained weights, not
  a bf16-specific failure (f32-vs-f64 shows the same character).
* the load-bearing deployment property: the per-frame flip-rate series
  is FLAT over the video (0.15-0.34%, no trend) — bf16 error does NOT
  compound through the memory feedback loop (memorize reads back
  predictions every frame; an unstable recurrence would grow).

The EM statistics themselves always run f32 at precision=HIGHEST
(em.py:40-43) — this test bounds what the *bf16 conv towers* add on top.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from swem_tpu.config import ModelConfig
from swem_tpu.engine import run_video_scores
from swem_tpu.models.swem import SWEM

pytestmark = pytest.mark.slow


def _structured_video(T, B, H, W, Ho, Wo, n_slots=2):
    """Smooth background + two moving squares (photo-like margins, unlike
    iid-noise frames)."""
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    bg = np.stack([
        0.3 + 0.4 * yy / H, 0.5 - 0.2 * xx / W, 0.4 + 0.2 * (xx + yy) / (H + W)
    ], -1)
    frames = np.empty((T, B, H, W, 3), np.float32)
    mask0 = np.zeros((B, Ho, Wo, n_slots + 1), np.float32)
    mask0[..., 0] = 1.0
    boxes = [(30, 80, 40, 120, (0.9, 0.2, 0.1)), (90, 140, 160, 260, (0.1, 0.3, 0.9))]
    for t in range(T):
        f = bg + rng.normal(0, 0.01, bg.shape).astype(np.float32)
        for j, (y0, y1, x0, x1, c) in enumerate(boxes):
            dy, dx = 2 * t, 3 * t
            f[y0 + dy:y1 + dy, x0 + dx:x1 + dx] = c
            if t == 0:
                oy1, ox1 = min(y1, Ho), min(x1, Wo)
                mask0[:, y0:oy1, x0:ox1, j + 1] = 1.0
                mask0[:, y0:oy1, x0:ox1, 0] = 0.0
        frames[t] = np.clip(f, 0, 1)
    return frames, mask0


def test_bf16_predictions_match_f32_at_flagship_dims():
    T, B, H, W, Ho, Wo = 8, 1, 160, 288, 160, 280
    frames_np, mask0_np = _structured_video(T, B, H, W, Ho, Wo)
    frames = jnp.asarray(frames_np)
    mask0 = jnp.asarray(mask0_np)
    active = jnp.ones((B, 2), bool)

    scores = {}
    variables = None
    for dt in ("float32", "bfloat16"):
        cfg = ModelConfig(dtype=dt)  # production defaults: R50/128/512/L128
        model = SWEM(cfg)
        if variables is None:
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), frames[0],
                                            mask0)
        s = jax.jit(lambda v, m=model: run_video_scores(
            m, v, jax.random.PRNGKey(1), frames, mask0, active, (Ho, Wo)))(
                variables)
        scores[dt] = np.asarray(s, np.float32)

    a, b = scores["float32"], scores["bfloat16"]
    delta = np.abs(a - b)
    flip = a.argmax(-1) != b.argmax(-1)
    # stated deployment bounds (measured 0.27% / 1.6e-3 here; ~3x headroom
    # for platform variation)
    assert flip.mean() < 0.01, f"argmax flip rate {flip.mean():.4f}"
    assert delta.mean() < 5e-3, f"mean soft delta {delta.mean():.2e}"
    # the deployment-critical property: no compounding through the memory
    # feedback loop — late-video flip rates must not grow over early ones
    # (measured flat at 0.15-0.34%/frame)
    per_frame = flip.reshape(flip.shape[0], -1).mean(-1)
    early, late = per_frame[:3].mean(), per_frame[-3:].mean()
    assert late < 3.0 * early + 1e-4, (
        f"bf16 disagreement grows through the video: early {early:.4f} "
        f"-> late {late:.4f}")
