"""Resize parity tests against torch.nn.functional.interpolate (CPU oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from swem_tpu.ops.resize import resize, resize_nchw


SIZES = [
    ((480, 854), (30, 54)),   # memorize mask downsample (hard, out-size source)
    ((480, 864), (30, 54)),   # memorize mask downsample (soft, input-size source)
    ((120, 216), (480, 854)),  # decoder output upsample
    ((30, 54), (60, 108)),     # decoder pyramid x2
    ((17, 23), (40, 51)),      # odd sizes
]


def run_torch(x_nchw, size, mode):
    t = torch.from_numpy(x_nchw)
    kwargs = {} if mode == "nearest" else {"align_corners": False}
    return F.interpolate(t, size=size, mode=mode, **kwargs).numpy()


@pytest.mark.parametrize("mode", ["nearest", "bilinear", "bicubic"])
@pytest.mark.parametrize("in_size,out_size", SIZES)
@pytest.mark.parametrize("via_matmul", [False, True])
def test_matches_torch(rng, mode, in_size, out_size, via_matmul):
    if via_matmul and mode == "nearest":
        pytest.skip("nearest has no matmul path")
    x = rng.standard_normal((2, 3) + in_size).astype(np.float32)
    ref = run_torch(x, out_size, mode)
    xj = jnp.moveaxis(jnp.asarray(x), 1, -1)
    got = np.moveaxis(np.asarray(resize(xj, out_size, mode, via_matmul)), -1, 1)
    # torch interpolates both axes in one fused kernel; we do separable
    # passes, so tiny FMA-ordering differences (<= ~3e-5) remain.
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_channel_last_layout(rng):
    x = rng.standard_normal((2, 17, 23, 5)).astype(np.float32)
    ref = run_torch(np.moveaxis(x, -1, 1), (34, 46), "bilinear")
    got = np.asarray(resize(jnp.asarray(x), (34, 46), "bilinear"))
    np.testing.assert_allclose(np.moveaxis(got, -1, 1), ref, rtol=1e-4, atol=1e-5)


def test_identity_when_same_size(rng):
    x = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    got = np.asarray(resize(jnp.asarray(x), (8, 8), "bilinear"))
    np.testing.assert_allclose(got, x)
