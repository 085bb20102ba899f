"""Shared conv building blocks (flax.linen, NHWC, TPU-friendly).

Re-implementations of the reference's basic modules:
ResBlock / FeatureFusionBlock / UpsampleBlock
(/root/reference/methods/basic_modules/networks.py:12-50,186-196),
CBAM attention (/root/reference/methods/basic_modules/attentions.py:6-84),
GLU feature fusion (/root/reference/methods/SWEM/modules.py:13-26).

All modules are channel-last and take a ``dtype`` compute dtype (params stay
float32; bf16 compute keeps the MXU fed at full rate).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from swem_tpu.ops.resize import resize


def conv3x3(features: int, stride: int = 1, name: Optional[str] = None, dtype=jnp.float32,
            kernel_init=nn.initializers.he_uniform(), use_bias: bool = True) -> nn.Conv:
    """3x3 conv, padding 1 (torch Conv2d(k=3, p=1) convention)."""
    return nn.Conv(
        features, (3, 3), strides=(stride, stride), padding=[(1, 1), (1, 1)],
        name=name, dtype=dtype, kernel_init=kernel_init, use_bias=use_bias,
    )


def conv1x1(features: int, stride: int = 1, name: Optional[str] = None, dtype=jnp.float32,
            use_bias: bool = True) -> nn.Conv:
    return nn.Conv(
        features, (1, 1), strides=(stride, stride), padding="VALID",
        name=name, dtype=dtype, use_bias=use_bias,
        kernel_init=nn.initializers.he_uniform(),
    )


class FrozenBatchNorm(nn.Module):
    """BatchNorm permanently in inference mode.

    The reference freezes BN statistics for the entire training schedule
    (basic_trainer.py:88-93 via swem_trainer.py:39): running stats never
    update, while scale/bias remain trainable. Stats live in the
    ``batch_stats`` collection (loaded from converted torchvision weights),
    scale/bias in ``params``. Folded into a single multiply-add.
    """

    features: int
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        ).value
        w = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * w
        return x * w.astype(self.dtype) + b.astype(self.dtype)


class ResBlock(nn.Module):
    """Pre-activation residual block (networks.py:12-32).

    r = conv2(relu(conv1(relu(x)))); identity via 3x3 'downsample' conv when
    channel counts differ. No normalization (matches the reference).
    """

    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = conv3x3(self.out_features, name="conv1", dtype=self.dtype)(nn.relu(x))
        r = conv3x3(self.out_features, name="conv2", dtype=self.dtype)(nn.relu(r))
        if x.shape[-1] != self.out_features:
            x = conv3x3(self.out_features, name="downsample", dtype=self.dtype)(x)
        return x + r


class ChannelGate(nn.Module):
    """CBAM channel attention (attentions.py:22-50)."""

    features: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = self.features // self.reduction
        mlp = nn.Sequential([
            nn.Dense(hidden, name="fc1", dtype=self.dtype),
            nn.relu,
            nn.Dense(self.features, name="fc2", dtype=self.dtype),
        ])
        avg = jnp.mean(x, axis=(-3, -2))
        mx = jnp.max(x, axis=(-3, -2))
        att = mlp(avg) + mlp(mx)
        scale = nn.sigmoid(att)[:, None, None, :]
        return x * scale


class SpatialGate(nn.Module):
    """CBAM spatial attention: 7x7 conv over [max_c, mean_c] (attentions.py:58-69)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pooled = jnp.concatenate(
            [jnp.max(x, axis=-1, keepdims=True), jnp.mean(x, axis=-1, keepdims=True)],
            axis=-1,
        )
        att = nn.Conv(1, (7, 7), padding=[(3, 3), (3, 3)], name="conv", dtype=self.dtype)(pooled)
        return x * nn.sigmoid(att)


class CBAM(nn.Module):
    """Convolutional Block Attention Module (attentions.py:72-84)."""

    features: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ChannelGate(self.features, self.reduction, name="channel_gate", dtype=self.dtype)(x)
        x = SpatialGate(name="spatial_gate", dtype=self.dtype)(x)
        return x


class FeatureFusionBlock(nn.Module):
    """Fuse value-trunk features with key f16 (networks.py:35-50).

    x = ResBlock(cat[x, f16]); x = ResBlock(x + CBAM(x)).
    """

    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, f16):
        x = jnp.concatenate([x, f16], axis=-1)
        x = ResBlock(self.out_features, name="block1", dtype=self.dtype)(x)
        r = CBAM(self.out_features, name="attention", dtype=self.dtype)(x)
        x = ResBlock(self.out_features, name="block2", dtype=self.dtype)(x + r)
        return x


class GLUFusion(nn.Module):
    """Gated linear unit feature fusion (modules.py:13-26).

    out = conv_f(x) * sigmoid(conv_a(x)); 3x3 convs, orthogonal init, zero bias.
    """

    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = conv3x3(self.out_features, name="layer_f", dtype=self.dtype,
                    kernel_init=nn.initializers.orthogonal())(x)
        a = conv3x3(self.out_features, name="layer_a", dtype=self.dtype,
                    kernel_init=nn.initializers.orthogonal())(x)
        return f * nn.sigmoid(a)


class UpsampleBlock(nn.Module):
    """Skip-connected x2 upsampling step (networks.py:186-196).

    x = skip_conv(skip); x += bilinear_resize(up, skip_size); ResBlock.

    ``skip``/``merge`` split the block at its data dependency: ``skip``
    depends only on the encoder skip feature (frame-only — it can be
    computed once per frame and batched across frames), ``merge`` on the
    sequential decode state. ``__call__`` composes both (used by init and
    the parity oracle).
    """

    up_features: int
    out_features: int
    dtype: Any = jnp.float32

    def setup(self):
        self.skip_conv = conv3x3(self.up_features, dtype=self.dtype)
        self.out_conv = ResBlock(self.out_features, dtype=self.dtype)

    def skip(self, skip_f):
        return self.skip_conv(skip_f)

    def merge(self, skip_x, up_f):
        up = resize(up_f, (skip_x.shape[-3], skip_x.shape[-2]), "bilinear")
        return self.out_conv(skip_x + up.astype(skip_x.dtype))

    def __call__(self, skip_f, up_f):
        return self.merge(self.skip(skip_f), up_f)
