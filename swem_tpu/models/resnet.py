"""ResNet trunks (flax, NHWC) for the key/value encoders.

Functional re-design of torchvision-style ResNet-50/18 through layer3
(the reference consumes only f4/f8/f16: networks.py:132-170) plus the
"extra input channels" variant used by the value encoder
(/root/reference/methods/basic_modules/mod_resnet.py:14-166).

BatchNorm is frozen for the whole lifecycle (see layers.FrozenBatchNorm);
ImageNet-pretrained statistics are loaded via swem_tpu.io.torch_import.
Module names mirror torchvision's state_dict keys to make weight conversion
a pure renaming pass.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from swem_tpu.models.layers import FrozenBatchNorm, conv1x1, conv3x3


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    conv_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = conv3x3(self.planes, self.stride, name="conv1", dtype=self.dtype,
                      use_bias=self.conv_bias)(x)
        out = FrozenBatchNorm(self.planes, name="bn1", dtype=self.dtype)(out)
        out = nn.relu(out)
        out = conv3x3(self.planes, name="conv2", dtype=self.dtype,
                      use_bias=self.conv_bias)(out)
        out = FrozenBatchNorm(self.planes, name="bn2", dtype=self.dtype)(out)
        if self.downsample:
            identity = conv1x1(
                self.planes, self.stride, name="downsample_conv",
                dtype=self.dtype, use_bias=self.conv_bias,
            )(x)
            identity = FrozenBatchNorm(self.planes, name="downsample_bn", dtype=self.dtype)(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    conv_bias: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        identity = x
        out = conv1x1(self.planes, name="conv1", dtype=self.dtype,
                      use_bias=self.conv_bias)(x)
        out = FrozenBatchNorm(self.planes, name="bn1", dtype=self.dtype)(out)
        out = nn.relu(out)
        out = conv3x3(self.planes, self.stride, name="conv2", dtype=self.dtype,
                      use_bias=self.conv_bias)(out)
        out = FrozenBatchNorm(self.planes, name="bn2", dtype=self.dtype)(out)
        out = nn.relu(out)
        out = conv1x1(out_ch, name="conv3", dtype=self.dtype,
                      use_bias=self.conv_bias)(out)
        out = FrozenBatchNorm(out_ch, name="bn3", dtype=self.dtype)(out)
        if self.downsample:
            identity = conv1x1(
                out_ch, self.stride, name="downsample_conv",
                dtype=self.dtype, use_bias=self.conv_bias,
            )(x)
            identity = FrozenBatchNorm(out_ch, name="downsample_bn", dtype=self.dtype)(identity)
        return nn.relu(out + identity)


class StemConv(nn.Module):
    """7x7/2 stem convolution with channel-split application.

    Param-compatible with ``nn.Conv`` (kernel (7,7,in,64) HWIO + bias) so
    converted torchvision / mod_resnet weights load unchanged. Beyond the
    full ``__call__``, it applies kernel channel slices separately:
    ``frame_part`` (first 3 input channels + bias) is object- and
    memory-independent, so the value encoder hoists it out of the per-object
    per-frame loop; ``mask_part`` (remaining channels, no bias) is the only
    stem work left in the sequential path. The split is exact up to one
    f32/bf16 partial-sum reordering (conv1_full = frame_part + mask_part by
    linearity).
    """

    in_channels: int
    features: int = 64
    use_bias: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.he_uniform(),
            (7, 7, self.in_channels, self.features), jnp.float32,
        )
        if self.use_bias:
            self.bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )

    def _conv(self, x, kernel, with_bias: bool):
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if with_bias and self.use_bias:
            y = y + self.bias.astype(self.dtype)
        return y

    def __call__(self, x):
        return self._conv(x, self.kernel, True)

    def frame_part(self, frame):
        """Apply the first-3-channel kernel slice (+ bias) to the frame."""
        return self._conv(frame, self.kernel[:, :, :3, :], True)

    def mask_part(self, masks):
        """Apply the remaining-channel kernel slice (no bias) to the masks."""
        return self._conv(masks, self.kernel[:, :, 3:, :], False)


class ResNetTrunk(nn.Module):
    """ResNet through layer3, returning (f16, f8, f4) pyramid features.

    ``in_channels`` > 3 reproduces mod_resnet's extra_chan conv1 (masks are
    concatenated to the image by the value encoder).
    """

    block: str  # 'basic' | 'bottleneck'
    layers: Sequence[int]  # e.g. (3, 4, 6) for r50 through layer3
    in_channels: int = 3
    # torchvision trunks (key encoder) have NO conv biases; mod_resnet trunks
    # (value encoder, mod_resnet.py:118-127,140-145) have a bias on EVERY
    # conv (zero at zoo init, but trainable -> nonzero in trained reference
    # checkpoints), including conv1 and the downsample convs.
    conv_bias: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        # conv1/bn1 as setup attributes so split-stem entry points can reuse
        # them; the residual stages stay in the compact __call__ (their
        # layer{stage}_{block} names are assigned there)
        self.conv1 = StemConv(self.in_channels, use_bias=self.conv_bias,
                              dtype=self.dtype)
        self.bn1 = FrozenBatchNorm(64, dtype=self.dtype)

    def stem_rest(self, conv1_out):
        """bn -> relu -> maxpool on a (possibly pre-split) conv1 output."""
        x = nn.relu(self.bn1(conv1_out))
        # torch MaxPool2d(3, 2, padding=1): -inf padding
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

    @nn.compact
    def __call__(self, x=None, *, conv1_out=None) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        expansion = 1 if self.block == "basic" else 4

        if conv1_out is None:
            conv1_out = self.conv1(x)
        x = self.stem_rest(conv1_out)

        feats = []
        planes = 64
        for stage, n_blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                first = b == 0
                needs_down = first and (stride != 1 or x.shape[-1] != planes * expansion)
                x = block_cls(
                    planes,
                    stride=stride if first else 1,
                    downsample=needs_down,
                    conv_bias=self.conv_bias,
                    name=f"layer{stage + 1}_{b}",
                    dtype=self.dtype,
                )(x)
            feats.append(x)
            planes *= 2

        f4, f8, f16 = feats[0], feats[1], feats[2]
        return f16, f8, f4


def resnet50_trunk(dtype=jnp.float32) -> ResNetTrunk:
    return ResNetTrunk(block="bottleneck", layers=(3, 4, 6), dtype=dtype)


def resnet18_trunk(in_channels: int = 3, conv_bias: bool = False, dtype=jnp.float32) -> ResNetTrunk:
    return ResNetTrunk(block="basic", layers=(2, 2, 2), in_channels=in_channels,
                       conv_bias=conv_bias, dtype=dtype)


BACKBONE_FEATURES = {
    # (f16, f8, f4) channel counts (networks.py:135-143)
    "resnet50": (1024, 512, 256),
    "resnet18": (256, 128, 64),
}
