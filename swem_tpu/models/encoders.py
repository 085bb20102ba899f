"""Key / value encoders and projections.

Re-designs of /root/reference/methods/basic_modules/networks.py:53-182 in
flax (NHWC, frozen BN, bf16-capable). The broken ``model_dirs`` weight-path
scheme of the reference (networks.py:8,140 — crashes as shipped) is replaced
by explicit weight loading through swem_tpu.io.torch_import.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from swem_tpu.models.layers import FeatureFusionBlock, conv3x3
from swem_tpu.models.resnet import BACKBONE_FEATURES, ResNetTrunk

# ImageNet normalization (networks.py:72-73,157-158)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_image(frame: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(..., H, W, 3) RGB in [0, 1] -> ImageNet-normalized.

    The constants are rounded to f32 first: the reference stores them as
    FloatTensor buffers (networks.py:72-73), so even its f64 forward uses the
    f32-rounded values — required for the f64 parity oracle to close.
    """
    import numpy as np

    mean = jnp.asarray(np.asarray(IMAGENET_MEAN, np.float32), dtype)
    std = jnp.asarray(np.asarray(IMAGENET_STD, np.float32), dtype)
    return (frame.astype(dtype) - mean) / std


class KeyEncoder(nn.Module):
    """ResNet-50/18 trunk producing (f16, f8, f4) (networks.py:132-170)."""

    backbone: str = "resnet50"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frame) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        x = normalize_image(frame, self.dtype)
        # torchvision trunk: no conv biases (networks.py:139-144)
        if self.backbone == "resnet50":
            trunk = ResNetTrunk(block="bottleneck", layers=(3, 4, 6), name="trunk",
                                conv_bias=False, dtype=self.dtype)
        elif self.backbone == "resnet18":
            trunk = ResNetTrunk(block="basic", layers=(2, 2, 2), name="trunk",
                                conv_bias=False, dtype=self.dtype)
        else:
            raise KeyError(f"backbone {self.backbone} not supported")
        return trunk(x)

    @property
    def num_features(self):
        return BACKBONE_FEATURES[self.backbone]


class ValueEncoder(nn.Module):
    """Modified ResNet-18 value encoder + feature fusion (networks.py:56-129).

    Input is the frame concatenated with the object's fg mask (and, unless
    ``single_object``, the "other objects" mask): conv1 has 4 or 5 input
    channels. Output fuses trunk f16 (256ch) with the key encoder's f16
    through FeatureFusionBlock -> valdim channels.
    """

    single_object: bool = False
    valdim: int = 512
    dtype: Any = jnp.float32

    def setup(self):
        # mod_resnet trunk: bias on every conv (zero at zoo init, trainable)
        self.trunk = ResNetTrunk(
            block="basic", layers=(2, 2, 2),
            in_channels=4 if self.single_object else 5,
            conv_bias=True, dtype=self.dtype,
        )
        self.fuser = FeatureFusionBlock(self.valdim, dtype=self.dtype)

    def frame_stem(self, frame):
        """Frame slice of the stem conv (B,H,W,3) -> (B,H/2,W/2,64).

        Object- and memory-independent, so the inference engine computes it
        once per frame (batched across frames) and only the mask slice of
        conv1 runs inside the sequential per-object loop (see
        resnet.StemConv).
        """
        return self.trunk.conv1.frame_part(normalize_image(frame, self.dtype))

    def __call__(self, frame, key_f16, mask_fg, mask_others=None, frame_stem=None):
        """frame (B,H,W,3); key_f16 (B,H/16,W/16,Cf); masks (B,H,W,1).

        ``frame_stem``: optionally the precomputed ``frame_stem(frame)``
        output (``frame`` is then unused).
        """
        if self.single_object:
            masks = mask_fg.astype(self.dtype)
        else:
            masks = jnp.concatenate(
                [mask_fg.astype(self.dtype), mask_others.astype(self.dtype)], axis=-1
            )
        if frame_stem is None:
            x = jnp.concatenate([normalize_image(frame, self.dtype), masks], axis=-1)
            conv1_out = self.trunk.conv1(x)
        else:
            conv1_out = frame_stem + self.trunk.conv1.mask_part(masks)
        f16, _, _ = self.trunk(conv1_out=conv1_out)
        return self.fuser(f16, key_f16.astype(self.dtype))


class KeyProjection(nn.Module):
    """3x3 conv f16 -> keydim, orthogonal init, zero bias (networks.py:173-182)."""

    keydim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return conv3x3(
            self.keydim, name="key_proj", dtype=self.dtype,
            kernel_init=nn.initializers.orthogonal(),
        )(x)
