"""Mask decoder (/root/reference/methods/basic_modules/networks.py:199-216).

compress (ResBlock 512) -> up 1/16->1/8 (skip f8) -> up 1/8->1/4 (skip f4)
-> 3x3 conv to 1 logit -> bilinear resize to output size.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from swem_tpu.models.layers import ResBlock, UpsampleBlock, conv3x3
from swem_tpu.ops.resize import resize


class Decoder(nn.Module):
    mdim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f16, f8, f4, out_size: Tuple[int, int]):
        """f16: context (B,h16,w16,512); f8/f4: skips; returns (B,Ho,Wo,1) f32 logits."""
        x = ResBlock(512, name="compress", dtype=self.dtype)(f16)
        x = UpsampleBlock(512, self.mdim, name="up_16_8", dtype=self.dtype)(f8, x)
        # up_c of the second block equals mdim (reference uses 256 == mdim)
        x = UpsampleBlock(self.mdim, self.mdim, name="up_8_4", dtype=self.dtype)(f4, x)
        x = conv3x3(1, name="pred", dtype=self.dtype)(nn.relu(x))
        # final resize + sigmoid/aggregation run in >= f32 for stable logits
        # (promote, don't truncate: the f64 parity oracle runs this in f64)
        return resize(x.astype(jnp.promote_types(x.dtype, jnp.float32)), out_size, "bilinear")
