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

    def setup(self):
        self.compress = ResBlock(512, dtype=self.dtype)
        self.up_16_8 = UpsampleBlock(512, self.mdim, dtype=self.dtype)
        # up_c of the second block equals mdim (reference uses 256 == mdim)
        self.up_8_4 = UpsampleBlock(self.mdim, self.mdim, dtype=self.dtype)
        self.pred = conv3x3(1, dtype=self.dtype)

    def skip_feats(self, f8, f4):
        """Frame-only skip convolutions (hoistable out of the frame loop).

        The skip convs see only the key encoder's f8/f4 — never the memory
        context — so callers compute them once per frame at batch B and
        broadcast over the object axis, instead of re-running them per
        object per frame inside the sequential decode.
        """
        return self.up_16_8.skip(f8), self.up_8_4.skip(f4)

    def decode_with_skips(self, f16, skip8, skip4, out_size: Tuple[int, int]):
        """f16: context (B,h16,w16,512); skip8/skip4: ``skip_feats`` outputs."""
        x = self.compress(f16)
        x = self.up_16_8.merge(skip8, x)
        x = self.up_8_4.merge(skip4, x)
        x = self.pred(nn.relu(x))
        # final resize + sigmoid/aggregation run in >= f32 for stable logits
        # (promote, don't truncate: the f64 parity oracle runs this in f64)
        return resize(x.astype(jnp.promote_types(x.dtype, jnp.float32)), out_size, "bilinear")

    def __call__(self, f16, f8, f4, out_size: Tuple[int, int]):
        skip8, skip4 = self.skip_feats(f8, f4)
        return self.decode_with_skips(f16, skip8, skip4, out_size)
