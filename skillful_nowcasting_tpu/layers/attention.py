"""Spatial self-attention layer (reference ``dgmr/layers/Attention.py:23-85``).

1x1-conv Q/K/V with channel reduction ``ratio_kq``/``ratio_v`` (8), a
learnable scalar ``gamma`` initialized to zero, and a residual connection.
The reference applies the attention einsum per batch element in a Python
loop (``Attention.py:79-82``); here it is one batched einsum.

``mode="torch_compat"`` (default) reproduces the reference's mislabeled-axis
attention (SURVEY.md quirk Q1) for checkpoint parity; ``mode="fixed"`` is the
intended spatial attention.  None of the convs are spectrally normalized
(matching the reference).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops import Conv, attention_fixed, attention_torch_compat


class AttentionLayer(nn.Module):
    """Self-attention over an NHWC feature map ``(B, H, W, C)``."""

    input_channels: int
    output_channels: int
    ratio_kq: int = 8
    ratio_v: int = 8
    mode: str = "torch_compat"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, update_stats: bool = False) -> jnp.ndarray:
        del update_stats  # no SN / BN in this layer
        query = Conv(
            self.output_channels // self.ratio_kq, kernel_size=1, use_bias=False, name="query"
        )(x)
        key = Conv(
            self.output_channels // self.ratio_kq, kernel_size=1, use_bias=False, name="key"
        )(x)
        value = Conv(
            self.output_channels // self.ratio_v, kernel_size=1, use_bias=False, name="value"
        )(x)

        if self.mode == "torch_compat":
            out = attention_torch_compat(query, key, value)
        elif self.mode == "fixed":
            out = attention_fixed(query, key, value)
        else:
            raise ValueError(f"unknown attention mode: {self.mode}")

        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        out = gamma.astype(out.dtype) * Conv(
            self.output_channels, kernel_size=1, use_bias=False, name="last_conv"
        )(out)
        return out + x
