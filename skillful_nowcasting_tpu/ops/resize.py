"""Nearest-neighbor 2x upsampling (torch ``nn.Upsample(scale_factor=2)``).

Used by UpsampleGBlock (``/root/reference/dgmr/common.py:121,142,148``).
"""

from __future__ import annotations

import jax.numpy as jnp


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Repeat each pixel 2x2 on NHWC input ``(..., H, W, C)``."""
    x = jnp.repeat(x, 2, axis=-3)
    x = jnp.repeat(x, 2, axis=-2)
    return x
