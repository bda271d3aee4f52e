"""Space-to-depth / depth-to-space with torch PixelUnshuffle/PixelShuffle parity.

The reference uses ``PixelUnshuffle(2)`` in the conditioning stack and both
discriminators (``/root/reference/dgmr/common.py:326``,
``/root/reference/dgmr/discriminators.py:69,166``) and ``PixelShuffle(2)`` as
the sampler output head (``/root/reference/dgmr/generators.py:123``).  The
channel ordering is load-bearing for checkpoint parity:

* PixelUnshuffle: out channel ``c*r*r + i*r + j`` holds input pixel offset
  ``(i, j)`` of input channel ``c``.
* PixelShuffle: input channel ``c*r*r + i*r + j`` lands at spatial offset
  ``(i, j)`` of output channel ``c``.

Here activations are NHWC, so these become pure reshapes+transposes that XLA
fuses into the neighboring convolutions.
"""

from __future__ import annotations

import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """PixelUnshuffle on NHWC input ``(..., H, W, C) -> (..., H/r, W/r, C*r*r)``."""
    *lead, h, w, c = x.shape
    x = x.reshape(*lead, h // r, r, w // r, r, c)
    # (..., h', i, w', j, c) -> (..., h', w', c, i, j) so channel = c*r*r + i*r + j
    x = jnp.moveaxis(x, (-4, -2), (-2, -1))
    return x.reshape(*lead, h // r, w // r, c * r * r)


def depth_to_space(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """PixelShuffle on NHWC input ``(..., H, W, C*r*r) -> (..., H*r, W*r, C)``."""
    *lead, h, w, c = x.shape
    co = c // (r * r)
    x = x.reshape(*lead, h, w, co, r, r)
    # (..., h, w, c, i, j) -> (..., h, i, w, j, c)
    x = jnp.moveaxis(x, (-3, -2, -1), (-1, -4, -2))
    return x.reshape(*lead, h * r, w * r, co)
