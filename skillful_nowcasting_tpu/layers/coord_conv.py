"""CoordConv: conv over input augmented with normalized coordinate channels.

Reference: ``/root/reference/dgmr/layers/CoordConv.py``.  The appended
channels are (in order) the row coordinate and the column coordinate, each
normalized to [-1, 1] (``CoordConv.py:30-40``), plus an optional radial
channel ``sqrt((row-0.5)^2 + (col-0.5)^2)`` (``CoordConv.py:47-52``; note the
reference computes the radius from the *[-1, 1]-scaled* coords minus 0.5 —
reproduced exactly).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from ..ops import Conv


def add_coords(x: jnp.ndarray, with_r: bool = False) -> jnp.ndarray:
    """Append coordinate channels to NHWC input ``(B, H, W, C)``."""
    b, h, w, _ = x.shape
    dt = x.dtype
    row = jnp.linspace(-1.0, 1.0, h, dtype=jnp.float32) if h > 1 else jnp.zeros((1,), jnp.float32)
    col = jnp.linspace(-1.0, 1.0, w, dtype=jnp.float32) if w > 1 else jnp.zeros((1,), jnp.float32)
    # Reference: (arange / (dim - 1)) * 2 - 1; linspace(-1, 1, dim) is identical.
    xx = jnp.broadcast_to(row[None, :, None, None], (b, h, w, 1)).astype(dt)
    yy = jnp.broadcast_to(col[None, None, :, None], (b, h, w, 1)).astype(dt)
    out = jnp.concatenate([x, xx, yy], axis=-1)
    if with_r:
        rr = jnp.sqrt(jnp.square(xx - 0.5) + jnp.square(yy - 0.5))
        out = jnp.concatenate([out, rr], axis=-1)
    return out


class CoordConv(nn.Module):
    """Conv2d preceded by :func:`add_coords` (reference ``CoordConv.py:57-81``).

    Accepts the same kwargs as :class:`~skillful_nowcasting_tpu.ops.Conv`;
    unlike the reference (where ``spectral_norm(CoordConv(...))`` would fail
    because the wrapper has no ``.weight``), spectral norm on the inner conv
    is supported here.
    """

    features: int
    with_r: bool = False
    conv_kwargs: Dict[str, Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, update_stats: bool = False) -> jnp.ndarray:
        kwargs = dict(self.conv_kwargs or {})
        ret = add_coords(x, self.with_r)
        return Conv(self.features, name="conv", **kwargs)(ret, update_stats=update_stats)
