"""Average pooling matching torch ``AvgPool2d/AvgPool3d`` (no padding, floor).

Used by DBlock downsampling (``/root/reference/dgmr/common.py:189-191``), the
spatial discriminator's stem (``/root/reference/dgmr/discriminators.py:165``)
and the temporal discriminator's (1,2,2) stem
(``/root/reference/dgmr/discriminators.py:68``).  Torch floors the output size
(VALID windows), which matters for the odd T=22/11/5 sequence lengths in the
temporal discriminator.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp

Ints = Union[int, Sequence[int]]


def _tuple(v: Ints, n: int) -> Tuple[int, ...]:
    return (v,) * n if isinstance(v, int) else tuple(v)


def avg_pool(x: jnp.ndarray, window: Ints, strides: Ints = None, ndim: int = 2) -> jnp.ndarray:
    """Average-pool the last ``ndim + 1``-to-last dims (NHWC / NDHWC layout).

    ``x``: (..., *spatial, C).  VALID padding (torch default count_include_pad
    is irrelevant without padding).
    """
    window = _tuple(window, ndim)
    strides = _tuple(strides if strides is not None else window, ndim)
    dims = (1,) * (x.ndim - ndim - 1) + window + (1,)
    strd = (1,) * (x.ndim - ndim - 1) + strides + (1,)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strd, "VALID")
    denom = 1
    for wdim in window:
        denom *= wdim
    return summed / jnp.asarray(denom, x.dtype)
