"""Conv factory mirroring the reference ``dgmr/layers/utils.py:8-18``."""

from __future__ import annotations

from functools import partial

from ..ops import Conv
from .coord_conv import CoordConv


def get_conv_layer(conv_type: str = "standard"):
    """Return a conv constructor for ``"standard"`` / ``"coord"`` / ``"3d"``.

    The returned callable accepts :class:`~skillful_nowcasting_tpu.ops.Conv`
    keyword arguments (``features``, ``kernel_size``, ``padding``,
    ``spectral_norm``, ``sn_eps``, ``name``, ...).
    """
    if conv_type == "standard":
        return partial(Conv, ndim=2)
    if conv_type == "coord":

        def make_coord(features, name=None, **kwargs):
            return CoordConv(features=features, conv_kwargs=kwargs, name=name)

        return make_coord
    if conv_type == "3d":
        return partial(Conv, ndim=3)
    raise ValueError(f"{conv_type} is not a recognized Conv method")
