"""Primitive layers (reference analog: ``dgmr/layers/__init__.py:3-5``)."""

from .attention import AttentionLayer
from .convgru import ConvGRU, ConvGRUCell
from .coord_conv import CoordConv, add_coords
from .utils import get_conv_layer

__all__ = [
    "AttentionLayer",
    "ConvGRU",
    "ConvGRUCell",
    "CoordConv",
    "add_coords",
    "get_conv_layer",
]
