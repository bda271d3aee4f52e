"""Model assemblies: blocks, stacks, generator, discriminators."""

from .common import (
    ContextConditioningStack,
    DBlock,
    GBlock,
    LatentConditioningStack,
    LBlock,
    UpsampleGBlock,
)
from .discriminators import Discriminator, SpatialDiscriminator, TemporalDiscriminator
from .generators import Generator, Sampler

__all__ = [
    "ContextConditioningStack",
    "DBlock",
    "Discriminator",
    "GBlock",
    "Generator",
    "LatentConditioningStack",
    "LBlock",
    "Sampler",
    "SpatialDiscriminator",
    "TemporalDiscriminator",
    "UpsampleGBlock",
]
