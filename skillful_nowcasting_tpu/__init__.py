"""skillful_nowcasting_tpu: TPU-native DGMR (Skillful Precipitation Nowcasting).

A ground-up JAX/Flax/Pallas re-implementation of the capabilities of
``openclimatefix/skillful_nowcasting`` (reference mounted read-only at
``/root/reference``), designed TPU-first: NHWC layouts, ``lax.scan``
recurrences, a single jitted GAN train step, ``jax.sharding`` data
parallelism, and Orbax/hub checkpointing.

Public API parity with ``/root/reference/dgmr/__init__.py:3-6``.
"""

from .dgmr import DGMR
from .models.common import ContextConditioningStack, LatentConditioningStack
from .models.discriminators import (
    Discriminator,
    SpatialDiscriminator,
    TemporalDiscriminator,
)
from .models.generators import Generator, Sampler

__all__ = [
    "DGMR",
    "ContextConditioningStack",
    "Discriminator",
    "Generator",
    "LatentConditioningStack",
    "Sampler",
    "SpatialDiscriminator",
    "TemporalDiscriminator",
    "Trainer",
    "NowcastServer",
    "load_exported",
    "save_exported",
]

__version__ = "0.4.0"

_SERVING = {"NowcastServer", "load_exported", "save_exported", "export_nowcast"}


def __getattr__(name):
    # Lazy: Trainer pulls in Orbax/parallel machinery, serving pulls in
    # jax.export — pure inference users (and the hub converter) never need
    # either at import time.
    if name == "Trainer":
        from .trainer import Trainer

        return Trainer
    if name in _SERVING:
        from . import serving

        return getattr(serving, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
