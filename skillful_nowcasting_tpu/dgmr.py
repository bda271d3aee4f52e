"""DGMR: top-level Deep Generative Model of Radar.

Reference: ``/root/reference/dgmr/dgmr.py`` (behavioral spec).  The reference
is a PyTorch-Lightning module with manual optimization; here the model is a
pure Flax module (generator + discriminator in one variable tree) and the GAN
optimization loop lives in :mod:`skillful_nowcasting_tpu.training` as a single
jitted step.

Constructor fields mirror the reference hyperparameters exactly
(``dgmr.py:45-62``) — they are the hub ``config.json`` contract
(SURVEY.md §2.5).

Sub-model scoping matches the reference's (non-duplicated) state-dict keys:
``conditioning_stack.*``, ``latent_stack.*``, ``sampler.*``,
``discriminator.*`` (torch also emits ``generator.*``-prefixed duplicates for
its shared submodules; the hub converter folds those, see
``hub/convert.py``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .hub.pretrained import HubMixin
from .models.common import ContextConditioningStack, LatentConditioningStack
from .models.discriminators import Discriminator
from .models.generators import Sampler

HPARAM_FIELDS = (
    "forecast_steps",
    "input_channels",
    "output_shape",
    "gen_lr",
    "disc_lr",
    "visualize",
    "conv_type",
    "num_samples",
    "grid_lambda",
    "beta1",
    "beta2",
    "latent_channels",
    "context_channels",
    "generation_steps",
    "precip_weight_cap",
)


class DGMR(nn.Module, HubMixin):
    """Deep Generative Model of Radar (``dgmr.py:36-135``).

    ``__call__`` runs the generator: NTHWC context frames
    ``(B, 4, H, W, C)`` → forecast ``(B, forecast_steps, H, W, C)``.
    ``discriminate`` runs the combined spatial+temporal discriminator.
    """

    forecast_steps: int = 18
    input_channels: int = 1
    output_shape: int = 256
    gen_lr: float = 5e-5
    disc_lr: float = 2e-4
    visualize: bool = False
    conv_type: str = "standard"
    num_samples: int = 6
    grid_lambda: float = 20.0
    beta1: float = 0.0
    beta2: float = 0.999
    latent_channels: int = 768
    context_channels: int = 384
    generation_steps: int = 6
    precip_weight_cap: float = 24.0
    # Discriminator tower depths — fixed at 4/3 in the reference
    # (``discriminators.py:158,55``).  Exposed so small test/dryrun configs
    # (e.g. 64² inputs, which only admit 2 halvings per tower) can shrink the
    # program; deliberately NOT in ``HPARAM_FIELDS`` (the hub config contract
    # matches the reference's hparams exactly), so non-default values do not
    # survive a save/from_pretrained round-trip.
    num_spatial_layers: int = 4
    num_temporal_layers: int = 3

    def setup(self):
        self.conditioning_stack = ContextConditioningStack(
            input_channels=self.input_channels,
            conv_type=self.conv_type,
            output_channels=self.context_channels,
            name="conditioning_stack",
        )
        self.latent_stack = LatentConditioningStack(
            shape=(
                8 * self.input_channels,
                self.output_shape // 32,
                self.output_shape // 32,
            ),
            output_channels=self.latent_channels,
            name="latent_stack",
        )
        self.sampler = Sampler(
            forecast_steps=self.forecast_steps,
            latent_channels=self.latent_channels,
            context_channels=self.context_channels,
            name="sampler",
        )
        self.discriminator = Discriminator(
            input_channels=self.input_channels,
            num_spatial_layers=self.num_spatial_layers,
            num_temporal_layers=self.num_temporal_layers,
            name="discriminator",
        )

    def __call__(
        self,
        x: jnp.ndarray,
        *,
        train: bool = False,
        z: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Generator forward (``dgmr.py:132-135``): one nowcast sample."""
        from .remat_names import tag as _name

        conditioning_states = tuple(
            _name(s, "conditioning_state")
            for s in self.conditioning_stack(x, train=train)
        )
        latent_dim = _name(self.latent_stack(x, z=z, train=train), "latent_dim")
        return self.sampler(conditioning_states, latent_dim, train=train)

    def generate_ensemble(
        self,
        x: jnp.ndarray,
        num_samples: Optional[int] = None,
        *,
        z: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Shared-context S-sample ensemble ``(S, B, T, H, W, C)`` (eval only).

        Equals S independent ``__call__`` forwards with the same latents but
        computes the deterministic conditioning stack once and runs ONE
        sampler call at batch ``S*B`` (see
        :func:`~skillful_nowcasting_tpu.models.generators.ensemble_forward`).
        """
        from .models.generators import ensemble_forward

        return ensemble_forward(
            self, x, num_samples if num_samples is not None else self.num_samples, z=z
        )

    def discriminate(
        self,
        x: jnp.ndarray,
        *,
        train: bool = False,
        frame_indices: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Spatial+temporal scores ``(B, 2, 1)`` on a full NTHWC sequence."""
        return self.discriminator(x, train=train, frame_indices=frame_indices)

    def init_step(self, x: jnp.ndarray, future_images: jnp.ndarray):
        """Initialization path touching every parameter (G + D)."""
        preds = self(x, train=False)
        seq = jnp.concatenate([x, future_images], axis=1)
        scores = self.discriminate(seq, train=False)
        return preds, scores

    @property
    def config(self) -> dict:
        """Hub config dict (the Lightning ``save_hyperparameters`` contract)."""
        return {k: getattr(self, k) for k in HPARAM_FIELDS}
