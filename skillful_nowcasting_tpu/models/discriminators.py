"""Spatial / temporal / combined discriminators.

Reference: ``/root/reference/dgmr/discriminators.py`` (behavioral spec).
TPU-first restructuring: the reference loops over frames in Python, pushing
each frame through the DBlock tower separately
(``discriminators.py:201-226,119-133``).  The towers contain no BatchNorm, so
here all frames are folded into the conv batch (one big MXU pass) with
``sequential=True`` keeping train-mode spectral-norm parity; only the final
per-frame BatchNorm1d -> Linear head retains per-frame statistics (exact
reference semantics via the sequential BN mode).

Frame selection (quirk Q5): the spatial discriminator samples
``num_timesteps`` frame indices uniformly WITH replacement
(``discriminators.py:199``) — here via an explicit ``"frames"`` rng stream,
or deterministic ``frame_indices`` for tests.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..hub.pretrained import HubMixin
from ..ops import Dense, TorchBatchNorm, avg_pool, space_to_depth
from .common import DBlock


class SpatialDiscriminator(nn.Module, HubMixin):
    """Per-frame discriminator on random frames (``discriminators.py:141-232``).

    Input NHWC video ``(B, T, H, W, C)``; output ``(B, 1, 1)``.
    """

    input_channels: int = 12
    num_timesteps: int = 8
    num_layers: int = 4
    conv_type: str = "standard"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        train: bool = False,
        frame_indices: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b, t = x.shape[0], x.shape[1]
        if frame_indices is None:
            key = self.make_rng("frames")
            frame_indices = jax.random.randint(key, (self.num_timesteps,), 0, t)

        frames = jnp.take(x, frame_indices, axis=1)  # (B, S, H, W, C)
        frames = jnp.swapaxes(frames, 0, 1)  # (S, B, H, W, C) — sequential axis

        rep = avg_pool(frames, 2, ndim=2)
        rep = space_to_depth(rep, 2)

        ic = self.input_channels
        internal_chn = 24
        rep = DBlock(
            4 * ic, 2 * internal_chn * ic, self.conv_type, first_relu=False, name="d1"
        )(rep, train=train, sequential=True)
        for i in range(self.num_layers):
            internal_chn *= 2
            rep = DBlock(
                internal_chn * ic,
                2 * internal_chn * ic,
                self.conv_type,
                name=f"intermediate_dblocks.{i}",
            )(rep, train=train, sequential=True)
        rep = DBlock(
            2 * internal_chn * ic,
            2 * internal_chn * ic,
            self.conv_type,
            keep_same_output=True,
            name="d6",
        )(rep, train=train, sequential=True)

        rep = jnp.sum(jax.nn.relu(rep), axis=(2, 3))  # (S, B, C)
        rep = TorchBatchNorm(name="bn")(rep, train=train, sequential=True)
        rep = Dense(1, spectral_norm=True, name="fc")(
            rep, update_stats=train, sequential=True
        )  # (S, B, 1)

        # Sum scores over the sampled frames (``discriminators.py:229-231``).
        out = jnp.sum(rep, axis=0)  # (B, 1)
        return out[:, None, :]  # (B, 1, 1)


class TemporalDiscriminator(nn.Module, HubMixin):
    """3-D stem + per-remaining-timestep tower (``discriminators.py:47-138``).

    Input NHWC video ``(B, T, H, W, C)``; output ``(B, 1, 1)``.
    """

    input_channels: int = 12
    num_layers: int = 3
    conv_type: str = "standard"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        ic = self.input_channels

        # AvgPool3d((1, 2, 2)): spatial halving only (``discriminators.py:68``).
        x = avg_pool(x, (2, 2), ndim=2)
        x = space_to_depth(x, 2)  # (B, T, h, w, 4C)
        # 3-D DBlocks operate on (B, D=T, H, W, C) = NDHWC — already our layout.
        internal_chn = 48
        x = DBlock(
            4 * ic, internal_chn * ic, conv_type="3d", first_relu=False, name="d1"
        )(x, train=train)
        x = DBlock(internal_chn * ic, 2 * internal_chn * ic, conv_type="3d", name="d2")(
            x, train=train
        )

        # Per-remaining-timestep 2-D tower (``discriminators.py:118-133``).
        x = jnp.swapaxes(x, 0, 1)  # (T', B, h, w, c) — sequential axis
        for i in range(self.num_layers):
            internal_chn *= 2
            x = DBlock(
                internal_chn * ic,
                2 * internal_chn * ic,
                self.conv_type,
                name=f"intermediate_dblocks.{i}",
            )(x, train=train, sequential=True)
        x = DBlock(
            2 * internal_chn * ic,
            2 * internal_chn * ic,
            self.conv_type,
            keep_same_output=True,
            name="d_last",
        )(x, train=train, sequential=True)

        x = jnp.sum(jax.nn.relu(x), axis=(2, 3))  # (T', B, C)
        x = TorchBatchNorm(name="bn")(x, train=train, sequential=True)
        x = Dense(1, spectral_norm=True, name="fc")(
            x, update_stats=train, sequential=True
        )  # (T', B, 1)

        out = jnp.sum(x, axis=0)  # (B, 1)
        return out[:, None, :]  # (B, 1, 1)


class Discriminator(nn.Module, HubMixin):
    """Spatial + temporal scores concatenated (``discriminators.py:12-44``).

    Output ``(B, 2, 1)`` — spatial score first (consumed positionally by the
    training step's split, quirk Q7 ordering).
    """

    input_channels: int = 12
    num_spatial_frames: int = 8
    conv_type: str = "standard"
    # Tower depths (reference fixes these at 4/3, ``discriminators.py:158,55``).
    # Non-default values shrink the towers for small test/dryrun configs
    # (input 64² needs ≤2/≤2); they are NOT part of the hub config contract.
    num_spatial_layers: int = 4
    num_temporal_layers: int = 3

    def setup(self):
        self.spatial_discriminator = SpatialDiscriminator(
            input_channels=self.input_channels,
            num_timesteps=self.num_spatial_frames,
            num_layers=self.num_spatial_layers,
            conv_type=self.conv_type,
            name="spatial_discriminator",
        )
        self.temporal_discriminator = TemporalDiscriminator(
            input_channels=self.input_channels,
            num_layers=self.num_temporal_layers,
            conv_type=self.conv_type,
            name="temporal_discriminator",
        )

    def __call__(
        self,
        x: jnp.ndarray,
        *,
        train: bool = False,
        frame_indices: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        spatial = self.spatial_discriminator(x, train=train, frame_indices=frame_indices)
        temporal = self.temporal_discriminator(x, train=train)
        return jnp.concatenate([spatial, temporal], axis=1)
