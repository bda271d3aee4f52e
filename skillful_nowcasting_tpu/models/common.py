"""Composite blocks: GBlock, UpsampleGBlock, DBlock, LBlock + conditioning stacks.

Reference: ``/root/reference/dgmr/common.py`` (behavioral spec only; this is a
ground-up NHWC/Flax implementation).  All blocks take NHWC activations and an
optional leading sequential axis (``sequential=True`` → input ``(S, B, H, W,
C)``), which reproduces the reference's per-timestep Python-loop semantics for
train-mode BatchNorm statistics and spectral-norm power iterations while
still batching every conv over ``S*B`` on the MXU.

A torch-parity detail: the reference constructs shortcut 1x1 convs even when
the channel counts make them unused (``common.py:43-50,192-198,266-270``), so
their parameters exist in checkpoints.  We call those convs and discard the
result when unused — XLA dead-code-eliminates the compute, but the parameters
(and frozen spectral u/v) stay in the tree for checkpoint round-trips.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..hub.pretrained import HubMixin
from ..layers.attention import AttentionLayer
from ..layers.utils import get_conv_layer
from ..ops import Conv, TorchBatchNorm, avg_pool, space_to_depth, upsample_nearest_2x


class GBlock(nn.Module):
    """Residual generator block, same resolution (reference ``common.py:17-84``)."""

    input_channels: int = 12
    output_channels: int = 12
    conv_type: str = "standard"
    spectral_normalized_eps: float = 1e-4

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False, sequential: bool = False):
        conv2d = get_conv_layer(self.conv_type)
        eps = self.spectral_normalized_eps

        sc_conv = conv2d(
            self.output_channels,
            kernel_size=1,
            spectral_norm=True,
            sn_eps=eps,
            name="conv_1x1",
        )
        if x.shape[-1] != self.output_channels:
            sc = sc_conv(x, update_stats=train, sequential=sequential)
        else:
            # Materialize unused params (torch creates them); DCE removes compute.
            _ = sc_conv(x, update_stats=False)
            sc = x

        x2 = TorchBatchNorm(name="bn1")(x, train=train, sequential=sequential)
        x2 = jax.nn.relu(x2)
        x2 = conv2d(
            self.input_channels,
            kernel_size=3,
            padding=1,
            spectral_norm=True,
            sn_eps=eps,
            name="first_conv_3x3",
        )(x2, update_stats=train, sequential=sequential)
        x2 = TorchBatchNorm(name="bn2")(x2, train=train, sequential=sequential)
        x2 = jax.nn.relu(x2)
        x2 = conv2d(
            self.output_channels,
            kernel_size=3,
            padding=1,
            spectral_norm=True,
            sn_eps=eps,
            name="last_conv_3x3",
        )(x2, update_stats=train, sequential=sequential)
        return x2 + sc


class UpsampleGBlock(nn.Module):
    """Residual generator block with 2x nearest upsampling (``common.py:87-155``).

    Unlike :class:`GBlock`, the shortcut 1x1 conv is applied unconditionally.
    """

    input_channels: int = 12
    output_channels: int = 12
    conv_type: str = "standard"
    spectral_normalized_eps: float = 1e-4

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False, sequential: bool = False):
        conv2d = get_conv_layer(self.conv_type)
        eps = self.spectral_normalized_eps

        sc = upsample_nearest_2x(x)
        sc = conv2d(
            self.output_channels,
            kernel_size=1,
            spectral_norm=True,
            sn_eps=eps,
            name="conv_1x1",
        )(sc, update_stats=train, sequential=sequential)

        x2 = TorchBatchNorm(name="bn1")(x, train=train, sequential=sequential)
        x2 = jax.nn.relu(x2)
        x2 = upsample_nearest_2x(x2)
        x2 = conv2d(
            self.input_channels,
            kernel_size=3,
            padding=1,
            spectral_norm=True,
            sn_eps=eps,
            name="first_conv_3x3",
        )(x2, update_stats=train, sequential=sequential)
        x2 = TorchBatchNorm(name="bn2")(x2, train=train, sequential=sequential)
        x2 = jax.nn.relu(x2)
        x2 = conv2d(
            self.output_channels,
            kernel_size=3,
            padding=1,
            spectral_norm=True,
            sn_eps=eps,
            name="last_conv_3x3",
        )(x2, update_stats=train, sequential=sequential)
        return x2 + sc


class DBlock(nn.Module):
    """Residual downsampling block, 2-D or 3-D (``common.py:158-238``).

    Spectral norm uses the torch *default* eps (1e-12) — the reference does
    not pass eps for DBlock convs (``common.py:192-215``).
    """

    input_channels: int = 12
    output_channels: int = 12
    conv_type: str = "standard"
    first_relu: bool = True
    keep_same_output: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False, sequential: bool = False):
        conv = get_conv_layer(self.conv_type)
        ndim = 3 if self.conv_type == "3d" else 2

        sc_conv = conv(
            self.output_channels, kernel_size=1, spectral_norm=True, name="conv_1x1"
        )
        if self.input_channels != self.output_channels:
            x1 = sc_conv(x, update_stats=train, sequential=sequential)
            if not self.keep_same_output:
                x1 = avg_pool(x1, 2, ndim=ndim)
        else:
            _ = sc_conv(x, update_stats=False)
            x1 = x

        h = jax.nn.relu(x) if self.first_relu else x
        h = conv(
            self.output_channels,
            kernel_size=3,
            padding=1,
            spectral_norm=True,
            name="first_conv_3x3",
        )(h, update_stats=train, sequential=sequential)
        h = jax.nn.relu(h)
        h = conv(
            self.output_channels,
            kernel_size=3,
            padding=1,
            spectral_norm=True,
            name="last_conv_3x3",
        )(h, update_stats=train, sequential=sequential)
        if not self.keep_same_output:
            h = avg_pool(h, 2, ndim=ndim)
        return x1 + h


class LBlock(nn.Module):
    """Channel-growing residual block for the latent stack (``common.py:241-300``).

    No batch norm, no spectral norm (reference parity).
    """

    input_channels: int = 12
    output_channels: int = 12
    kernel_size: int = 3
    conv_type: str = "standard"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False, sequential: bool = False):
        del train, sequential  # no stateful pieces in this block
        conv = get_conv_layer(self.conv_type)

        if self.input_channels < self.output_channels:
            sc = conv(
                self.output_channels - self.input_channels, kernel_size=1, name="conv_1x1"
            )(x)
            sc = jnp.concatenate([x, sc], axis=-1)
        else:
            sc = x

        x2 = jax.nn.relu(x)
        x2 = conv(
            self.output_channels, kernel_size=self.kernel_size, padding=1, name="first_conv_3x3"
        )(x2)
        x2 = jax.nn.relu(x2)
        x2 = conv(
            self.output_channels, kernel_size=self.kernel_size, padding=1, name="last_conv_3x3"
        )(x2)
        return x2 + sc


class ContextConditioningStack(nn.Module, HubMixin):
    """Encode context frames into 4 multi-scale conditioning states.

    Reference ``common.py:303-424``.  Input NHWC video ``(B, T, H, W, C)``;
    returns 4 scales ordered largest spatial first:
    ``(B, H/8, W/8, oc/8), ..., (B, H/64, W/64, oc)`` for defaults.

    The per-timestep DBlock loop (``common.py:399-407``) runs here as one
    batched pass with ``sequential=True`` (exact train-mode SN parity, same
    eval math); the mixing layer reproduces the ``b t c h w -> b (c t) h w``
    channel interleaving (``common.py:423``).
    """

    input_channels: int = 1
    output_channels: int = 768
    num_context_steps: int = 4
    conv_type: str = "standard"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        conv2d = get_conv_layer(self.conv_type)
        oc, ic, ncs = self.output_channels, self.input_channels, self.num_context_steps

        x = space_to_depth(x, 2)  # (B, T, H/2, W/2, 4C)
        x = jnp.swapaxes(x, 0, 1)  # (T, B, h, w, c) — sequential axis first

        d1 = DBlock(4 * ic, ((oc // 4) * ic) // ncs, self.conv_type, name="d1")
        d2 = DBlock(
            ((oc // 4) * ic) // ncs, ((oc // 2) * ic) // ncs, self.conv_type, name="d2"
        )
        d3 = DBlock(((oc // 2) * ic) // ncs, (oc * ic) // ncs, self.conv_type, name="d3")
        d4 = DBlock((oc * ic) // ncs, (oc * 2 * ic) // ncs, self.conv_type, name="d4")

        s1 = d1(x, train=train, sequential=True)
        s2 = d2(s1, train=train, sequential=True)
        s3 = d3(s2, train=train, sequential=True)
        s4 = d4(s3, train=train, sequential=True)

        def mix(scale, features, name):
            # (T, B, h, w, c) -> (B, h, w, c*T) with channel order (c, t).
            t = scale.shape[0]
            s = jnp.moveaxis(scale, 0, -1)  # (B, h, w, c, T)
            s = s.reshape(s.shape[:-2] + (s.shape[-2] * t,))
            conv = conv2d(
                features, kernel_size=3, padding=1, spectral_norm=True, name=name
            )
            return jax.nn.relu(conv(s, update_stats=train))

        scale_1 = mix(s1, (oc // 8) * ic, "conv1")
        scale_2 = mix(s2, (oc // 4) * ic, "conv2")
        scale_3 = mix(s3, (oc // 2) * ic, "conv3")
        scale_4 = mix(s4, oc * ic, "conv4")
        return scale_1, scale_2, scale_3, scale_4


class LatentConditioningStack(nn.Module, HubMixin):
    """Draw and transform the latent z (reference ``common.py:427-497``).

    Reference quirk Q2: z is sampled with batch size **1** regardless of the
    input batch — every batch element shares one latent draw per call
    (``common.py:449,481-483``).  Provide ``z`` explicitly for deterministic
    tests, otherwise an rng from the ``"latent"`` stream is used.

    ``shape`` is (C, H, W) of the latent (torch layout); output is NHWC
    ``(1, H, W, output_channels)``.
    """

    shape: Tuple[int, int, int] = (8, 8, 8)
    output_channels: int = 768
    use_attention: bool = True
    attention_mode: str = "torch_compat"

    @nn.compact
    def __call__(
        self,
        x: Optional[jnp.ndarray] = None,
        *,
        z: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        c, h, w = self.shape
        if z is None:
            key = self.make_rng("latent")
            z = jax.random.normal(key, (1, h, w, c), jnp.float32)
        if x is not None:
            z = z.astype(x.dtype)

        z = Conv(c, kernel_size=3, padding=1, spectral_norm=True, name="conv_3x3")(
            z, update_stats=train
        )
        oc = self.output_channels
        z = LBlock(c, oc // 32, name="l_block1")(z)
        z = LBlock(oc // 32, oc // 16, name="l_block2")(z)
        z = LBlock(oc // 16, oc // 4, name="l_block3")(z)
        if self.use_attention:
            z = AttentionLayer(
                oc // 4, oc // 4, mode=self.attention_mode, name="att_block"
            )(z)
        z = LBlock(oc // 4, oc, name="l_block4")(z)
        return z
