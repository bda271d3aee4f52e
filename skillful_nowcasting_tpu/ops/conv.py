"""TPU-native conv / linear primitives with optional spectral normalization.

These are the L1 primitives of the framework (reference analog:
``torch.nn.Conv2d/Conv3d/Linear`` wrapped in ``spectral_norm`` — see
``/root/reference/dgmr/common.py:43-66`` etc.).  Design choices:

* NHWC activations / HWIO kernels (NDHWC / DHWIO for 3-D) — the native TPU
  conv layout, so XLA tiles directly onto the MXU with no transposes.
* Spectral norm is fused into the module: the kernel parameter stores the
  *unnormalized* weight (torch's ``parametrizations.weight.original``) and the
  power-iteration vectors live in the ``"spectral"`` collection.
* Arbitrary leading batch dims: inputs of shape ``(..., H, W, C)`` are
  flattened to one batch axis before the conv — this is how the framework
  folds the T axis into the batch for MXU-friendly big convolutions.
* ``sequential=True`` reproduces the reference's per-timestep Python loops
  (e.g. ``[self.gru_conv_1x1(h) for h in hidden_states]``,
  ``/root/reference/dgmr/generators.py:153``) **without** serializing the
  conv: in torch train mode each loop iteration runs one power iteration and
  re-normalizes the weight, so timestep t sees its own sigma_t.  Because the
  conv is linear, ``conv(x_t, W / sigma_t) == conv(x_t, W) / sigma_t`` — we
  run ONE batched conv over all timesteps on the MXU and divide by the
  sigma_t sequence produced by a cheap scan of power-iteration matvecs.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import initializers as tinit
from . import spectral_norm as sn

Ints = Union[int, Sequence[int]]


def _tuple(v: Ints, n: int) -> Tuple[int, ...]:
    if isinstance(v, int):
        return (v,) * n
    t = tuple(v)
    assert len(t) == n
    return t


def _sigma_sequence(weight_mat, u, v, eps, length):
    """sigma_t for t sequential torch train-mode forwards (1 power iter each)."""
    wm_sg = jax.lax.stop_gradient(weight_mat)

    def body(uv, _):
        uu, vv = sn.power_iteration(wm_sg, uv[0], uv[1], eps, n_iterations=1)
        sigma = sn.spectral_sigma(
            weight_mat, jax.lax.stop_gradient(uu), jax.lax.stop_gradient(vv)
        )
        return (uu, vv), sigma

    (u_f, v_f), sigmas = jax.lax.scan(body, (u, v), None, length=length)
    return sigmas, u_f, v_f


class _SpectralMixin:
    """Shared spectral-norm machinery for Conv and Dense."""

    def _sn_uv(self, kernel):
        return self.variable(
            "spectral",
            "uv",
            lambda: sn.init_uv(
                self.make_rng("params") if self.has_rng("params") else jax.random.key(0),
                sn.kernel_to_weight_mat(kernel),
                self.sn_eps,
            ),
        )


class Conv(nn.Module, _SpectralMixin):
    """N-dimensional convolution (cross-correlation), torch-compatible.

    Attributes:
        features: number of output channels.
        kernel_size: spatial kernel size (int or tuple).
        ndim: number of spatial dims (2 or 3).
        strides: spatial strides.
        padding: symmetric integer padding per spatial dim (torch-style).
        use_bias: include additive bias.
        spectral_norm: apply spectral normalization to the kernel.
        sn_eps: epsilon for the spectral-norm normalize (torch default 1e-12;
            the DGMR blocks that pass eps use 1e-4).
        dtype: computation dtype (None = inherit from input).
    """

    features: int
    kernel_size: Ints = 3
    ndim: int = 2
    strides: Ints = 1
    padding: Ints = 0
    use_bias: bool = True
    spectral_norm: bool = False
    sn_eps: float = 1e-12
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, update_stats: bool = False, sequential: bool = False
    ) -> jnp.ndarray:
        ksize = _tuple(self.kernel_size, self.ndim)
        strides = _tuple(self.strides, self.ndim)
        padding = _tuple(self.padding, self.ndim)
        in_features = x.shape[-1]
        kshape = ksize + (in_features, self.features)

        kernel = self.param("kernel", tinit.torch_conv_kernel_init, kshape)
        bias = None
        if self.use_bias:
            fan_in = in_features
            for k in ksize:
                fan_in *= k
            bias = self.param("bias", tinit.torch_bias_init(fan_in), (self.features,))

        sigmas = None  # per-sequence-step sigma (train sequential mode only)
        if self.spectral_norm:
            uv_var = self._sn_uv(kernel)
            u, v = uv_var.value
            weight_mat = sn.kernel_to_weight_mat(kernel)
            if update_stats and not self.is_initializing():
                if sequential:
                    sigmas, u_f, v_f = _sigma_sequence(
                        weight_mat, u, v, self.sn_eps, x.shape[0]
                    )
                    uv_var.value = (u_f, v_f)
                else:
                    u1, v1 = sn.power_iteration(
                        jax.lax.stop_gradient(weight_mat), u, v, self.sn_eps
                    )
                    uv_var.value = (u1, v1)
                    sigma = sn.spectral_sigma(
                        weight_mat,
                        jax.lax.stop_gradient(u1),
                        jax.lax.stop_gradient(v1),
                    )
                    kernel = kernel / sigma
            else:
                sigma = sn.spectral_sigma(weight_mat, u, v)
                kernel = kernel / sigma

        dtype = self.dtype or x.dtype
        kernel = kernel.astype(dtype)
        x = x.astype(dtype)

        # Fold any extra leading axes into the batch.
        lead = x.shape[: -(self.ndim + 1)]
        spatial_c = x.shape[-(self.ndim + 1) :]
        xb = x.reshape((-1,) + spatial_c)

        dn = jax.lax.conv_dimension_numbers(
            xb.shape,
            kernel.shape,
            ("NHWC", "HWIO", "NHWC") if self.ndim == 2 else ("NDHWC", "DHWIO", "NDHWC"),
        )
        y = jax.lax.conv_general_dilated(
            xb,
            kernel,
            window_strides=strides,
            padding=[(p, p) for p in padding],
            dimension_numbers=dn,
        )
        y = y.reshape(lead + y.shape[1:])
        if sigmas is not None:
            # (S, ...) activations divided by the per-step sigma sequence.
            y = y / sigmas.astype(dtype).reshape((-1,) + (1,) * (y.ndim - 1))
        if bias is not None:
            y = y + bias.astype(dtype)
        return y


class Dense(nn.Module, _SpectralMixin):
    """Linear layer with optional spectral norm (torch ``nn.Linear`` parity).

    Kernel stored (in, out); the spectral-norm weight matrix uses torch's
    (out, in) orientation via :func:`kernel_to_weight_mat`.  ``sequential``
    has the same per-leading-axis-step train semantics as :class:`Conv`.
    """

    features: int
    use_bias: bool = True
    spectral_norm: bool = False
    sn_eps: float = 1e-12
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, update_stats: bool = False, sequential: bool = False
    ) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", tinit.torch_linear_kernel_init, (in_features, self.features)
        )
        bias = (
            self.param("bias", tinit.torch_bias_init(in_features), (self.features,))
            if self.use_bias
            else None
        )

        sigmas = None
        if self.spectral_norm:
            uv_var = self._sn_uv(kernel)
            u, v = uv_var.value
            weight_mat = sn.kernel_to_weight_mat(kernel)
            if update_stats and not self.is_initializing():
                if sequential:
                    sigmas, u_f, v_f = _sigma_sequence(
                        weight_mat, u, v, self.sn_eps, x.shape[0]
                    )
                    uv_var.value = (u_f, v_f)
                else:
                    u1, v1 = sn.power_iteration(
                        jax.lax.stop_gradient(weight_mat), u, v, self.sn_eps
                    )
                    uv_var.value = (u1, v1)
                    sigma = sn.spectral_sigma(
                        weight_mat,
                        jax.lax.stop_gradient(u1),
                        jax.lax.stop_gradient(v1),
                    )
                    kernel = kernel / sigma
            else:
                sigma = sn.spectral_sigma(weight_mat, u, v)
                kernel = kernel / sigma

        dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype))
        if sigmas is not None:
            y = y / sigmas.astype(dtype).reshape((-1,) + (1,) * (y.ndim - 1))
        if bias is not None:
            y = y + bias.astype(dtype)
        return y
