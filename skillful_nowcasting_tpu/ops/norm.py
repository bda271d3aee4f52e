"""Batch normalization with exact PyTorch semantics, TPU-native layout.

Torch ``BatchNorm2d``/``BatchNorm1d`` (used at
``/root/reference/dgmr/common.py:38-39``,
``/root/reference/dgmr/generators.py:113``,
``/root/reference/dgmr/discriminators.py:102,194``) differs from Flax's
``nn.BatchNorm`` in two parity-relevant ways:

* running stats update uses the *unbiased* batch variance while normalization
  uses the biased one;
* ``running = (1 - momentum) * running + momentum * batch`` with torch's
  momentum convention (default 0.1).

Additionally, the reference applies BN *per timestep inside Python loops*
(e.g. ``[self.g1(h) for h in hidden_states]``,
``/root/reference/dgmr/generators.py:154``): in train mode every timestep is
normalized with its own batch statistics and the running stats are updated
T times sequentially.  To keep that math while still batching all timesteps
through one big conv, this module accepts an optional leading *sequential*
axis: stats are computed per-slice along it and the running stats receive the
closed-form result of T sequential EMA updates:

    r' = (1-m)^T r + m * sum_t (1-m)^(T-1-t) mean_t
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class TorchBatchNorm(nn.Module):
    """BatchNorm over the trailing channel axis with torch semantics.

    Call with ``x`` of shape ``(N, ..., C)``; if ``sequential=True`` the
    leading axis is treated as a virtual time axis ``(S, N, ..., C)`` whose
    slices are normalized independently (reference per-timestep loop parity).
    """

    momentum: float = 0.1
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, train: bool = False, sequential: bool = False
    ) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        dtype = self.dtype or x.dtype

        if not train:
            mean = ra_mean.value
            var = ra_var.value
            inv = jnp.reciprocal(jnp.sqrt(var + self.eps)) * scale
            return (x.astype(dtype) - mean.astype(dtype)) * inv.astype(dtype) + bias.astype(
                dtype
            )

        # Statistics dtype: at least f32 (bf16 inputs are promoted, exactly as
        # torch computes BN stats in f32 under autocast), but NOT a downcast —
        # under jax_enable_x64 an f64 input keeps f64 stats, so sharded-vs-
        # dense equivalence tests can separate GSPMD partitioning bugs from
        # reduction-order rounding (diag: scripts/diag_spatial_ladder.py).
        sdtype = jnp.promote_types(x.dtype, jnp.float32)
        xf = x.astype(sdtype)
        if sequential:
            # Reduce over every axis except the leading S and trailing C.
            red_axes = tuple(range(1, x.ndim - 1))
            mean = jnp.mean(xf, axis=red_axes)  # (S, C)
            var = jnp.mean(jnp.square(xf), axis=red_axes) - jnp.square(mean)  # biased
            n = 1
            for a in red_axes:
                n *= x.shape[a]
            bessel = n / max(n - 1, 1)
            var_unbiased = var * bessel  # (S, C)

            if not self.is_initializing():
                s = x.shape[0]
                m = self.momentum
                decay = (1.0 - m) ** jnp.arange(s - 1, -1, -1, dtype=sdtype)  # (S,)
                ra_mean.value = (1.0 - m) ** s * ra_mean.value + m * jnp.einsum(
                    "s,sc->c", decay, mean
                )
                ra_var.value = (1.0 - m) ** s * ra_var.value + m * jnp.einsum(
                    "s,sc->c", decay, var_unbiased
                )

            shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (features,)
            inv = jnp.reciprocal(jnp.sqrt(var + self.eps)) * scale
            y = (xf - mean.reshape(shape)) * inv.reshape(shape) + bias
            return y.astype(dtype)

        red_axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axis=red_axes)
        var = jnp.mean(jnp.square(xf), axis=red_axes) - jnp.square(mean)
        n = 1
        for a in red_axes:
            n *= x.shape[a]
        var_unbiased = var * (n / max(n - 1, 1))

        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
            ra_var.value = (1.0 - m) * ra_var.value + m * var_unbiased

        inv = jnp.reciprocal(jnp.sqrt(var + self.eps)) * scale
        y = (xf - mean) * inv + bias
        return y.astype(dtype)
