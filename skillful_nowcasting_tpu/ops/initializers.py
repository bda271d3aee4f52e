"""Parameter initializers matching PyTorch layer defaults.

The reference implementation (``/root/reference/dgmr``) relies on the PyTorch
default initializers for ``nn.Conv2d``/``nn.Conv3d``/``nn.Linear``:
``kaiming_uniform_(weight, a=sqrt(5))`` for the kernel and a uniform
``(-1/sqrt(fan_in), 1/sqrt(fan_in))`` for the bias.  Matching these exactly
matters for from-scratch training parity (the GAN is sensitive to init scale),
so we provide JAX initializers with identical distributions.

Kernel layout is TPU-native HWIO (``(kh, kw, in, out)``) for 2-D convs and
DHWIO for 3-D convs; ``fan_in`` is computed over every axis except the output
axis (last), which matches torch's fan-in over ``(in, *kernel_size)``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _fan_in_from_kernel_shape(shape) -> int:
    """Fan-in for an HWIO/DHWIO kernel: product of all dims except the last."""
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    return int(fan_in)


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """kaiming_uniform_(a=sqrt(5)) on an HWIO kernel.

    bound = sqrt(6 / ((1 + a^2) * fan_in)) = sqrt(1 / fan_in).
    """
    fan_in = _fan_in_from_kernel_shape(shape)
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """Torch Linear default on an (in, out) kernel: fan_in = in_features."""
    fan_in = shape[0]
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_bias_init(fan_in: int):
    """uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)), torch Conv/Linear bias default."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init
