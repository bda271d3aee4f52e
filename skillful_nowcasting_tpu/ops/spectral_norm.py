"""Spectral normalization with exact PyTorch parametrization semantics.

The reference wraps nearly every conv/linear in
``torch.nn.utils.parametrizations.spectral_norm`` (e.g.
``/root/reference/dgmr/layers/ConvGRU.py:29-55``,
``/root/reference/dgmr/common.py:43-66``).  Checkpoint parity (SURVEY.md quirk
Q10) requires reproducing:

* weight matrix = kernel permuted so the *output* axis is first, flattened to
  ``(out, fan_in)``;
* power iteration (per training forward):
  ``u <- normalize(W v); v <- normalize(W^T u)`` with
  ``normalize(x) = x / max(||x||_2, eps)``;
* ``sigma = u . (W v)`` computed with the *updated* (train) or *stored*
  (eval) vectors;
* fresh init: u, v ~ N(0,1) normalized, then 15 power iterations.

In this functional JAX formulation the (u, v) buffers live in the
``"spectral"`` variable collection; a training step runs with
``mutable=["spectral", "batch_stats"]`` and threads the new values forward,
mirroring torch's in-place buffer update.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _l2_normalize(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """torch.nn.functional.normalize: x / max(||x||_2, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x)))
    return x / jnp.maximum(norm, eps)


def kernel_to_weight_mat(kernel: jnp.ndarray) -> jnp.ndarray:
    """Reshape an HWIO / DHWIO / (in,out) kernel to torch's (out, fan_in) matrix.

    Torch reshapes its (out, in, *k) weight to (out, in*prod(k)); our kernels
    store the output axis last, so the permutation below reproduces the exact
    element ordering of the torch weight matrix: (out, in, k0, k1, ...).
    """
    ndim = kernel.ndim
    if ndim == 2:  # Linear kernel stored (in, out)
        return kernel.T
    # Conv kernel stored (*spatial, in, out) -> (out, in, *spatial)
    perm = (ndim - 1, ndim - 2) + tuple(range(ndim - 2))
    return jnp.transpose(kernel, perm).reshape(kernel.shape[-1], -1)


def power_iteration(
    weight_mat: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    eps: float,
    n_iterations: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run torch-ordered power iterations: u first, then v."""

    def body(_, uv):
        u, v = uv
        u = _l2_normalize(weight_mat @ v, eps)
        v = _l2_normalize(weight_mat.T @ u, eps)
        return u, v

    if n_iterations == 1:  # avoid a fori_loop for the common case
        return body(0, (u, v))
    return jax.lax.fori_loop(0, n_iterations, body, (u, v))


def init_uv(
    key: jax.Array, weight_mat: jnp.ndarray, eps: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fresh (u, v): normalized gaussians + 15 power iterations (torch init)."""
    h, w = weight_mat.shape
    ku, kv = jax.random.split(key)
    u = _l2_normalize(jax.random.normal(ku, (h,), weight_mat.dtype), eps)
    v = _l2_normalize(jax.random.normal(kv, (w,), weight_mat.dtype), eps)
    return power_iteration(weight_mat, u, v, eps, n_iterations=15)


def spectral_sigma(weight_mat: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """sigma = u . (W v), torch's estimate of the top singular value."""
    return jnp.vdot(u, weight_mat @ v)


def normalize_kernel(
    kernel: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    eps: float,
    update: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Return (kernel / sigma, new_u, new_v).

    ``update=True`` mirrors torch train mode (one power iteration before the
    sigma estimate); ``update=False`` mirrors eval (stored u, v reused).

    The power iteration itself is non-differentiated (torch wraps it in
    ``no_grad``); gradients flow through ``sigma = u . (W v)`` with u, v
    treated as constants, exactly like torch's ``.clone()`` of the buffers.
    """
    weight_mat = kernel_to_weight_mat(kernel)
    if update:
        new_u, new_v = power_iteration(
            jax.lax.stop_gradient(weight_mat), u, v, eps, n_iterations=1
        )
    else:
        new_u, new_v = u, v
    sigma = spectral_sigma(weight_mat, jax.lax.stop_gradient(new_u), jax.lax.stop_gradient(new_v))
    return kernel / sigma, new_u, new_v
