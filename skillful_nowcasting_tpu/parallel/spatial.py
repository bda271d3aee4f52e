"""Spatial sharding with halo exchange over the ``space`` mesh axis.

The CP-analog for conv nets (SURVEY.md §5 "long-context" / §7 hard part 7):
shard the H axis of NHWC activations across devices and exchange
receptive-field halos with ``ppermute`` over ICI before each convolution.

For DGMR's giant-tile *inference* the overlap-tile decomposition
(`inference.tiled_nowcast`) is strictly better — tiles are independent, so
there is zero per-conv communication (see docs/DESIGN.md).  Halo exchange is
the right tool when a single field must evolve *jointly* under sharded
convs — e.g. spatially-sharded training at output sizes whose activations
exceed one chip's HBM.  This module provides the exact building blocks:

* :func:`halo_exchange` — pull ``halo`` rows from both H-neighbors (zeros at
  the domain boundary, matching SAME zero padding);
* :func:`halo_conv2d` — a 3x3/SAME conv over H-sharded activations that is
  bitwise equal to the unsharded conv;
* :func:`make_spatial_conv` — jitted shard_map wrapper over a mesh.

Exactness is pinned by ``tests/test_parallel.py::test_halo_conv_matches_dense``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Prepend/append ``halo`` rows from the H-neighbors of this shard.

    ``x`` is the local shard ``(B, H_local, W, C)``; returns
    ``(B, H_local + 2*halo, W, C)``.  Missing neighbors at the domain edges
    contribute zero rows — identical to SAME zero padding, so a subsequent
    VALID conv in H reproduces the unsharded SAME conv exactly.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    # My bottom rows go to the next shard (they become its top halo).
    from_prev = jax.lax.ppermute(
        x[:, -halo:], axis_name, perm=[(i, i + 1) for i in range(n - 1)]
    )
    # My top rows go to the previous shard (they become its bottom halo).
    from_next = jax.lax.ppermute(
        x[:, :halo], axis_name, perm=[(i + 1, i) for i in range(n - 1)]
    )
    zeros = jnp.zeros_like(x[:, :halo])
    top = jnp.where(idx == 0, zeros, from_prev)
    bottom = jnp.where(idx == n - 1, zeros, from_next)
    return jnp.concatenate([top, x, bottom], axis=1)


def halo_conv2d(
    x: jnp.ndarray, kernel: jnp.ndarray, axis_name: str, padding: int = 1
) -> jnp.ndarray:
    """SAME conv over H-sharded NHWC activations (exact vs the dense conv).

    ``kernel`` is HWIO with odd H size; ``padding`` must equal
    ``(kernel_h - 1) // 2`` (stride 1).
    """
    kh = kernel.shape[0]
    if padding != (kh - 1) // 2:
        raise ValueError("padding must match the kernel for SAME semantics")
    xh = halo_exchange(x, padding, axis_name) if padding else x
    dn = jax.lax.conv_dimension_numbers(xh.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    # H already padded by the halos -> VALID in H, SAME-style pad in W.
    return jax.lax.conv_general_dilated(
        xh,
        kernel,
        (1, 1),
        [(0, 0), (padding, padding)],
        dimension_numbers=dn,
    )


def make_spatial_conv(mesh: Mesh, *, padding: int = 1, axis: str = "space"):
    """Jitted H-sharded conv: ``(x (B,H,W,C) sharded on H, kernel) -> y``."""

    def conv(x, kernel):
        return halo_conv2d(x, kernel, axis, padding=padding)

    mapped = shard_map(
        conv,
        mesh=mesh,
        in_specs=(P(None, axis), P()),
        out_specs=P(None, axis),
        check_vma=False,
    )
    x_sharding = NamedSharding(mesh, P(None, axis))
    return jax.jit(
        mapped,
        in_shardings=(x_sharding, NamedSharding(mesh, P())),
        out_shardings=x_sharding,
    )


def make_spatial_forward(
    model,
    mesh: Mesh,
    *,
    spatial_axis: str = "space",
    batch_axis: Optional[str] = "data",
):
    """Whole-model generator forward with activations H-sharded via GSPMD.

    The manual :func:`halo_conv2d` building blocks above prove the halo
    pattern; this is the production path: jit ``model.apply`` with the NTHWC
    input's H axis sharded over ``spatial_axis`` (and batch over
    ``batch_axis``), parameters replicated, and let XLA's SPMD partitioner
    insert the halo ``collective-permute``s for every conv in the pyramid —
    the TPU-native equivalent of hand-written decomposition. Use it when one
    field must evolve *jointly* under sharded convs (activation footprint
    beyond one chip's HBM); for independent-tile serving
    ``inference.tiled_nowcast_device`` is strictly cheaper (zero per-conv
    communication, docs/DESIGN.md).

    Returns ``fwd(variables, x, key) -> y`` with ``x``/``y``
    ``(B, T, H, W, C)`` sharded ``P(batch_axis, None, spatial_axis)``.
    Exactness vs the unsharded forward (same key; the latent draw is
    layout-invariant under partitionable threefry) is pinned by
    ``tests/test_parallel.py::test_spatial_forward_matches_dense``, which
    also asserts the compiled module really contains cross-``space``
    collectives rather than silently replicating.

    Replaces the capability the reference lacks entirely (its 256² fields
    fit one GPU; `/root/reference/dgmr/dgmr.py:132-135` is single-device).
    """
    io_spec = P(batch_axis, None, spatial_axis)
    io_sharding = NamedSharding(mesh, io_spec)
    replicated = NamedSharding(mesh, P())

    def forward(variables, x, key):
        return model.apply(variables, x, train=False, rngs={"latent": key})

    return jax.jit(
        forward,
        in_shardings=(replicated, io_sharding, replicated),
        out_shardings=io_sharding,
    )
