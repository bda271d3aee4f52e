"""Mesh construction and canonical shardings.

TPU-native replacement for the reference's implicit Lightning-DDP process
group (SURVEY.md §2.8).  One mesh with a ``"data"`` axis covers DGMR-scale
models (O(10^7-10^8) params → DP-only); a second ``"space"`` axis is used by
the giant-tile spatial sharding in :mod:`.spatial`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    *,
    n_space: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ``(data, space)`` mesh over the available devices.

    ``n_data`` defaults to ``len(devices) // n_space``.  On a multi-host
    TPU slice call :func:`init_distributed` first so ``jax.devices()`` spans
    all hosts.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_space
    n = n_data * n_space
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(n_data, n_space)
    return Mesh(arr, ("data", "space"))


def batch_sharding(mesh: Mesh, *, spatial_axis: Optional[str] = None) -> NamedSharding:
    """Batch-axis sharding over ``data`` (leading axis of NTHWC batches).

    With ``spatial_axis`` the batch's H axis (axis 2 of NTHWC) is *also*
    sharded over that mesh axis — the 2D data x space layout used by the
    GSPMD spatial modes in :mod:`.dp` / :mod:`.spatial`.
    """
    if spatial_axis is None:
        return NamedSharding(mesh, P("data"))
    return NamedSharding(mesh, P("data", None, spatial_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed(**kwargs) -> None:
    """Multi-host init (``jax.distributed.initialize``); no-op if single-host.

    Call before any backend use on multi-host TPU slices so the mesh spans
    hosts and collectives ride ICI within a slice / DCN across slices.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process
