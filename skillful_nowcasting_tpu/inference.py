"""Inference utilities: jitted ensemble generation and giant-tile nowcasts.

Reference context: the reference handles large-domain radar (MRMS CONUS
3500x7000, ``/root/reference/README.md:41-49``) only by cropping upstream in
the dataset; the model itself is fixed-size.  Here large tiles are first-class
(SURVEY.md §7, giant-tile inference):

* :func:`make_generate` — jitted S-sample ensemble on one chip;
* :func:`tiled_nowcast` — sliding-window inference over an arbitrarily large
  THWC radar field with overlap-and-crop stitching.  Tiles are batched onto
  the chip (or sharded over a mesh with
  :func:`skillful_nowcasting_tpu.parallel.make_dp_generate`), and every tile
  shares one latent draw so the stitched field has a coherent ensemble
  member (quirk Q2 semantics extended to the tiled domain).

Semantics note: the model's latent grid is tied to its configured
``output_shape``, so a "full-field" forward on CONUS-scale domains does not
exist in the reference either (it crops upstream).  Tiled inference defines
the giant-domain semantics: each tile is an exact fixed-size model forward,
all tiles share one latent draw, and interior seams crop ``overlap/2``
margins to suppress boundary effects from the rollout's growing receptive
field (larger ``overlap`` → smoother seams, more recompute).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def make_generate(
    model, *, num_samples: Optional[int] = None, shared_context: bool = True
) -> Callable:
    """Jitted ensemble generation: ``(variables, x, rng) -> (S, B, T, H, W, C)``.

    ``shared_context=True`` (default) computes the deterministic conditioning
    stack once and folds the S samples into the sampler's batch axis
    (``generate_ensemble``) — identical outputs, one context pass instead of
    S.  Set ``False`` for the literal S-independent-forwards formulation
    (lower peak memory at large ``S * B``).
    """
    n = num_samples if num_samples is not None else getattr(model, "num_samples", 6)

    if shared_context and hasattr(type(model), "generate_ensemble"):

        @jax.jit
        def generate(variables, x, rng):
            return model.apply(
                variables,
                x,
                n,
                rngs={"latent": rng},
                method=type(model).generate_ensemble,
            )

        return generate

    @jax.jit
    def generate(variables, x, rng):
        def body(_, key):
            return None, model.apply(variables, x, train=False, rngs={"latent": key})

        _, samples = jax.lax.scan(body, None, jax.random.split(rng, n))
        return samples

    return generate


def _tile_starts(full: int, tile: int, stride: int):
    """Start offsets covering [0, full) with a final flush-right tile."""
    if full <= tile:
        return [0]
    starts = list(range(0, full - tile, stride))
    starts.append(full - tile)
    return starts


def tiled_nowcast(
    model,
    variables,
    frames: np.ndarray,
    *,
    tile: int = 256,
    overlap: int = 64,
    batch_tiles: int = 8,
    rng: Optional[jax.Array] = None,
    z: Optional[jnp.ndarray] = None,
    mesh=None,
) -> np.ndarray:
    """Nowcast an arbitrarily large THWC radar field by tiling.

    Args:
        model: a DGMR/Generator-like module whose ``apply`` maps
            ``(1, T_in, tile, tile, C) -> (1, T_out, tile, tile, C)``.
        variables: model variables (e.g. from ``from_pretrained``).
        frames: context frames ``(T_in, H, W, C)`` — e.g. MRMS 3500x7000.
        tile: model input size (must match the model's ``output_shape``).
        overlap: overlap between adjacent tiles; ``overlap/2`` margins are
            cropped from interior seams.
        batch_tiles: tiles batched per device call.
        rng: PRNG key for the shared latent (ignored if ``z`` given).
        z: optional fixed latent ``(1, tile/32, tile/32, 8C)`` shared by all
            tiles.
        mesh: optional ``jax.sharding.Mesh`` — tile batches shard over its
            ``"data"`` axis (tiles are independent, so multi-chip giant-tile
            inference is embarrassingly parallel over ICI; ``batch_tiles``
            must be a multiple of the axis size).

    Returns:
        ``(T_out, H, W, C)`` stitched nowcast (numpy, host memory — the
        output can exceed HBM for CONUS-scale fields).
    """
    if overlap % 2 or tile % 32:
        raise ValueError("overlap must be even and tile a multiple of 32")
    t_in, h, w, c = frames.shape
    stride = tile - overlap
    margin = overlap // 2

    if z is None:
        if rng is None:
            rng = jax.random.key(0)
        lat = tile // 32
        z = jax.random.normal(rng, (1, lat, lat, 8 * c), jnp.float32)

    # Pad up so every tile is full-size.
    ph = max(tile - h, 0)
    pw = max(tile - w, 0)
    if ph or pw:
        frames = np.pad(frames, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    hs = _tile_starts(frames.shape[1], tile, stride)
    ws = _tile_starts(frames.shape[2], tile, stride)

    def run_impl(batch):  # (N, T_in, tile, tile, C)
        zb = jnp.tile(z, (batch.shape[0], 1, 1, 1))
        return model.apply(variables, batch, train=False, z=zb)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(mesh, P("data"))
        if batch_tiles % mesh.shape["data"]:
            raise ValueError("batch_tiles must be a multiple of the data axis size")
        run = jax.jit(run_impl, in_shardings=data, out_shardings=data)
    else:
        run = jax.jit(run_impl)

    positions = [(i, j) for i in hs for j in ws]
    out = None
    for start in range(0, len(positions), batch_tiles):
        chunk = positions[start : start + batch_tiles]
        batch = np.stack(
            [frames[:, i : i + tile, j : j + tile, :] for i, j in chunk]
        ).astype(np.float32)
        pad_n = batch_tiles - batch.shape[0]
        if pad_n:  # keep a single compiled shape
            batch = np.concatenate([batch, np.repeat(batch[-1:], pad_n, 0)])
        preds = np.asarray(run(jnp.asarray(batch)))  # (N, T_out, tile, tile, C)
        if out is None:
            t_out = preds.shape[1]
            out = np.zeros((t_out, frames.shape[1], frames.shape[2], c), np.float32)
        for (i, j), pred in zip(chunk, preds):
            # Interior seams crop `margin`; domain edges keep the full tile.
            top = 0 if i == 0 else margin
            left = 0 if j == 0 else margin
            bottom = tile if i + tile >= frames.shape[1] else tile - margin
            right = tile if j + tile >= frames.shape[2] else tile - margin
            out[:, i + top : i + bottom, j + left : j + right, :] = pred[
                :, top:bottom, left:right, :
            ]
    return out[:, :h, :w, :]
