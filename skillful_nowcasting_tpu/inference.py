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


def make_skill_metrics(
    model,
    *,
    num_samples: Optional[int] = None,
    thresholds=(1.0, 4.0, 8.0),
    pools=(1, 4, 16),
) -> Callable:
    """Jitted per-batch skill evaluation: ``(variables, images, future, key) -> dict``.

    Draws an ``num_samples``-member ensemble (one shared latent per member,
    quirk Q2) and computes fair CRPS (grid + ``pools`` average-pool scales,
    the Ravuri et al. 2021 evaluation), CSI at ``thresholds`` (of the
    ensemble mean), and ensemble-mean MSE — all on device; only scalars come
    back.  Build ONCE and reuse (each call of this factory creates a fresh
    jit cache entry).
    """
    from .metrics import crps_ensemble, csi, ensemble_mean_mse, pooled_crps

    generate = make_generate(model, num_samples=num_samples)
    thresholds = tuple(float(t) for t in thresholds)
    pools = tuple(int(p) for p in pools if int(p) > 1)

    @jax.jit
    def batch_metrics(variables, images, future, key):
        samples = generate(variables, images, key)
        mean = jnp.mean(samples.astype(jnp.float32), axis=0)
        out = {
            "crps": jnp.mean(crps_ensemble(samples, future)),
            "mse": ensemble_mean_mse(samples, future),
        }
        for p in pools:
            out[f"crps_pool{p}"] = jnp.mean(pooled_crps(samples, future, p))
        if thresholds:
            cs = csi(mean, future, list(thresholds))
            for i, t in enumerate(thresholds):
                out[f"csi_{t:g}"] = cs[i]
        return out

    return batch_metrics


def evaluate_nowcast(
    model,
    variables,
    batches,
    *,
    num_samples: Optional[int] = None,
    thresholds=(1.0, 4.0, 8.0),
    pools=(1, 4, 16),
    rng: Optional[jax.Array] = None,
    max_batches: Optional[int] = None,
) -> dict:
    """Paper-style skill evaluation over a batch iterator.

    Runs :func:`make_skill_metrics` on each ``(images, future_images)``
    NTHWC batch and averages.  Returns a dict of floats: ``crps``,
    ``crps_pool{p}``, ``csi_{t}``, ``mse``, ``batches``.
    """
    if rng is None:
        rng = jax.random.key(0)
    batch_metrics = make_skill_metrics(
        model, num_samples=num_samples, thresholds=thresholds, pools=pools
    )

    accum: dict = {}
    n = 0
    for images, future in batches:
        if max_batches is not None and n >= max_batches:
            break
        rng, key = jax.random.split(rng)
        m = jax.device_get(
            batch_metrics(variables, jnp.asarray(images), jnp.asarray(future), key)
        )
        for k, v in m.items():
            accum[k] = accum.get(k, 0.0) + float(v)
        n += 1
    out = {k: v / max(n, 1) for k, v in accum.items()}
    out["batches"] = n
    return out


def _tile_starts(full: int, tile: int, stride: int):
    """Start offsets covering [0, full) with a final flush-right tile."""
    if full <= tile:
        return [0]
    starts = list(range(0, full - tile, stride))
    starts.append(full - tile)
    return starts


def tiled_nowcast_device(
    model,
    variables,
    frames: np.ndarray,
    *,
    tile: int = 256,
    overlap: int = 64,
    batch_tiles: int = 16,
    rng: Optional[jax.Array] = None,
    z: Optional[jnp.ndarray] = None,
    dtype: Optional[jnp.dtype] = None,
    mesh=None,
) -> np.ndarray:
    """Device-resident giant-tile nowcast: ONE jitted program, ONE output fetch.

    The host-streaming :func:`tiled_nowcast` round-trips every overlapping
    tile through the host (~2x the field in, T_out/T_in x the field out),
    which dominates wall time on remote-tunnel backends.  Here the padded
    context field is transferred once, tiles are gathered with
    ``dynamic_slice`` on device, forwarded batch-by-batch under ``lax.scan``,
    and their interiors scattered into an HBM-resident output buffer; only
    the stitched field is fetched.  Requires the padded input + output to fit
    HBM per device (e.g. MRMS 3500x7000, 18 steps: ~2.4 GB in f32 —
    comfortable on one chip); use :func:`tiled_nowcast` for fields beyond HBM.

    ``mesh``: with a ``jax.sharding.Mesh`` the tile batches shard over the
    ``"data"`` axis (``shard_map``): every device holds the replicated field
    and its own output buffer, processes ``1/n``-th of the tile batches
    (``batch_tiles`` tiles per device per step), and the disjoint interior
    scatters are combined with ONE ``psum`` over ICI at the end — multi-chip
    CONUS nowcasts keep the single-fetch property.

    Boundary semantics differ slightly from :func:`tiled_nowcast`: the domain
    is edge-padded by ``overlap/2`` so EVERY tile (edge tiles included) crops
    a uniform ``overlap/2`` margin — static shapes for XLA.  Interior pixels
    (≥ ``overlap/2`` from the domain edge) are bit-identical per-tile model
    forwards; edge pixels condition on edge-replicated context instead of a
    flush-to-edge tile.

    All tiles share one latent draw (quirk Q2 extended to the domain), like
    :func:`tiled_nowcast`.
    """
    if overlap % 2 or tile % 32:
        raise ValueError("overlap must be even and tile a multiple of 32")
    t_in, h, w, c = frames.shape
    margin = overlap // 2
    stride = tile - overlap
    dtype = dtype or jnp.float32

    if z is None:
        if rng is None:
            rng = jax.random.key(0)
        lat = tile // 32
        z = jax.random.normal(rng, (1, lat, lat, 8 * c), jnp.float32)
    z = jnp.asarray(z, dtype)

    # Edge-pad by the crop margin, then round up so tiles at `stride` exactly
    # cover the padded field: (H' - tile) % stride == 0.
    def padded(n):
        n2 = n + 2 * margin
        if n2 < tile:
            return tile
        return tile + -(-(n2 - tile) // stride) * stride

    hp, wp = padded(h), padded(w)
    pads = ((0, 0), (margin, hp - h - margin), (margin, wp - w - margin), (0, 0))
    field = jnp.asarray(np.pad(frames, pads, mode="edge"), dtype)

    n_ranks = int(mesh.shape["data"]) if mesh is not None else 1
    hs = list(range(0, hp - tile + 1, stride))
    ws = list(range(0, wp - tile + 1, stride))
    positions = np.array([(i, j) for i in hs for j in ws], np.int32)
    pad_n = -len(positions) % (n_ranks * batch_tiles)
    if pad_n:  # sentinel (-1, -1) rows are masked out of the scatter
        positions = np.concatenate([positions, np.full((pad_n, 2), -1, np.int32)])
    # Contiguous batch blocks per rank: (n_ranks, n_batches, B, 2).
    positions = positions.reshape(n_ranks, -1, batch_tiles, 2)
    inner = tile - 2 * margin

    # t_out from the model config (DGMR/Generator expose forecast_steps).
    t_out = getattr(model, "forecast_steps", None)
    if t_out is None:
        probe = model.apply(
            variables,
            jnp.zeros((1, t_in, tile, tile, c), dtype),
            train=False,
            z=z,
        )
        t_out = probe.shape[1]
    t_out = int(t_out)

    def run_body(field, variables, z, positions):
        # NB: `field` must be an argument (not a closure capture) — captured
        # arrays become HLO constants and blow the remote-compile size limit.
        def gather(pos):  # (2,) -> (T_in, tile, tile, C); clamped for sentinels
            return jax.lax.dynamic_slice(
                field, (0, pos[0], pos[1], 0), (t_in, tile, tile, c)
            )

        zb = jnp.tile(z, (batch_tiles, 1, 1, 1))
        out0 = jnp.zeros((t_out, hp, wp, c), dtype)

        def batch_body(out, pos_b):  # pos_b: (B, 2)
            tiles = jax.vmap(gather)(pos_b)
            preds = model.apply(variables, tiles, train=False, z=zb)
            interior = preds[:, :, margin : margin + inner, margin : margin + inner, :]

            def scatter(k, out):
                # Sentinel rows re-write the current contents (a no-op): under
                # the mesh psum a duplicated real write would double-count, so
                # padding positions must not contribute.
                idx = (0, pos_b[k, 0] + margin, pos_b[k, 1] + margin, 0)
                cur = jax.lax.dynamic_slice(out, idx, interior.shape[1:])
                upd = jnp.where(pos_b[k, 0] >= 0, interior[k], cur)
                return jax.lax.dynamic_update_slice(out, upd, idx)

            return jax.lax.fori_loop(0, batch_tiles, scatter, out), None

        out, _ = jax.lax.scan(batch_body, out0, positions)
        return out

    if mesh is None:
        run_jit = jax.jit(lambda f, v, zz, p: run_body(f, v, zz, p[0]))
    else:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def run_sharded(field, variables, z, positions):
            # Per-rank block of positions: (1, n_batches, B, 2).  Disjoint
            # interiors over zero-initialized buffers -> one psum stitches
            # all ranks' contributions over ICI.
            out = run_body(field, variables, z, positions[0])
            return jax.lax.psum(out, "data")

        run_jit = jax.jit(
            shard_map(
                run_sharded,
                mesh=mesh,
                in_specs=(P(), P(), P(), P("data")),
                out_specs=P(),
                check_vma=False,
            )
        )

    out = np.asarray(run_jit(field, variables, z, jnp.asarray(positions)), np.float32)
    return out[:, margin : margin + h, margin : margin + w, :]


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
    dtype: Optional[jnp.dtype] = None,
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
        dtype: tile-forward compute dtype (``jnp.bfloat16`` for the serving
            configuration); the stitched output is always float32.

    Returns:
        ``(T_out, H, W, C)`` stitched nowcast (numpy, host memory — the
        output can exceed HBM for CONUS-scale fields).
    """
    if overlap % 2 or tile % 32:
        raise ValueError("overlap must be even and tile a multiple of 32")
    t_in, h, w, c = frames.shape
    stride = tile - overlap
    margin = overlap // 2

    dtype = dtype or jnp.float32
    if z is None:
        if rng is None:
            rng = jax.random.key(0)
        lat = tile // 32
        z = jax.random.normal(rng, (1, lat, lat, 8 * c), jnp.float32)
    z = jnp.asarray(z, dtype)

    # Pad up so every tile is full-size.
    ph = max(tile - h, 0)
    pw = max(tile - w, 0)
    if ph or pw:
        frames = np.pad(frames, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    hs = _tile_starts(frames.shape[1], tile, stride)
    ws = _tile_starts(frames.shape[2], tile, stride)

    def run_impl(batch):  # (N, T_in, tile, tile, C)
        zb = jnp.tile(z, (batch.shape[0], 1, 1, 1))
        preds = model.apply(variables, batch.astype(dtype), train=False, z=zb)
        return preds.astype(jnp.float32)

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
