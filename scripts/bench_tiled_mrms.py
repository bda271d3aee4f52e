"""Giant-tile (MRMS CONUS-scale) nowcast benchmark on the real chip.

The reference's MRMS dataset is 3500x7000 CONUS radar
(``/root/reference/README.md:41-49``), which the reference can only consume
pre-cropped.  This framework nowcasts the FULL field via
:func:`skillful_nowcasting_tpu.inference.tiled_nowcast` (overlap-and-crop
tiling, one shared latent across tiles — quirk Q2 extended to the domain).

Measures end-to-end wall time (device compute + host<->device transfer +
stitching) for an 18-step nowcast of one synthetic 3500x7000 field, and
reports effective megapixel-frames/sec.  Run on the axon TPU:

    python scripts/bench_tiled_mrms.py [--height 3500 --width 7000]
        [--tile 256 --overlap 64 --batch-tiles 16] [--bf16]

Timing note: everything is forced through ``np.asarray`` fetches inside
``tiled_nowcast`` itself, so wall time is tunnel-trustworthy (CLAUDE.md:
``block_until_ready`` alone is not).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=3500)
    p.add_argument("--width", type=int, default=7000)
    p.add_argument("--tile", type=int, default=256)
    p.add_argument("--overlap", type=int, default=64)
    p.add_argument("--batch-tiles", type=int, default=16)
    p.add_argument("--bf16", action="store_true", help="bfloat16 tile forwards")
    p.add_argument(
        "--stripes", type=int, default=1,
        help="fetch stripes for the device path (D2H of stripe k overlaps "
        "compute of stripe k+1)",
    )
    p.add_argument(
        "--host",
        action="store_true",
        help="host-streaming tiled_nowcast (default: device-resident, one fetch)",
    )
    args = p.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir, ".jax_cache"),
    )
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from skillful_nowcasting_tpu import DGMR
    from skillful_nowcasting_tpu.hub.pretrained import abstract_variables
    from skillful_nowcasting_tpu.inference import tiled_nowcast, tiled_nowcast_device
    from skillful_nowcasting_tpu.utils import random_fill_variables

    print(f"devices: {jax.devices()}", file=sys.stderr)
    model = DGMR(output_shape=args.tile)  # paper config at the tile size
    variables = random_fill_variables(abstract_variables(model), jax.random.key(0))
    variables = jax.device_put(variables)

    rng = np.random.default_rng(0)
    frames = rng.random((4, args.height, args.width, 1)).astype(np.float32)

    kwargs = dict(
        tile=args.tile,
        overlap=args.overlap,
        batch_tiles=args.batch_tiles,
        rng=jax.random.key(1),
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    if not args.host:
        kwargs["fetch_stripes"] = args.stripes
    fn = tiled_nowcast if args.host else tiled_nowcast_device

    # Warm compile at the FULL field size (the tile-scan length and output
    # buffer shape are part of the compiled program) so the timed pass is
    # pure run.
    t0 = time.time()
    fn(model, variables, frames, **kwargs)
    print(f"compile+warmup: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    out = fn(model, variables, frames, **kwargs)
    dt = time.time() - t0
    t_out, h, w, _ = out.shape
    assert (h, w) == (args.height, args.width)
    assert np.isfinite(out).all()
    mpx_frames = t_out * h * w / 1e6
    stride = args.tile - args.overlap
    n_tiles = (len(range(0, max(h - args.tile, 0), stride)) + 1) * (
        len(range(0, max(w - args.tile, 0), stride)) + 1
    )
    mode = f"device-s{args.stripes}" if not args.host else "host"
    print(
        f"[tiled-{mode} {'bf16' if args.bf16 else 'f32'}] {h}x{w} {t_out}-step nowcast: "
        f"{dt:.1f}s end-to-end ({n_tiles} tiles) -> "
        f"{mpx_frames / dt:.1f} Mpx-frames/sec (incl. host stitching + tunnel transfers)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
