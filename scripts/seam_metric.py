"""Quantify tiled-nowcast seam discontinuity vs overlap (SURVEY §7 hard part 7).

Each interior output pixel of ``tiled_nowcast``/``tiled_nowcast_device`` is
written by exactly one tile; adjacent pixels on opposite sides of a stitch
boundary were computed by different tiles whose receptive fields differ.  The
seam metric compares the first-difference jump ACROSS stitch boundaries
against the field's own neighbor-to-neighbor variation away from seams:

    seam_ratio = max cross-seam |Δ|  /  p99.9 non-seam |Δ|

A ratio ~1 means seams are indistinguishable from the field's natural
texture; a large ratio means visible stitching artifacts.  Larger ``overlap``
pushes each tile's crop margin further from its zero/context-padded edge, so
the ratio should fall toward 1 as overlap grows.

Run on CPU (tiny config, smooth synthetic input):
    python scripts/seam_metric.py
Prints an overlap -> seam table for docs/DESIGN.md.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from skillful_nowcasting_tpu.utils import compile_cache_dir

jax.config.update(
    "jax_compilation_cache_dir",
    compile_cache_dir(
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np

from skillful_nowcasting_tpu import DGMR
from skillful_nowcasting_tpu.hub.pretrained import abstract_variables
from skillful_nowcasting_tpu.inference import (
    seam_discontinuity,
    smooth_test_field,
    tiled_nowcast,
    tiled_nowcast_device,
)
from skillful_nowcasting_tpu.utils import random_fill_variables

TINY = dict(
    forecast_steps=2,
    input_channels=1,
    output_shape=128,
    latent_channels=256,
    context_channels=32,
    generation_steps=1,
    num_samples=1,
)


def main():
    model = DGMR(**TINY)
    variables = random_fill_variables(abstract_variables(model), jax.random.key(0))
    frames = smooth_test_field(4, 256, 256, 1, seed=7)
    z = jax.random.normal(jax.random.key(3), (1, 4, 4, 8))

    print(f"{'fn':22s} {'overlap':>7s} {'seam_max':>10s} {'bg_p999':>10s} {'ratio':>7s}")
    for fn_name, fn in (
        ("tiled_nowcast_device", tiled_nowcast_device),
        ("tiled_nowcast", tiled_nowcast),
    ):
        for overlap in (16, 32, 64):
            out = fn(
                model, variables, frames, tile=128, overlap=overlap,
                batch_tiles=4, z=z,
            ) if fn is tiled_nowcast_device else fn(
                model, variables, frames, tile=128, overlap=overlap, z=z
            )
            m = seam_discontinuity(
                np.asarray(out), tile=128, overlap=overlap,
                device=fn is tiled_nowcast_device,
            )
            print(
                f"{fn_name:22s} {overlap:7d} {m['seam_max']:10.4g} "
                f"{m['bg_p999']:10.4g} {m['ratio']:7.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
