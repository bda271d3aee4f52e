"""Noise-vs-bug diagnostic for the 2D data x space GSPMD TRAIN step.

``tests/test_parallel.py::test_dp_train_step_pjit_spatial_matches_single_device``
failed marginally on the 128^2 dryrun config: g_params max err 2.497e5 vs the
2e-2 * global-max floor 2.368e5 (i.e. 2.11e-2 of the global gradient max vs
the 2e-2 noise floor calibrated on the 1D shard_map-vs-vmap comparison).

The spatial pjit mode jits the IDENTICAL ``make_train_step`` program with
H-sharded in_shardings (``parallel/dp.py``) — there is no hand-written halo
or reduction code whose semantics could differ — so the only candidate
causes are (a) float accumulation-order noise from GSPMD's partitioned
reductions (conv halo partial sums, two-axis gradient psums) or (b) an XLA
GSPMD miscompile.  Discriminator: run the same comparison on a small 64^2
config at f32 AND f64.  Accumulation noise scales with the dtype epsilon
(f64 collapses ~1e9x); a miscompile does not.

Usage (CPU, 8 virtual devices; run both):
    python scripts/diag_spatial_train_noise.py
    python scripts/diag_spatial_train_noise.py --x64

Result (2026-08-19, recorded in tests/test_parallel.py spatial-train test
docstring): see the printed err/gmax lines.
"""

import argparse
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--x64", action="store_true")
parser.add_argument("--size", type=int, default=64)
parser.add_argument("--space", type=int, default=4)
args = parser.parse_args()

import jax

jax.config.update("jax_platforms", "cpu")
if args.x64:
    jax.config.update("jax_enable_x64", True)

from skillful_nowcasting_tpu.utils import compile_cache_dir

jax.config.update(
    "jax_compilation_cache_dir",
    compile_cache_dir(
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np
import optax

from skillful_nowcasting_tpu import DGMR
from skillful_nowcasting_tpu.parallel import (
    make_dp_train_step,
    make_mesh,
    shard_batch,
)
from skillful_nowcasting_tpu.training import (
    desaturate_discriminator,
    init_train_state,
    make_train_step,
    split_params,
)

dtype = jnp.float64 if args.x64 else jnp.float32
model = DGMR(
    forecast_steps=2,
    input_channels=1,
    output_shape=args.size,
    latent_channels=256,
    context_channels=32,
    generation_steps=1,
    num_samples=1,
    num_spatial_layers=2,
    num_temporal_layers=2,
)

rng = np.random.default_rng(0)
images = jnp.asarray(rng.random((8, 4, args.size, args.size, 1)), dtype)
future = jnp.asarray(rng.random((8, 2, args.size, args.size, 1)), dtype)

state = init_train_state(model, jax.random.key(0), images[:1], future[:1])
state = state.replace(params=desaturate_discriminator(state.params))
if args.x64:
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(jnp.float64) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        t,
    )
    state = state.replace(
        params=cast(state.params),
        batch_stats=cast(state.batch_stats),
        spectral=cast(state.spectral),
    )

sgd_pair = (optax.sgd(5e-5), optax.sgd(2e-4))
g0, d0 = split_params(state.params)
state = state.replace(
    g_opt_state=sgd_pair[0].init(g0), d_opt_state=sgd_pair[1].init(d0)
)

step_rng = jax.random.key(24)
single = jax.jit(make_train_step(model, logging_forward=False, optimizers=sgd_pair))
new_single, _ = single(state, images, future, step_rng)


def report(tag, new_state):
    for name, (a, b) in {
        "g_params": tuple(
            zip(split_params(new_state.params), split_params(new_single.params))
        )[0],
        "d_params": tuple(
            zip(split_params(new_state.params), split_params(new_single.params))
        )[1],
        "batch_stats": (new_state.batch_stats, new_single.batch_stats),
    }.items():
        la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
        gmax = max(float(np.max(np.abs(np.asarray(y, np.float64)))) for y in lb)
        err = max(
            float(
                np.max(
                    np.abs(np.asarray(x, np.float64) - np.asarray(y, np.float64))
                )
            )
            for x, y in zip(la, lb)
        )
        print(
            f"{tag:14s} {name:12s} max_err={err:.3e} gmax={gmax:.3e} "
            f"err/gmax={err / gmax:.3e}",
            flush=True,
        )


for tag, mesh, sp in (
    ("pjit-1d", make_mesh(n_data=8), None),
    (f"pjit-2d-sp{args.space}", make_mesh(n_data=8 // args.space, n_space=args.space), "space"),
):
    step = make_dp_train_step(
        model,
        mesh,
        logging_forward=False,
        donate_state=False,
        mode="pjit",
        optimizers=sgd_pair,
        spatial_axis=sp,
    )
    batch = shard_batch((images, future), mesh, spatial_axis=sp)
    new_state, _ = step(state, *batch, step_rng)
    report(tag, new_state)

print("dtype:", dtype.__name__ if hasattr(dtype, "__name__") else dtype)
