"""Bisect the spatial-train divergence (diag_spatial_fwd.py) by submodule.

Runs each generator stage (conditioning stack, latent stack, sampler) in
train mode under (a) plain jit and (b) the 2D data x space GSPMD sharding,
and compares outputs + mutated collections.  All inputs explicit and
replicated except x, so the only GSPMD freedom is internal.
"""

import argparse
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import sys

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

import jax.numpy as jnp
import numpy as np

from skillful_nowcasting_tpu import DGMR
from skillful_nowcasting_tpu.parallel import make_mesh, shard_batch
from skillful_nowcasting_tpu.parallel.mesh import batch_sharding, replicated_sharding
from skillful_nowcasting_tpu.training import desaturate_discriminator, init_train_state

parser = argparse.ArgumentParser()
parser.add_argument("--size", type=int, default=64)
parser.add_argument("--x64", action="store_true")
parser.add_argument("--space", type=int, default=4)
args = parser.parse_args()
SIZE = args.size
if args.x64:
    jax.config.update("jax_enable_x64", True)

model = DGMR(
    forecast_steps=2,
    input_channels=1,
    output_shape=SIZE,
    latent_channels=256,
    context_channels=32,
    generation_steps=1,
    num_samples=1,
    num_spatial_layers=2,
    num_temporal_layers=2,
)

DT = jnp.float64 if args.x64 else jnp.float32
rng = np.random.default_rng(0)
images = jnp.asarray(rng.random((8, 4, SIZE, SIZE, 1)), DT)
future = jnp.asarray(rng.random((8, 2, SIZE, SIZE, 1)), DT)
state = init_train_state(model, jax.random.key(0), images[:1], future[:1])
state = state.replace(params=desaturate_discriminator(state.params))
variables = {
    "params": state.params,
    "batch_stats": state.batch_stats,
    "spectral": state.spectral,
}
if args.x64:
    variables = jax.tree.map(
        lambda x: x.astype(jnp.float64)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        variables,
    )

mesh = make_mesh(n_data=2, n_space=args.space)
repl = replicated_sharding(mesh)
data = batch_sharding(mesh, spatial_axis="space")
xs = shard_batch(images, mesh, spatial_axis="space")


def report(tag, a, b):
    for name, xa, xb in (
        ("out", a[0], b[0]),
        ("mutated", a[1], b[1]),
    ):
        la, lb = jax.tree.leaves(xa), jax.tree.leaves(xb)
        gmax = max(
            (float(np.max(np.abs(np.asarray(y, np.float64)))) for y in lb),
            default=0.0,
        ) or 1e-30
        err = max(
            (
                float(
                    np.max(np.abs(np.asarray(p, np.float64) - np.asarray(q, np.float64)))
                )
                for p, q in zip(la, lb)
            ),
            default=0.0,
        )
        print(
            f"{tag:22s} {name:8s} max_err={err:.3e} gmax={gmax:.3e} "
            f"err/gmax={err / gmax:.3e}",
            flush=True,
        )


def run(tag, fn, *inputs, in_shardings):
    single = jax.jit(fn)(variables, *inputs)
    sharded = jax.jit(
        fn, in_shardings=(repl,) + in_shardings, out_shardings=repl
    )(variables, *inputs)
    report(tag, sharded, single)
    return single


# --- 1. conditioning stack (train mode: BN batch stats + SN updates) -------
def ctx_fn(v, x):
    states, mut = model.apply(
        v,
        x,
        train=True,
        method=lambda m, x, train: m.conditioning_stack(x, train=train),
        mutable=["batch_stats", "spectral"],
    )
    return tuple(states), mut


ctx_single = run("conditioning", ctx_fn, images, in_shardings=(data,))
# also with the SHARDED x for the sharded run (placement only matters for in_shardings)

# --- 2. latent stack with fixed z ------------------------------------------
h = w = SIZE // 32
z_fixed = jnp.asarray(
    np.random.default_rng(9).standard_normal((1, h, w, 8)), DT
)


def lat_fn(v, x, z):
    out, mut = model.apply(
        v,
        x,
        train=True,
        method=lambda m, x, train, z: m.latent_stack(x, z=z, train=train),
        mutable=["batch_stats", "spectral"],
        z=z,
    )
    return out, mut


lat_single = run("latent(fixed z)", lat_fn, images, z_fixed, in_shardings=(data, repl))

# --- 3. sampler, fed the SINGLE-device stage outputs (replicated) -----------
states_in = jax.tree.map(jnp.asarray, ctx_single[0])
lat_in = lat_single[0]


def samp_fn(v, states, lat):
    out, mut = model.apply(
        v,
        states,
        lat,
        train=True,
        method=lambda m, s, l, train: m.sampler(s, l, train=train),
        mutable=["batch_stats", "spectral"],
    )
    return out, mut


run("sampler(repl inputs)", samp_fn, states_in, lat_in, in_shardings=(repl, repl))

# --- 3b. sampler with the conditioning states SHARDED like the model would --
state_shardings = tuple(
    jax.NamedSharding(mesh, jax.sharding.PartitionSpec("data", None, "space"))
    for _ in states_in
)
from jax.sharding import NamedSharding, PartitionSpec as P

st_sh = tuple(NamedSharding(mesh, P("data", "space")) for _ in states_in)
try:
    states_sharded = tuple(
        jax.device_put(s, NamedSharding(mesh, P("data", None, "space")))
        for s in states_in
    )
    single = jax.jit(samp_fn)(variables, states_in, lat_in)
    sharded = jax.jit(
        samp_fn,
        in_shardings=(
            repl,
            tuple(NamedSharding(mesh, P("data", None, "space")) for _ in states_in),
            repl,
        ),
        out_shardings=repl,
    )(variables, states_sharded, lat_in)
    report("sampler(sharded st)", sharded, single)
except Exception as e:  # uneven shard of tiny state dims
    print("sampler(sharded st) skipped:", e)
