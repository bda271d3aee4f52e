"""Localize the sampler sharded-state divergence in (H, W) and by stage.

Follow-up to diag_spatial_bisect.py: the sampler with spatially-sharded
initial states diverges from the dense run even at f64 (err/gmax ~2e-4),
i.e. a genuinely different computation, not accumulation noise.  This
script maps WHERE the error lives:

* per-column |err| profile along the sharded axis (W) of the output —
  error spikes at shard boundaries implicate conv halo / edge padding
  partitioning; a flat profile implicates global statistics (BN);
* the same comparison for each GRU level's output sequence, to find the
  first diverging stage inside the sampler.
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
from jax.sharding import NamedSharding, PartitionSpec as P

from skillful_nowcasting_tpu import DGMR
from skillful_nowcasting_tpu.parallel import make_mesh
from skillful_nowcasting_tpu.parallel.mesh import replicated_sharding
from skillful_nowcasting_tpu.training import desaturate_discriminator, init_train_state

parser = argparse.ArgumentParser()
parser.add_argument("--size", type=int, default=128)
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

# Stage inputs from the dense run (replicated placement).
def ctx_fn(v, x):
    states, mut = model.apply(
        v,
        x,
        train=True,
        method=lambda m, x, train: m.conditioning_stack(x, train=train),
        mutable=["batch_stats", "spectral"],
    )
    return tuple(states), mut


h = w = SIZE // 32
z_fixed = jnp.asarray(np.random.default_rng(9).standard_normal((1, h, w, 8)), DT)


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


states_in = jax.jit(ctx_fn)(variables, images)[0]
lat_in = jax.jit(lat_fn)(variables, images, z_fixed)[0]


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


st_shard = tuple(
    NamedSharding(mesh, P("data", None, "space")) for _ in states_in
)
states_sharded = tuple(
    jax.device_put(s, sh) for s, sh in zip(states_in, st_shard)
)
dense = jax.jit(samp_fn)(variables, states_in, lat_in)
shard = jax.jit(
    samp_fn, in_shardings=(repl, st_shard, repl), out_shardings=repl
)(variables, states_sharded, lat_in)

out_d = np.asarray(dense[0], np.float64)
out_s = np.asarray(shard[0], np.float64)
err = np.abs(out_s - out_d)  # (B, T, H, W, C)
print(f"output max_err={err.max():.3e}  gmax={np.abs(out_d).max():.3e}")

prof_w = err.max(axis=(0, 1, 2, 4))  # per-W column
prof_h = err.max(axis=(0, 1, 3, 4))  # per-H row
n_sh = args.space
bw = SIZE // n_sh
print("W-profile (sharded axis), max per column, boundaries at",
      [bw * i for i in range(1, n_sh)])
for i in range(0, SIZE, 8):
    blk = prof_w[i : i + 8]
    print(f"  W[{i:3d}:{i+8:3d}] " + " ".join(f"{v:.1e}" for v in blk))
print("H-profile summary: max", prof_h.max(), "min", prof_h.min())

# BN stats divergence by module path
def walk(prefix, a, b, top):
    if isinstance(a, dict):
        for k in a:
            walk(prefix + "/" + k, a[k], b[k], top)
        return
    if isinstance(a, (tuple, list)):
        for i, (x, y) in enumerate(zip(a, b)):
            walk(prefix + f"[{i}]", x, y, top)
        return
    d = float(np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))
    if d > 0:
        top.append((d, prefix))


top = []
walk("", dense[1].get("batch_stats", {}), shard[1].get("batch_stats", {}), top)
walk("", dense[1].get("spectral", {}), shard[1].get("spectral", {}), top)
top.sort(reverse=True)
print("diverging mutated leaves (top 15):")
for d, p in top[:15]:
    print(f"  {d:.3e}  {p}")
