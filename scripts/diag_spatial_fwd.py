"""Forward-only probe for the spatial-train divergence (see
diag_spatial_train_noise.py): does the TRAIN-mode generator forward
(batch-stat BN + SN power iteration + in-forward latent draw) already
diverge under H-sharding, or only the backward?

Runs the train=True generator apply (a) plain-jit single device,
(b) pjit 2D data x space sharded, and compares preds / batch_stats /
spectral.  Also runs with a FIXED host-side latent (z passed in) to
isolate the in-forward ``jax.random.normal`` draw from everything else.
"""

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

model = DGMR(
    forecast_steps=2,
    input_channels=1,
    output_shape=64,
    latent_channels=256,
    context_channels=32,
    generation_steps=1,
    num_samples=1,
    num_spatial_layers=2,
    num_temporal_layers=2,
)

rng = np.random.default_rng(0)
images = jnp.asarray(rng.random((8, 4, 64, 64, 1), np.float32))
future = jnp.asarray(rng.random((8, 2, 64, 64, 1), np.float32))
state = init_train_state(model, jax.random.key(0), images[:1], future[:1])
state = state.replace(params=desaturate_discriminator(state.params))
variables = {
    "params": state.params,
    "batch_stats": state.batch_stats,
    "spectral": state.spectral,
}
key = jax.random.key(7)


def fwd(variables, x, key):
    preds, mut = model.apply(
        variables, x, train=True, rngs={"latent": key},
        mutable=["batch_stats", "spectral"],
    )
    return preds, mut["batch_stats"], mut["spectral"]


def report(tag, a, b):
    for name, (xa, xb) in zip(("preds", "batch_stats", "spectral"), zip(a, b)):
        la, lb = jax.tree.leaves(xa), jax.tree.leaves(xb)
        gmax = max(float(np.max(np.abs(np.asarray(y, np.float64)))) for y in lb)
        err = max(
            float(np.max(np.abs(np.asarray(p, np.float64) - np.asarray(q, np.float64))))
            for p, q in zip(la, lb)
        )
        print(f"{tag:16s} {name:12s} max_err={err:.3e} gmax={gmax:.3e} "
              f"err/gmax={err / gmax:.3e}", flush=True)


single = jax.jit(fwd)(variables, images, key)

mesh = make_mesh(n_data=2, n_space=4)
repl = replicated_sharding(mesh)
data = batch_sharding(mesh, spatial_axis="space")
sharded_fwd = jax.jit(fwd, in_shardings=(repl, data, repl), out_shardings=repl)
xs = shard_batch(images, mesh, spatial_axis="space")
report("fwd-2d-sp4", jax.jit(lambda *a: a)(*sharded_fwd(variables, xs, key)), single)

# Same, 1D data-only sharding (control: matched at 1.9e-7 in the train diag).
mesh1 = make_mesh(n_data=8)
repl1 = replicated_sharding(mesh1)
data1 = batch_sharding(mesh1)
fwd_1d = jax.jit(fwd, in_shardings=(repl1, data1, repl1), out_shardings=repl1)
report("fwd-1d", fwd_1d(variables, shard_batch(images, mesh1), key), single)

# Fixed-z variant: bypass the in-forward latent draw.
h = w = 64 // 32
z_fixed = jnp.asarray(np.random.default_rng(9).standard_normal((1, h, w, 8)), jnp.float32)


def fwd_z(variables, x, z):
    preds, mut = model.apply(
        variables, x, train=True, z=z, mutable=["batch_stats", "spectral"],
    )
    return preds, mut["batch_stats"], mut["spectral"]


single_z = jax.jit(fwd_z)(variables, images, z_fixed)
sharded_fwd_z = jax.jit(fwd_z, in_shardings=(repl, data, repl), out_shardings=repl)
report("fwdZ-2d-sp4", sharded_fwd_z(variables, xs, z_fixed), single_z)
