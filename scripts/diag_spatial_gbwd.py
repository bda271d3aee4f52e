"""Per-leaf localization of the H-sharded generator-BACKWARD divergence.

diag_spatial_fwd64.py: G forward exact, D fwd/bwd exact, G backward rel=1.0
under batch H-sharding at f64.  This walks the gradient tree to find which
parameter subtrees diverge, and repeats the backward with train=False
(no BN/SN mutation) and with n-step variants to narrow the mechanism.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
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

from skillful_nowcasting_tpu import DGMR
from skillful_nowcasting_tpu.parallel import make_mesh
from skillful_nowcasting_tpu.parallel.mesh import batch_sharding, replicated_sharding
from skillful_nowcasting_tpu.training import desaturate_discriminator, init_train_state
from __graft_entry__ import DRYRUN_CONFIG

model = DGMR(**DRYRUN_CONFIG)
rng = np.random.default_rng(0)
images32 = jnp.asarray(rng.random((8, 4, 128, 128, 1), np.float32))
future32 = jnp.asarray(rng.random((8, 2, 128, 128, 1), np.float32))
state = init_train_state(model, jax.random.key(0), images32[:1], future32[:1])
state = state.replace(params=desaturate_discriminator(state.params))

f64 = lambda t: jax.tree.map(
    lambda a: a.astype(jnp.float64) if jnp.issubdtype(a.dtype, jnp.floating) else a,
    t,
)
variables = f64(
    {"params": state.params, "batch_stats": state.batch_stats, "spectral": state.spectral}
)
images = f64(images32)

mesh = make_mesh(n_data=2, n_space=4)
repl = replicated_sharding(mesh)
data = batch_sharding(mesh, spatial_axis="space")
k_lat = jax.random.key(5)


def walk(prefix, a, b, out):
    if isinstance(a, dict):
        for k in a:
            walk(prefix + "/" + k, a[k], b[k], out)
        return
    p = np.asarray(a, np.float64)
    q = np.asarray(b, np.float64)
    err = float(np.max(np.abs(p - q)))
    mx = float(np.max(np.abs(p)))
    if err > 0:
        out.append((err, mx, prefix))


def run(tag, train):
    def g_back(v, x):
        def loss(p):
            if train:
                preds, _ = model.apply(
                    {**v, "params": p}, x, train=True, rngs={"latent": k_lat},
                    mutable=["batch_stats", "spectral"],
                )
            else:
                preds = model.apply(
                    {**v, "params": p}, x, train=False, rngs={"latent": k_lat}
                )
            return jnp.mean(jnp.square(preds))
        return jax.grad(loss)(v["params"])

    dense = jax.jit(g_back)(variables, images)
    shard = jax.jit(g_back, in_shardings=(repl, data), out_shardings=repl)(
        variables, jax.device_put(images, data)
    )
    out = []
    walk("", dense, shard, out)
    out.sort(reverse=True)
    print(f"== {tag}: top diverging leaves (err, leafmax, path)", flush=True)
    for err, mx, path in out[:12]:
        print(f"  {err:.3e}  {mx:.3e}  {path}", flush=True)
    if not out:
        print("  (exact)", flush=True)


run("train=True", True)
run("train=False", False)
