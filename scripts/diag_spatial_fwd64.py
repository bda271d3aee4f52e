"""Staged f64 bisect of the H-sharded (spatial_axis) GSPMD train divergence.

The gated f64 whole-step test fails with g_params err/gmax ~1.2e-2 — the
same magnitude as the f32 run, i.e. PRECISION-INDEPENDENT, so a genuine
semantic difference somewhere (then chaotically decorrelated), not rounding.
The W-sharded op ladder is exact at f64, so this script walks the actual
test layout — batch H sharded over the 2x4 mesh (batch_sharding
spatial_axis) — stage by stage, forward AND backward, dense vs sharded at
f64.  First stage with err >> 1e-10 is the culprit.
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
from skillful_nowcasting_tpu.training import (
    desaturate_discriminator,
    init_train_state,
)
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
images, future = f64(images32), f64(future32)

mesh = make_mesh(n_data=2, n_space=4)
repl = replicated_sharding(mesh)
data = batch_sharding(mesh, spatial_axis="space")


def report(tag, dense, shard):
    ld, ls = jax.tree.leaves(dense), jax.tree.leaves(shard)
    err = gmax = 0.0
    for p, q in zip(ld, ls):
        p = np.asarray(p, np.float64)
        q = np.asarray(q, np.float64)
        err = max(err, float(np.max(np.abs(p - q))))
        gmax = max(gmax, float(np.max(np.abs(p))))
    print(f"{tag:34s} err={err:.3e}  gmax={gmax:.3e}  rel={err/max(gmax,1e-30):.3e}",
          flush=True)


def compare(tag, fn, *args, arg_shardings):
    dense = jax.jit(fn)(*args)
    shard = jax.jit(fn, in_shardings=arg_shardings, out_shardings=repl)(
        *(jax.device_put(a, s) for a, s in zip(args, arg_shardings))
    )
    report(tag, dense, shard)
    return dense


k_lat = jax.random.key(5)
k_fr = jax.random.key(6)

# 1. eval-mode generator forward, latent rng inside
def fwd_eval(v, x):
    return model.apply(v, x, train=False, rngs={"latent": k_lat})

compare("G fwd eval (rng latent)", fwd_eval, variables, images,
        arg_shardings=(repl, data))

# 2. train-mode generator forward + mutations
def fwd_train(v, x):
    return model.apply(
        v, x, train=True, rngs={"latent": k_lat}, mutable=["batch_stats", "spectral"]
    )

compare("G fwd train (+mut)", fwd_train, variables, images,
        arg_shardings=(repl, data))

# 3. discriminator train forward + mutations (real||real concat for shape)
seq = jnp.concatenate([images, future], axis=1)
dseq = jnp.concatenate([seq, seq], axis=0)

def disc_train(v, s):
    return model.apply(
        v, s, train=True, rngs={"frames": k_fr},
        mutable=["batch_stats", "spectral"], method=DGMR.discriminate,
    )

compare("D fwd train (+mut)", disc_train, variables, dseq,
        arg_shardings=(repl, data))

# 4. generator BACKWARD: grad of mean(preds^2) wrt params, train mode
def g_back(v, x):
    def loss(p):
        preds, _ = model.apply(
            {**v, "params": p}, x, train=True, rngs={"latent": k_lat},
            mutable=["batch_stats", "spectral"],
        )
        return jnp.mean(jnp.square(preds))
    return jax.grad(loss)(v["params"])

compare("G bwd train (dmean(preds^2)/dp)", g_back, variables, images,
        arg_shardings=(repl, data))

# 5. discriminator BACKWARD: grad of sum(scores) wrt D params
def d_back(v, s):
    def loss(p):
        scores, _ = model.apply(
            {**v, "params": p}, s, train=True, rngs={"frames": k_fr},
            mutable=["batch_stats", "spectral"], method=DGMR.discriminate,
        )
        return jnp.sum(scores)
    return jax.grad(loss)(v["params"])

compare("D bwd train (dsum(scores)/dp)", d_back, variables, dseq,
        arg_shardings=(repl, data))
