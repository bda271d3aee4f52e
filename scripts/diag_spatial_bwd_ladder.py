"""Backward op-ladder, H-sharded, f64: find the op whose GRADIENT GSPMD breaks.

diag_spatial_gbwd.py shows the generator backward diverging order-one under
batch-H sharding with the error concentrated at the network's END (up_g4 /
g4 / output head) in eval mode — forward exact, D backward exact.  Prime
suspects: ops whose backward re-partitions the sharded H axis —
upsample_nearest_2x (backward = strided segment-sum), depth_to_space
(backward = space_to_depth repartition), and the rematted ConvGRU scan.
Each block below: dense vs H-sharded grad at f64 on tiny shapes.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from skillful_nowcasting_tpu.layers.convgru import ConvGRU
from skillful_nowcasting_tpu.models.common import GBlock, UpsampleGBlock
from skillful_nowcasting_tpu.ops import depth_to_space, space_to_depth, upsample_nearest_2x
from skillful_nowcasting_tpu.parallel import make_mesh

mesh = make_mesh(n_data=2, n_space=4)
repl = NamedSharding(mesh, P())

rng = np.random.default_rng(0)
B, H, W, C = 4, 16, 16, 8
x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float64)
xh = NamedSharding(mesh, P("data", "space", None, None))


def compare_grad(tag, fn, x, spec):
    g = lambda x: jax.grad(lambda y: jnp.mean(jnp.square(fn(y))))(x)
    dense = jax.jit(g)(x)
    shard = jax.jit(g, in_shardings=(spec,), out_shardings=repl)(
        jax.device_put(x, spec)
    )
    p, q = np.asarray(dense, np.float64), np.asarray(shard, np.float64)
    err = float(np.max(np.abs(p - q)))
    print(f"{tag:38s} err={err:.3e}  gmax={np.abs(p).max():.3e}", flush=True)


# pure ops
compare_grad("upsample_nearest_2x", upsample_nearest_2x, x, xh)
compare_grad("depth_to_space", depth_to_space, x, xh)
compare_grad("space_to_depth", space_to_depth, x, xh)


# parameterized blocks: grad wrt params
def compare_param_grad(tag, mod, call, x, spec, extra=None):
    init_args = (x,) if extra is None else (x, extra)
    v = mod.init({"params": jax.random.key(0)}, *init_args, **call)
    v = jax.tree.map(
        lambda a: a.astype(jnp.float64) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        v,
    )

    def g(v, x, *rest):
        def loss(p):
            out = mod.apply({**v, "params": p}, x, *rest, **call)
            if isinstance(out, tuple):
                out = out[0]
            return jnp.mean(jnp.square(out))

        return jax.grad(loss)(v["params"])

    args = (v, x) if extra is None else (v, x, extra)
    specs = (repl, spec) if extra is None else (repl, spec, spec)
    dense = jax.jit(g)(*args)
    shard = jax.jit(g, in_shardings=specs, out_shardings=repl)(
        *(jax.device_put(a, s) for a, s in zip(args, specs))
    )
    err = gmax = 0.0
    for p, q in zip(jax.tree.leaves(dense), jax.tree.leaves(shard)):
        p, q = np.asarray(p, np.float64), np.asarray(q, np.float64)
        err = max(err, float(np.max(np.abs(p - q))))
        gmax = max(gmax, float(np.max(np.abs(p))))
    print(f"{tag:38s} err={err:.3e}  gmax={gmax:.3e}", flush=True)


compare_param_grad(
    "GBlock bwd", GBlock(input_channels=C, output_channels=C),
    dict(train=False), x, xh,
)
compare_param_grad(
    "UpsampleGBlock bwd",
    UpsampleGBlock(input_channels=C, output_channels=C // 2),
    dict(train=False), x, xh,
)

gs = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float64)
compare_param_grad(
    "ConvGRU bwd (sharded x+state)",
    ConvGRU(input_channels=2 * C, output_channels=C, kernel_size=3),
    dict(n_steps=3, update_stats=False, x_static=True), x, xh, extra=gs,
)
