"""Shard-size-1 repro: conv/GRU backward with H-shard == 1 row (halo >= shard).

The full-generator backward diverges under H-sharding while every block is
exact at comfortable shard sizes (diag_spatial_bwd_ladder: H=16 over 4
devices).  The generator's coarse levels have H = out/32 = 4, so a 4-way
'space' sharding leaves ONE row per shard with a 3x3 conv halo of 1 on each
side — the regime where GSPMD's windowed-op halo exchange (and especially
its transpose in the backward) is most fragile.  This ladder repeats the
backward probes at H=4 (shard 1) vs H=16 (shard 4), dense vs H-sharded, f64.
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
from skillful_nowcasting_tpu.parallel import make_mesh

mesh = make_mesh(n_data=2, n_space=4)
repl = NamedSharding(mesh, P())
xh = NamedSharding(mesh, P("data", "space", None, None))
rng = np.random.default_rng(0)


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
    print(f"{tag:44s} err={err:.3e}  gmax={gmax:.3e}", flush=True)


for H in (4, 8, 16):
    B, W, C = 4, 4, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float64)
    gs = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float64)
    compare_param_grad(
        f"GBlock bwd H={H} (shard {H // 4})",
        GBlock(input_channels=C, output_channels=C),
        dict(train=False), x, xh,
    )
    compare_param_grad(
        f"UpsampleGBlock bwd H={H} (shard {H // 4})",
        UpsampleGBlock(input_channels=C, output_channels=C // 2),
        dict(train=False), x, xh,
    )
    compare_param_grad(
        f"ConvGRU bwd H={H} (shard {H // 4})",
        ConvGRU(input_channels=2 * C, output_channels=C, kernel_size=3),
        dict(n_steps=3, update_stats=False, x_static=True), x, xh, extra=gs,
    )
