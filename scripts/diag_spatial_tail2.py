"""Narrow the up+head H-sharded backward divergence (see diag_spatial_tail).

Known: [UpsampleGBlock -> head] (5D sequential, eval, f64) grad diverges
order-one under (B='data', H='space') sharding; head alone exact;
UpsampleGBlock alone on 4D non-sequential input exact.  This separates the
variables: 5D-sequential layout (the convs fold (T,B)->TB with a reshape on
the sharded batch axis), spectral norm, depth_to_space, and the BN.
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

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from flax import traverse_util
from jax.sharding import NamedSharding, PartitionSpec as P

from skillful_nowcasting_tpu.models.common import UpsampleGBlock
from skillful_nowcasting_tpu.ops import Conv, TorchBatchNorm, depth_to_space
from skillful_nowcasting_tpu.parallel import make_mesh

mesh = make_mesh(n_data=2, n_space=4)
repl = NamedSharding(mesh, P())
seq_sh = NamedSharding(mesh, P(None, "data", "space", None, None))
b4_sh = NamedSharding(mesh, P("data", "space", None, None))

rng = np.random.default_rng(0)
T, B, H, W, LC = 2, 4, 16, 16, 32


def probe(tag, mod, x, spec):
    v = mod.init({"params": jax.random.key(0)}, x)
    v = jax.tree.map(
        lambda a: a.astype(jnp.float64) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        v,
    )

    def g(v, x):
        def loss(p):
            out = mod.apply({**v, "params": p}, x)
            return jnp.mean(jnp.square(out))

        return jax.grad(loss)(v["params"])

    dense = jax.jit(g)(v, x)
    shard = jax.jit(g, in_shardings=(repl, spec), out_shardings=repl)(
        v, jax.device_put(x, spec)
    )
    worst = (0.0, 0.0, "")
    fd, fs = traverse_util.flatten_dict(dense), traverse_util.flatten_dict(shard)
    for k in fd:
        p, q = np.asarray(fd[k], np.float64), np.asarray(fs[k], np.float64)
        err = float(np.max(np.abs(p - q)))
        if err > worst[0]:
            worst = (err, float(np.max(np.abs(p))), "/".join(k))
    print(f"{tag:40s} err={worst[0]:.3e}  leafmax={worst[1]:.3e}  {worst[2]}", flush=True)


class UpOnly5D(nn.Module):
    @nn.compact
    def __call__(self, x):
        return UpsampleGBlock(LC, LC // 2, name="up")(x, train=False, sequential=True)


class UpHead4D(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = UpsampleGBlock(LC, LC // 2, name="up")(x, train=False)
        x = TorchBatchNorm(name="bn")(x, train=False)
        x = jax.nn.relu(x)
        x = Conv(4, kernel_size=1, spectral_norm=True, name="c")(x, update_stats=False)
        return depth_to_space(x, 2)


class UpHeadNoSN(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = UpsampleGBlock(LC, LC // 2, name="up", spectral_norm=False)(
            x, train=False, sequential=True
        )
        x = TorchBatchNorm(name="bn")(x, train=False, sequential=True)
        x = jax.nn.relu(x)
        x = Conv(4, kernel_size=1, spectral_norm=False, name="c")(
            x, update_stats=False, sequential=True
        )
        return depth_to_space(x, 2)


class UpHeadNoD2S(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = UpsampleGBlock(LC, LC // 2, name="up")(x, train=False, sequential=True)
        x = TorchBatchNorm(name="bn")(x, train=False, sequential=True)
        x = jax.nn.relu(x)
        return Conv(4, kernel_size=1, spectral_norm=True, name="c")(
            x, update_stats=False, sequential=True
        )


class UpConvOnly(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = UpsampleGBlock(LC, LC // 2, name="up")(x, train=False, sequential=True)
        return Conv(4, kernel_size=1, spectral_norm=False, name="c")(
            x, update_stats=False, sequential=True
        )


x5 = jnp.asarray(rng.standard_normal((T, B, H, W, LC)), jnp.float64)
x4 = jnp.asarray(rng.standard_normal((B, H, W, LC)), jnp.float64)

probe("up only, 5D seq", UpOnly5D(), x5, seq_sh)
probe("up+head, 4D", UpHead4D(), x4, b4_sh)
probe("up+head, 5D, no SN anywhere", UpHeadNoSN(), x5, seq_sh)
probe("up+head, 5D, no depth_to_space", UpHeadNoD2S(), x5, seq_sh)
probe("up+conv only, 5D", UpConvOnly(), x5, seq_sh)
