"""Minimal composed repro for the H-sharded generator-BACKWARD divergence.

diag_spatial_gbwd (f64, tiny config): FORWARD exact under the 2D data x
space sharding; param-grad diverges order-one, and in eval mode the error
is concentrated at the finest level (up_g4/g4/convGRU4) — the first blocks
to receive cotangents after the output head.  Every block's backward in
ISOLATION is exact (diag_spatial_bwd_ladder, diag_spatial_shard1 down to
1-row shards), so the bug lives in a COMPOSITION.  This script grows the
sampler's tail one block at a time (eval semantics, f64, dense vs sharded
input, grad wrt params) until the divergence appears.

Layout matches the Sampler: sequences are (T, B, H, W, C); the sharded runs
shard B over 'data' and H over 'space'.
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
from jax.sharding import NamedSharding, PartitionSpec as P

from skillful_nowcasting_tpu.layers.convgru import ConvGRU
from skillful_nowcasting_tpu.models.common import GBlock, UpsampleGBlock
from skillful_nowcasting_tpu.ops import Conv, TorchBatchNorm, depth_to_space
from skillful_nowcasting_tpu.parallel import make_mesh

mesh = make_mesh(n_data=2, n_space=4)
repl = NamedSharding(mesh, P())
seq_sh = NamedSharding(mesh, P(None, "data", "space", None, None))  # (T,B,H,W,C)
st_sh = NamedSharding(mesh, P("data", "space", None, None))  # (B,H,W,C)

rng = np.random.default_rng(0)
T, B, H, W = 2, 4, 16, 16
LC, CC = 32, 4  # level-3 channels at the tiny config (lc/8, cc/8)


def head_tail(x, train=False):
    x = TorchBatchNorm(name="bn")(x, train=train, sequential=True)
    x = jax.nn.relu(x)
    x = Conv(4, kernel_size=1, spectral_norm=True, name="conv_1x1")(
        x, update_stats=train, sequential=True
    )
    return depth_to_space(x, 2)


class Stage(nn.Module):
    """Tail composition: [gru] -> [conv1x1] -> [g] -> [up] -> [head]."""

    with_gru: bool = False
    with_conv: bool = False
    with_g: bool = False
    with_up: bool = False
    with_head: bool = True

    @nn.compact
    def __call__(self, x, init_state=None, train=False):
        if self.with_gru:
            x = ConvGRU(
                input_channels=LC + CC,
                output_channels=CC,
                kernel_size=3,
                name="gru",
            )(x, init_state, update_stats=train)
        if self.with_conv:
            x = Conv(LC, kernel_size=1, spectral_norm=True, name="c1")(
                x, update_stats=train, sequential=True
            )
        if self.with_g:
            x = GBlock(LC, LC, name="g")(x, train=train, sequential=True)
        if self.with_up:
            x = UpsampleGBlock(LC, LC // 2, name="up")(x, train=train, sequential=True)
        if self.with_head:
            x = head_tail(x, train=train)
        return x


def probe(tag, mod, x, init_state=None):
    args = (x,) if init_state is None else (x, init_state)
    v = mod.init({"params": jax.random.key(0)}, *args)
    v = jax.tree.map(
        lambda a: a.astype(jnp.float64) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        v,
    )

    def g(v, x, *rest):
        def loss(p):
            out = mod.apply({**v, "params": p}, x, *rest)
            return jnp.mean(jnp.square(out))

        return jax.grad(loss)(v["params"])

    specs = (repl, seq_sh) if init_state is None else (repl, seq_sh, st_sh)
    args = (v,) + args
    dense = jax.jit(g)(*args)
    shard = jax.jit(g, in_shardings=specs, out_shardings=repl)(
        *(jax.device_put(a, s) for a, s in zip(args, specs))
    )
    from flax import traverse_util

    worst = (0.0, 0.0, "")
    flat_d = traverse_util.flatten_dict(dense)
    flat_s = traverse_util.flatten_dict(shard)
    for k in flat_d:
        p, q = np.asarray(flat_d[k], np.float64), np.asarray(flat_s[k], np.float64)
        err = float(np.max(np.abs(p - q)))
        if err > worst[0]:
            worst = (err, float(np.max(np.abs(p))), "/".join(k))
    print(f"{tag:34s} err={worst[0]:.3e}  leafmax={worst[1]:.3e}  {worst[2]}", flush=True)


x_up = jnp.asarray(rng.standard_normal((T, B, H, W, LC // 2)), jnp.float64)
probe("head only", Stage(), x_up)

x_lc = jnp.asarray(rng.standard_normal((T, B, H, W, LC)), jnp.float64)
probe("up+head", Stage(with_up=True), x_lc)
probe("g+up+head", Stage(with_g=True, with_up=True), x_lc)
probe(
    "conv+g+up+head",
    Stage(with_conv=True, with_g=True, with_up=True),
    x_lc,
)

x_gru = jnp.asarray(rng.standard_normal((T, B, H, W, LC)), jnp.float64)
st = jnp.asarray(rng.standard_normal((B, H, W, CC)), jnp.float64)
probe(
    "gru+conv+g+up+head",
    Stage(with_gru=True, with_conv=True, with_g=True, with_up=True),
    x_gru,
    st,
)
