"""Minimal op-level repro ladder for the sharded-state train divergence.

diag_spatial_localize.py shows the first divergence inside GBlock between
bn1 (exact) and bn2 (diverges at f64) — i.e. in the spectral-norm
``sequential=True`` conv, or in how GSPMD partitions it.  This ladder runs
each train-mode building block standalone on tiny shapes, dense vs
W-sharded input, at f64, and reports max |diff| of outputs and mutated
collections.  Anything >> 1e-12 relative is a real partitioning bug, not
reduction noise.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from skillful_nowcasting_tpu.layers.convgru import ConvGRU
from skillful_nowcasting_tpu.models.common import GBlock, UpsampleGBlock
from skillful_nowcasting_tpu.ops import Conv, TorchBatchNorm
from skillful_nowcasting_tpu.parallel import make_mesh

mesh = make_mesh(n_data=2, n_space=4)
repl = NamedSharding(mesh, P())

rng = np.random.default_rng(0)
S, B, H, W, C = 2, 4, 8, 8, 8
x = jnp.asarray(rng.standard_normal((S, B, H, W, C)), jnp.float64)
# sharded: B over data, W over space (matches the bisect's state spec)
xs_spec = NamedSharding(mesh, P(None, "data", None, "space", None))


def compare(tag, mod, call, x, sharded_spec, mutable):
    v = mod.init(
        {"params": jax.random.key(0), "frames": jax.random.key(1)},
        x,
        **call,
    )
    v = jax.tree.map(
        lambda a: a.astype(jnp.float64)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        v,
    )

    def f(v, x):
        return mod.apply(v, x, **call, mutable=mutable)

    dense = jax.jit(f)(v, x)
    shard = jax.jit(f, in_shardings=(repl, sharded_spec), out_shardings=repl)(
        v, jax.device_put(x, sharded_spec)
    )
    for name, a, b in (("out", dense[0], shard[0]), ("mut", dense[1], shard[1])):
        la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
        err = max(
            (
                float(np.max(np.abs(np.asarray(p, np.float64) - np.asarray(q, np.float64))))
                for p, q in zip(la, lb)
            ),
            default=0.0,
        )
        gmax = max(
            (float(np.max(np.abs(np.asarray(q, np.float64)))) for q in lb), default=1.0
        )
        print(f"{tag:34s} {name:4s} max_err={err:.3e} (gmax={gmax:.3e})", flush=True)


# 1. BN sequential, train mode
compare(
    "TorchBatchNorm(seq,train)",
    TorchBatchNorm(),
    dict(train=True, sequential=True),
    x,
    xs_spec,
    ["batch_stats"],
)

# 2. SN conv sequential, train mode
compare(
    "Conv(SN,seq,update)",
    Conv(features=C, kernel_size=3, padding=1, spectral_norm=True, sn_eps=1e-4),
    dict(update_stats=True, sequential=True),
    x,
    xs_spec,
    ["spectral"],
)

# 3. GBlock train sequential
compare(
    "GBlock(train,seq)",
    GBlock(input_channels=C, output_channels=C),
    dict(train=True, sequential=True),
    x,
    xs_spec,
    ["batch_stats", "spectral"],
)

# 4. UpsampleGBlock train sequential
compare(
    "UpsampleGBlock(train,seq)",
    UpsampleGBlock(input_channels=C, output_channels=C // 2),
    dict(train=True, sequential=True),
    x,
    xs_spec,
    ["batch_stats", "spectral"],
)

# 5. ConvGRU with sharded initial state (x: (B,H,W,Cx) static input repeated)
gx = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float64)
gs = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float64)
gru = ConvGRU(input_channels=2 * C, output_channels=C, kernel_size=3)
gv = gru.init(jax.random.key(0), gx, gs, n_steps=3, update_stats=True, x_static=True)
gv = jax.tree.map(
    lambda a: a.astype(jnp.float64) if jnp.issubdtype(a.dtype, jnp.floating) else a,
    gv,
)
st_spec = NamedSharding(mesh, P("data", None, "space", None))


def g(v, xx, ss):
    return gru.apply(
        v, xx, ss, n_steps=3, update_stats=True, x_static=True, mutable=["spectral"]
    )


dense = jax.jit(g)(gv, gx, gs)
shard = jax.jit(g, in_shardings=(repl, repl, st_spec), out_shardings=repl)(
    gv, gx, jax.device_put(gs, st_spec)
)
for name, a, b in (("out", dense[0], shard[0]), ("mut", dense[1], shard[1])):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    err = max(
        (
            float(np.max(np.abs(np.asarray(p, np.float64) - np.asarray(q, np.float64))))
            for p, q in zip(la, lb)
        ),
        default=0.0,
    )
    print(f"{'ConvGRU(sharded state)':34s} {name:4s} max_err={err:.3e}", flush=True)
