"""Per-stage timing of the DGMR forward on the current backend.

Localizes the HBM-bandwidth gap (docs/DESIGN.md "Performance analysis"):
times each pipeline stage separately at the bench config (B=16, 18 steps,
256^2) in f32 and bf16 so dtype/traffic regressions are attributable.

Stages:
* context  — ContextConditioningStack
* latent   — LatentConditioningStack (8x8, batch 1)
* gru{i}   — ConvGRU recurrence of sampler level i
* post{i}  — conv1x1 + GBlock + UpsampleGBlock of level i
* head     — BN + ReLU + 1x1 + depth_to_space
* full     — whole DGMR forward (sanity vs bench.py)

Timing protocol (CLAUDE.md): chain ITERS invocations inside one jit via
lax.scan and fetch a scalar — ``block_until_ready`` does not synchronize
through the axon tunnel.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from skillful_nowcasting_tpu import DGMR  # noqa: E402
from skillful_nowcasting_tpu.hub.pretrained import abstract_variables  # noqa: E402
from skillful_nowcasting_tpu.layers.convgru import ConvGRU  # noqa: E402
from skillful_nowcasting_tpu.models.common import (  # noqa: E402
    ContextConditioningStack,
    GBlock,
    LatentConditioningStack,
    UpsampleGBlock,
)
from skillful_nowcasting_tpu.ops import Conv, TorchBatchNorm, depth_to_space  # noqa: E402
from skillful_nowcasting_tpu.utils import random_fill_variables  # noqa: E402

B = int(os.environ.get("PROF_BATCH", "16"))
T = 18
ITERS = int(os.environ.get("PROF_ITERS", "8"))
LC, CC = 768, 384


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(name, module, *args, method=None, static_kwargs=None):
    """Time ``module.apply`` chained ITERS times; returns seconds/call."""
    static_kwargs = static_kwargs or {}
    variables = random_fill_variables(abstract_variables_for(module, args, static_kwargs), jax.random.key(0))

    @jax.jit
    def chain(variables, args):
        def body(carry, _):
            # Thread the previous probe into an input so iterations form a
            # true dependency chain — otherwise XLA's loop-invariant code
            # motion could hoist the (identical) body out of the scan.
            def pert(a):
                if isinstance(a, jnp.ndarray) and jnp.issubdtype(a.dtype, jnp.floating):
                    return a + (carry * 1e-30).astype(a.dtype)
                return a

            perturbed = jax.tree.map(pert, args)
            perturbed_kwargs = jax.tree.map(pert, static_kwargs)
            out = module.apply(variables, *perturbed, **perturbed_kwargs)
            leaves = jax.tree.leaves(out)
            probe = sum(jnp.max(l).astype(jnp.float32) for l in leaves)
            return probe, probe

        _, probes = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=ITERS)
        return probes

    t0 = time.time()
    np.asarray(chain(variables, args))
    compile_t = time.time() - t0
    t0 = time.time()
    np.asarray(chain(variables, args))
    dt = (time.time() - t0) / ITERS
    log(f"{name:10s}: {dt*1000:8.2f} ms/call  (compile {compile_t:.0f}s)")
    return dt


def abstract_variables_for(module, args, static_kwargs):
    return jax.eval_shape(
        lambda: module.init(
            {"params": jax.random.key(0), "latent": jax.random.key(1)},
            *args,
            **static_kwargs,
        )
    )


def rand(shape, dtype):
    return jnp.asarray(np.random.default_rng(0).random(shape, np.float32)).astype(dtype)


def main():
    log(f"devices: {jax.devices()}  B={B} T={T} iters={ITERS}")
    results = {}
    only = os.environ.get("PROF_ONLY", "").split(",") if os.environ.get("PROF_ONLY") else None
    for dtype_name in ("float32", "bfloat16"):
        if os.environ.get("PROF_DTYPE") and dtype_name != os.environ["PROF_DTYPE"]:
            continue
        dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
        log(f"--- {dtype_name} ---")
        total = 0.0

        def want(name):
            return only is None or any(name.startswith(o) for o in only)

        if want("context"):
            ctz = ContextConditioningStack(input_channels=1, output_channels=CC)
            dt = timeit("context", ctz, rand((B, 4, 256, 256, 1), dtype))
            results[(dtype_name, "context")] = dt
            total += dt
        if want("latent"):
            lat = LatentConditioningStack(shape=(8, 8, 8), output_channels=LC)
            dt = timeit("latent", lat, None, static_kwargs={"z": rand((1, 8, 8, 8), dtype)})
            results[(dtype_name, "latent")] = dt
            total += dt

        # Sampler levels.
        sizes = [8, 16, 32, 64]
        for i in range(4):
            div = 2**i
            s = sizes[i]
            if want(f"gru{i}"):
                gru = ConvGRU(
                    input_channels=LC // div + CC // div, output_channels=CC // div
                )
                if i == 0:
                    x = rand((B, s, s, LC), dtype)
                    kw = dict(n_steps=T, x_static=True)
                else:
                    x = rand((T, B, s, s, LC // div), dtype)
                    kw = {}
                h0 = rand((B, s, s, CC // div), dtype)
                dt = timeit(f"gru{i}", gru, x, h0, static_kwargs=kw)
                results[(dtype_name, f"gru{i}")] = dt
                total += dt
            if want(f"post{i}"):
                import flax.linen as nn

                class PostLevel(nn.Module):
                    div: int

                    @nn.compact
                    def __call__(self, x):
                        d = self.div
                        x = Conv(LC // d, kernel_size=1, spectral_norm=True, name="c")(
                            x, sequential=True
                        )
                        x = GBlock(LC // d, LC // d, name="g")(x, sequential=True)
                        x = UpsampleGBlock(LC // d, LC // (2 * d), name="u")(
                            x, sequential=True
                        )
                        return x

                post = PostLevel(div=div)
                dt = timeit(f"post{i}", post, rand((T, B, s, s, CC // div), dtype))
                results[(dtype_name, f"post{i}")] = dt
                total += dt

        if want("head"):
            import flax.linen as nn

            class Head(nn.Module):
                @nn.compact
                def __call__(self, x):
                    x = TorchBatchNorm(name="bn")(x, sequential=True)
                    x = jax.nn.relu(x)
                    x = Conv(4, kernel_size=1, spectral_norm=True, name="c")(
                        x, sequential=True
                    )
                    return depth_to_space(x, 2)

            dt = timeit("head", Head(), rand((T, B, 128, 128, 48), dtype))
            results[(dtype_name, "head")] = dt
            total += dt

        if want("full"):
            model = DGMR()
            variables = random_fill_variables(abstract_variables(model), jax.random.key(0))

            @jax.jit
            def chain(variables, x, key):
                def body(_, k):
                    out = model.apply(variables, x, train=False, rngs={"latent": k})
                    return None, jnp.mean(out.astype(jnp.float32))

                _, probes = jax.lax.scan(body, None, jax.random.split(key, ITERS))
                return probes

            x = rand((B, 4, 256, 256, 1), dtype)
            t0 = time.time()
            np.asarray(chain(variables, x, jax.random.key(1)))
            log(f"full compile+first: {time.time()-t0:.0f}s")
            t0 = time.time()
            np.asarray(chain(variables, x, jax.random.key(2)))
            dt = (time.time() - t0) / ITERS
            results[(dtype_name, "full")] = dt
            log(f"{'full':10s}: {dt*1000:8.2f} ms/call")

        log(f"sum of stages ({dtype_name}): {total*1000:.1f} ms")

    print({f"{d}/{k}": round(v * 1000, 2) for (d, k), v in results.items()})


if __name__ == "__main__":
    main()
