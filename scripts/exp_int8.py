"""Does XLA:TPU hit the int8 MXU rate for DGMR's conv/matmul shapes?

Motivation: the bf16 forward is MXU-bound at the post/D blocks
(docs/DESIGN.md roofline, ~150 TF/s of the 197 TF/s v5e bf16 peak) and the
v5e MXU has a 2x int8 peak (~394 TOPS).  If `lax.conv_general_dilated` /
`lax.dot_general` with int8 operands + `preferred_element_type=int32`
lower to the native int8 systolic path, a W8A8 post-training-quantized
inference mode could raise the serving headline well past bf16.

This script measures, on the real chip:
  1. a large square int8 vs bf16 `dot_general` (MXU rate sanity — the
     number AQT-style quantization would get on pure matmuls);
  2. int8 vs bf16 `conv_general_dilated` at the model's dominant post-block
     and GRU-level shapes (NHWC, 3x3).

Timing per CLAUDE.md: N iterations chained in one jit (fresh data each
iteration via an input perturbation so nothing folds), one scalar fetch.
"""

from __future__ import annotations

import os
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def time_chain(fn, args, iters, reps=3):
    """Best-of-reps seconds per iteration for `fn` chained `iters` times in one jit."""

    @jax.jit
    def chain(*args):
        def body(carry, _):
            out = fn(*carry)
            # Feed a cheap data-dependent perturbation of the output back into
            # operand 0 so the loop carries a true data dependence (no DCE, no
            # hoisting, no cross-iteration CSE).  Numerically near-neutral:
            # ints flip the low bit; floats add 1e-20 (normal in bf16 — f32
            # exponent range — so no denormal slow path, CLAUDE.md).
            # Full reduction: consuming only out[0] lets XLA's algebraic
            # simplifier sink the slice INTO the dot/conv and skip nearly all
            # the work (first run measured 696 "TF/s" on a 197 TF/s chip).
            a = carry[0]
            s = out.sum().ravel()[0]
            if jnp.issubdtype(a.dtype, jnp.integer):
                a = a ^ (s & 1).astype(a.dtype)
            else:
                a = a + (s.astype(jnp.float32) * 0 + 1e-20).astype(a.dtype)
            return (a, *carry[1:]), s.astype(jnp.float32)

        (_, last) = lax.scan(body, args, None, length=iters)
        return last[-1]

    t0 = time.time()
    np.asarray(chain(*args))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        np.asarray(chain(*args))
        best = min(best, time.time() - t0)
    return best / iters, compile_s


def bench_matmul(n=8192, iters=30):
    print(f"== dot_general {n}x{n} @ {n}x{n} ==")
    flops = 2 * n**3
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (n, n), np.int8))
    b8 = jnp.asarray(rng.integers(-127, 127, (n, n), np.int8))
    abf = jnp.asarray(rng.standard_normal((n, n), np.float32), jnp.bfloat16)
    bbf = jnp.asarray(rng.standard_normal((n, n), np.float32), jnp.bfloat16)

    def mm_i8(a, b):
        return lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    def mm_bf(a, b):
        return lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    s_bf, c_bf = time_chain(mm_bf, (abf, bbf), iters)
    print(f"bf16: {s_bf*1e3:.2f} ms/iter = {flops/s_bf/1e12:.1f} TF/s (compile {c_bf:.1f}s)")
    s_i8, c_i8 = time_chain(mm_i8, (a8, b8), iters)
    print(f"int8: {s_i8*1e3:.2f} ms/iter = {flops/s_i8/1e12:.1f} TOP/s (compile {c_i8:.1f}s)  speedup {s_bf/s_i8:.2f}x")


def bench_conv(B, H, W, Cin, Cout, k=3, iters=30, label=""):
    print(f"== conv {label}: ({B},{H},{W},{Cin}) * {k}x{k} -> {Cout} ==")
    flops = 2 * B * H * W * Cin * Cout * k * k  # SAME padding
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 127, (B, H, W, Cin), np.int8))
    w8 = jnp.asarray(rng.integers(-127, 127, (k, k, Cin, Cout), np.int8))
    xbf = jnp.asarray(rng.standard_normal((B, H, W, Cin), np.float32), jnp.bfloat16)
    wbf = jnp.asarray(rng.standard_normal((k, k, Cin, Cout), np.float32), jnp.bfloat16)
    dn = lax.conv_dimension_numbers(x8.shape, w8.shape, ("NHWC", "HWIO", "NHWC"))

    def conv_i8(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn, preferred_element_type=jnp.int32
        )

    def conv_bf(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn, preferred_element_type=jnp.float32
        )

    s_bf, c_bf = time_chain(conv_bf, (xbf, wbf), iters)
    print(f"bf16: {s_bf*1e3:.3f} ms/iter = {flops/s_bf/1e12:.1f} TF/s (compile {c_bf:.1f}s)")
    try:
        s_i8, c_i8 = time_chain(conv_i8, (x8, w8), iters)
        print(f"int8: {s_i8*1e3:.3f} ms/iter = {flops/s_i8/1e12:.1f} TOP/s (compile {c_i8:.1f}s)  speedup {s_bf/s_i8:.2f}x")
    except Exception as e:  # noqa: BLE001 — we're probing backend support
        print(f"int8: FAILED to lower/run: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench_matmul()
    # Dominant inference shapes (docs/DESIGN.md roofline, B=16 paper config):
    # post-block convs at the 3 coarse levels + the widest GRU-level conv.
    bench_conv(16 * 18, 16, 16, 384, 384, label="post-L1-ish (folded T)")
    bench_conv(16 * 18, 32, 32, 192, 192, label="post-L2-ish")
    bench_conv(16 * 18, 64, 64, 96, 96, label="post-L3-ish")
    bench_conv(16 * 18, 128, 128, 48, 48, label="gru4-level (lane-padded)")
