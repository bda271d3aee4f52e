"""Lane-fold experiment for the 48-channel GRU level (VERDICT r3 item 5).

The per-stage roofline (docs/DESIGN.md) puts gru3 (64 px, h=48ch) in the
"lane padding" regime: every VMEM tile wastes 62% of the 128 lanes, and the
level runs at single-digit TF/s.  Countermeasure attempted here: **fold
``f`` batch samples into the channel dimension** so the hot tensors carry
``f*48`` channels (f=2 -> 96/128 lanes used), with the convs becoming
``feature_group_count=f`` grouped convs whose kernel is the original kernel
tiled ``f`` times (exact: each sample still sees the same weights; gradients
would sum over the tile, which equals the batch sum).

Layouts (group-major, so no cross-group channel interleave is ever needed):
  h_f  (B/f, H, W, f*48)           = [h_s0 | h_s1 | ...]
  gh   (B/f, H, W, f*96)           = [r_s0 u_s0 | r_s1 u_s1 | ...]
  gx   (T, B/f, H, W, f*144)       = [r u c]_s0 | [r u c]_s1 | ...
Gate extraction is a reshape (..., f, n_gates, 48) + middle-axis slice —
indexing that XLA fuses into the consuming elementwise op.

The fold/unfold transposes happen ONCE per level (gx, h0, outputs), not per
scan step.

Run on the TPU:  python scripts/exp_lane_fold.py
Checks exactness vs the real ConvGRU eval path (f32), then times f32/bf16
baseline vs folded at the gru3 shapes (B=16, T=18, 64x64, x 96ch -> h 48ch).
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

from skillful_nowcasting_tpu.hub.pretrained import abstract_variables  # noqa: E402
from skillful_nowcasting_tpu.layers.convgru import ConvGRU, _conv2d  # noqa: E402
from skillful_nowcasting_tpu.ops import spectral_norm as sn  # noqa: E402
from skillful_nowcasting_tpu.utils import random_fill_variables  # noqa: E402

B = int(os.environ.get("FOLD_BATCH", "16"))
T = 18
S = 64
XC, OC = 96, 48  # gru3: x 96ch (post2 output), h 48ch
ITERS = int(os.environ.get("FOLD_ITERS", "8"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _normed_kernels(variables):
    """Replicate ConvGRU's eval-path kernel prep: SN-fold + input/hidden split."""
    cell = variables["params"]["cell"]
    spec = variables["spectral"]["cell"]
    ks = {}
    for gate in ("read_gate_conv", "update_gate_conv", "output_conv"):
        k = cell[gate]["kernel"]
        b = cell[gate]["bias"]
        u, v = spec[gate]["uv"]
        kn = k / sn.spectral_sigma(sn.kernel_to_weight_mat(k), u, v)
        ks[gate] = (kn, b)
    (kr, br), (ku, bu), (kc, bc) = ks.values()
    kr_x, kr_h = kr[:, :, :XC, :], kr[:, :, XC:, :]
    ku_x, ku_h = ku[:, :, :XC, :], ku[:, :, XC:, :]
    kc_x, kc_h = kc[:, :, :XC, :], kc[:, :, XC:, :]
    k_x_all = jnp.concatenate([kr_x, ku_x, kc_x], axis=-1)  # (3,3,96,144)
    k_h_ru = jnp.concatenate([kr_h, ku_h], axis=-1)  # (3,3,48,96)
    return k_x_all, k_h_ru, kc_h, br, bu, bc


def fold(x, f):
    """(…, B, H, W, C) -> (…, B/f, H, W, f*C), group-major (sample-major)."""
    lead = x.shape[:-4]
    b, h, w, c = x.shape[-4:]
    y = x.reshape(lead + (b // f, f, h, w, c))
    y = jnp.moveaxis(y, -4, -2)  # (…, B/f, H, W, f, C)
    return y.reshape(lead + (b // f, h, w, f * c))


def unfold(x, f):
    lead = x.shape[:-4]
    b, h, w, fc = x.shape[-4:]
    y = x.reshape(lead + (b, h, w, f, fc // f))
    y = jnp.moveaxis(y, -2, -4)
    return y.reshape(lead + (b * f, h, w, fc // f))


def _gconv(x, kernel, f):
    """Grouped 3x3/SAME conv with the kernel tiled f times (tied weights)."""
    ktile = jnp.concatenate([kernel] * f, axis=-1)  # (3,3,Cin,f*Cout)
    pad = (kernel.shape[0] - 1) // 2
    dn = jax.lax.conv_dimension_numbers(x.shape, ktile.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, ktile, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=dn, feature_group_count=f,
    )


def folded_rollout(x_seq, h0, kernels, f):
    """The gru3 eval recurrence with f samples folded into channels."""
    k_x_all, k_h_ru, kc_h, br, bu, bc = kernels
    dtype = x_seq.dtype
    k_x_all = k_x_all.astype(dtype)
    k_h_ru = k_h_ru.astype(dtype)
    kc_h = kc_h.astype(dtype)
    # Per-gate biases folded into gx once (group-major tile), so the scan
    # body adds no biases of its own.
    bias3 = jnp.tile(jnp.concatenate([br, bu, bc]).astype(dtype), f)

    # Input-part conv for all timesteps, FOLDED: grouped conv on (T*B/f, …).
    t = x_seq.shape[0]
    xf = fold(x_seq, f)  # (T, B/f, H, W, f*96)
    xf = xf.reshape((t * (B // f),) + xf.shape[2:])
    gx = _gconv(xf, k_x_all, f) + bias3  # (T*B/f, H, W, f*144), [r u c]/sample
    gx = gx.reshape((t, B // f) + gx.shape[1:])

    hf = fold(h0, f).astype(dtype)  # (B/f, H, W, f*48)

    def pick(g, n_gates, idx):
        """Slice gate ``idx`` from a group-major (…, f*n_gates*48) tensor
        back to (…, f*48); pure indexing, fused by XLA."""
        y = g.reshape(g.shape[:-1] + (f, n_gates, OC))
        return y[..., :, idx, :].reshape(g.shape[:-1] + (f * OC,))

    def step(h, gxt):
        gh = _gconv(h, k_h_ru, f)  # (…, f*96), [r u]/sample
        read = jax.nn.sigmoid(pick(gxt, 3, 0) + pick(gh, 2, 0))
        update = jax.nn.sigmoid(pick(gxt, 3, 1) + pick(gh, 2, 1))
        c = jax.nn.relu(pick(gxt, 3, 2) + _gconv(read * h, kc_h, f))
        out = update * h + (1.0 - update) * c
        return out, out

    _, outs = jax.lax.scan(step, hf, gx)
    return unfold(outs, f)


def main():
    log(f"devices: {jax.devices()}  B={B} T={T} gru3 64x64 x{XC}->h{OC}")
    gru = ConvGRU(input_channels=XC + OC, output_channels=OC)
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.standard_normal((T, B, S, S, XC), np.float32) * 0.3)
    h32 = jnp.asarray(rng.standard_normal((B, S, S, OC), np.float32) * 0.3)
    variables = random_fill_variables(
        jax.eval_shape(lambda: gru.init({"params": jax.random.key(0)}, x32, h32)),
        jax.random.key(1),
    )
    kernels = _normed_kernels(variables)

    # --- exactness (f32, one fold) ------------------------------------------
    base = jax.jit(lambda v, x, h: gru.apply(v, x, h))(variables, x32, h32)
    for f in (2, 4):
        fout = jax.jit(lambda x, h, f=f: folded_rollout(x, h, kernels, f))(x32, h32)
        err = float(jnp.max(jnp.abs(base - fout)))
        log(f"fold={f}: max |folded - ConvGRU| = {err:.3e}")
        # Same math, different conv grouping: differences are accumulation
        # order only (TPU f32 convs multiply in bf16 by default).
        assert err < 2e-3, "folded math diverges from the reference rollout"

    # --- timing --------------------------------------------------------------
    def chain(fn):
        @jax.jit
        def run(x, h):
            def body(carry, _):
                out = fn(x + carry * 1e-30, h)
                probe = jnp.max(out).astype(jnp.float32)
                return probe, probe

            _, probes = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=ITERS)
            return probes

        return run

    results = {}
    for dtype_name in ("float32", "bfloat16"):
        dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
        x, h = x32.astype(dtype), h32.astype(dtype)
        cands = {"base": chain(lambda x, h: gru.apply(variables, x, h))}
        for f in (2, 4):
            cands[f"fold{f}"] = chain(lambda x, h, f=f: folded_rollout(x, h, kernels, f))
        for name, run in cands.items():
            t0 = time.time()
            np.asarray(run(x, h))
            compile_t = time.time() - t0
            t0 = time.time()
            np.asarray(run(x, h))
            dt = (time.time() - t0) / ITERS
            results[(dtype_name, name)] = dt
            log(f"[{dtype_name}] {name:6s}: {dt*1000:7.2f} ms (compile {compile_t:.0f}s)")

    print({f"{d}/{n}": round(v * 1000, 2) for (d, n), v in results.items()})


if __name__ == "__main__":
    main()
