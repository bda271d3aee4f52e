"""Materialize variable trees from abstract structures without running init.

``model.init`` traces and compiles the full forward — minutes for DGMR-sized
programs.  Benchmarks and smoke drivers only need *plausible* finite values,
which this module produces directly from the ``jax.eval_shape`` structure:

* conv/dense kernels ~ N(0, 0.02), biases 0;
* BatchNorm scale 1 / bias 0, running mean 0 / var 1;
* attention ``gamma`` 0 (reference init, ``Attention.py:69``);
* spectral-norm ``uv``: genuine power-iteration vectors for the filled
  kernel.  This matters: random u/v give a near-zero ``sigma = u.(W v)``,
  ``kernel/sigma`` explodes, and the resulting Inf/NaN activations slow TPU
  execution by >100x (measured: 7.9 s vs 34 ms per Sampler forward).

Values are generated host-side with numpy (one array per leaf, one transfer
on first use) — doing this with per-leaf device ops costs hundreds of tiny
dispatches, which is pathological over remote-device transports.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np


def _np_weight_mat(kernel: np.ndarray) -> np.ndarray:
    """numpy mirror of ``ops.spectral_norm.kernel_to_weight_mat``."""
    if kernel.ndim == 2:
        return kernel.T
    perm = (kernel.ndim - 1, kernel.ndim - 2) + tuple(range(kernel.ndim - 2))
    return np.transpose(kernel, perm).reshape(kernel.shape[-1], -1)


def _np_power_uv(wm: np.ndarray, gen, iters: int = 15):
    u = gen.standard_normal(wm.shape[0]).astype(wm.dtype)
    v = gen.standard_normal(wm.shape[1]).astype(wm.dtype)
    for _ in range(iters):
        u = wm @ v
        u /= max(np.linalg.norm(u), 1e-12)
        v = wm.T @ u
        v /= max(np.linalg.norm(v), 1e-12)
    return u, v


def random_fill_variables(
    abstract: Mapping[str, Any], rng: jax.Array | int = 0
) -> Any:
    """Fill an abstract variable tree (from ``jax.eval_shape``) with values."""
    seed = (
        int(np.asarray(jax.random.key_data(rng)).sum()) % (2**31 - 1)
        if hasattr(rng, "dtype")
        else int(rng)
    )
    gen = np.random.default_rng(seed)

    def fill(tree, path=()):
        if isinstance(tree, Mapping):
            return {k: fill(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, tuple):  # spectral uv — handled via params lookup
            return tree
        name = path[-1] if path else ""
        shape, dtype = tuple(tree.shape), np.dtype(tree.dtype)
        if name in ("bias", "mean") or "gamma" in name:
            return np.zeros(shape, dtype)
        if name in ("scale", "var"):
            return np.ones(shape, dtype)
        if name == "kernel":
            # He-scaled: keeps activations O(1) through deep stacks.  Tiny
            # kernels (e.g. 0.02-scale) underflow activations into denormals
            # after a few layers, which runs >100x slower on the VPU.
            fan_in = int(np.prod(shape[:-1]))
            return (gen.standard_normal(shape) * np.sqrt(2.0 / fan_in)).astype(dtype)
        v = gen.standard_normal(shape).astype(dtype)
        return v / (np.sqrt(np.sum(v * v)) + 1e-12)

    out = fill(abstract)

    # Second pass: derive every spectral (u, v) from its filled kernel so
    # sigma estimates are genuine top-singular-values (finite activations).
    params = out.get("params", {})

    def fix_spectral(spec_tree, param_tree):
        if not isinstance(spec_tree, Mapping):
            return spec_tree
        fixed = {}
        for k, v in spec_tree.items():
            if k == "uv" and isinstance(v, tuple):
                kernel = param_tree.get("kernel")
                if kernel is not None:
                    u, vv = _np_power_uv(_np_weight_mat(np.asarray(kernel)), gen)
                    fixed[k] = (u.astype(v[0].dtype), vv.astype(v[1].dtype))
                else:
                    fixed[k] = v
            elif isinstance(v, Mapping):
                fixed[k] = fix_spectral(v, param_tree.get(k, {}))
            else:
                fixed[k] = v
        return fixed

    if "spectral" in out:
        out["spectral"] = fix_spectral(out["spectral"], params)
    # Commit to device once: leaving numpy leaves means every jit call
    # re-transfers the whole tree (seconds per call on remote transports).
    return jax.device_put(out)
