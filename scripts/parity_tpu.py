"""End-to-end TPU parity harness: reproduce the README parity numbers.

Builds a freshly-initialized reference torch DGMR (CPU), saves its weights,
imports them into this framework, and runs the identical 18-step forward with
a fixed latent draw on the current JAX backend (the real TPU under axon, or
CPU).  Prints the max per-frame absolute deviation twice:

* at default (fast) matmul precision;
* with ``set_parity_precision()`` (full-f32 matmuls).

Usage::

    python scripts/parity_tpu.py [--size 256] [--steps 18]

Reference contract: ``/root/reference/dgmr/dgmr.py:132-135`` (forward),
``README.md:73-91``; the north star is <= 1e-3 per frame.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--steps", type=int, default=18)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--latent-channels", type=int, default=768)
    p.add_argument("--context-channels", type=int, default=384)
    p.add_argument("--out", default=None, help="optional JSON result path")
    args = p.parse_args()

    import numpy as np
    import torch

    from ref_loader import load_reference

    ref = load_reference()
    cfg = dict(
        forecast_steps=args.steps,
        input_channels=1,
        output_shape=args.size,
        latent_channels=args.latent_channels,
        context_channels=args.context_channels,
    )
    torch.manual_seed(0)
    t_model = ref.DGMR(**cfg)
    t_model.eval()

    rng = np.random.default_rng(0)
    zc, zs = 8, args.size // 32
    z_np = rng.standard_normal((zc, zs, zs, 1)).astype(np.float32)

    class _FixedDist:
        def __init__(self, z):
            self.z = z

        def sample(self, shape):
            return self.z

    t_model.latent_stack.distribution = _FixedDist(torch.from_numpy(z_np))
    x = rng.random((args.batch, 4, 1, args.size, args.size)).astype(np.float32)
    t0 = time.time()
    with torch.no_grad():
        out_ref = t_model(torch.from_numpy(x)).numpy()
    print(f"reference forward: {time.time() - t0:.1f}s", file=sys.stderr)

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        torch.save(t_model.state_dict(), os.path.join(td, "pytorch_model.bin"))
        with open(os.path.join(td, "config.json"), "w") as f:
            json.dump(cfg, f)

        import jax
        import jax.numpy as jnp

        jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        print(f"jax devices: {jax.devices()}", file=sys.stderr)

        from skillful_nowcasting_tpu import DGMR

        bound = DGMR.from_pretrained(td)

    import jax
    import jax.numpy as jnp

    x_nhwc = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    z_ours = jnp.asarray(np.transpose(z_np, (3, 1, 2, 0)))
    out_ref_nhwc = np.transpose(out_ref, (0, 1, 3, 4, 2))

    results = {}
    for label, ctx in (
        ("default_precision", None),
        ("float32_matmuls", "float32"),
    ):
        if ctx is None:
            out = np.asarray(bound(x_nhwc, z=z_ours))
        else:
            with jax.default_matmul_precision(ctx):
                out = np.asarray(bound(x_nhwc, z=z_ours))
        err = float(np.max(np.abs(out - out_ref_nhwc)))
        results[label] = err
        print(f"{label}: max per-frame abs error = {err:.3e}")

    ok = results["default_precision"] <= 1e-3
    results["pass_1e-3"] = ok
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
