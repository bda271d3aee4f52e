"""Verify parity against the PUBLISHED ``openclimatefix/dgmr*`` hub weights.

The weight contract is the framework's north star
(``/root/reference/README.md:57-69``,
``/root/reference/tests/test_model.py:309-315``): all five published repos —

* ``openclimatefix/dgmr``                            (full model)
* ``openclimatefix/dgmr-sampler``
* ``openclimatefix/dgmr-discriminator``
* ``openclimatefix/dgmr-latent-conditioning-stack``
* ``openclimatefix/dgmr-context-conditioning-stack``

— must load into this framework and reproduce the torch reference's outputs
within ``--tol`` (default 1e-3 per frame).  The build environment has no
network, so every in-repo parity test runs against *synthesized* fixtures
from freshly-initialized reference modules; this script closes the gap the
moment a network exists: ONE command downloads all five repos, runs the
component + end-to-end gauntlet against the torch reference, and prints a
max-error table.

Without network access it prints the skip reason and exits with code 3.

Usage::

    python scripts/verify_pretrained.py [--tol 1e-3] [--out results.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

REPOS = {
    "dgmr": "openclimatefix/dgmr",
    "sampler": "openclimatefix/dgmr-sampler",
    "discriminator": "openclimatefix/dgmr-discriminator",
    "latent_stack": "openclimatefix/dgmr-latent-conditioning-stack",
    "context_stack": "openclimatefix/dgmr-context-conditioning-stack",
}


class _FixedDist:
    """Replaces the torch latent stack's Normal so both sides share one z."""

    def __init__(self, z):
        self.z = z

    def sample(self, shape):
        return self.z


def _download_all() -> dict:
    """Snapshot-download all five repos; raise on the first failure."""
    from huggingface_hub import snapshot_download

    return {k: snapshot_download(repo_id=rid) for k, rid in REPOS.items()}


def _stream_smoke() -> dict:
    """Pull ONE window pair from the LIVE ``openclimatefix/nimrod-uk-1km``
    stream (the reference's training data path, ``train/run.py:126-158``).

    Returns a status dict; never raises (the caller decides whether an
    offline skip is fatal).  This is the second half of the north-star
    closure (VERDICT r3 item 7): in-repo tests exercise the identical
    shuffle/shard/window code against a local parquet fixture only.
    """
    import numpy as np

    from skillful_nowcasting_tpu.data.nimrod import NimrodStream

    try:
        stream = NimrodStream(process_index=0, process_count=1, shuffle_buffer=1)
        images, future = next(iter(stream))
    except Exception as e:  # noqa: BLE001 — offline, auth, dataset moved
        return {"ok": False, "skip_reason": f"{type(e).__name__}: {e}"}
    status = {
        "ok": bool(
            images.ndim == 4
            and future.ndim == 4
            and np.isfinite(images).all()
            and np.isfinite(future).all()
        ),
        "images_shape": list(images.shape),
        "future_shape": list(future.shape),
    }
    return status


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--out", default=None, help="optional JSON result path")
    args = p.parse_args()

    stream_status = _stream_smoke()
    print(f"live nimrod-uk-1km stream smoke: {stream_status}", file=sys.stderr)

    try:
        paths = _download_all()
    except Exception as e:  # noqa: BLE001 — offline, auth, or missing repo
        print(
            "SKIPPED: could not download the published hub weights "
            f"({type(e).__name__}: {e}).\n"
            "This environment appears to have no network access; re-run this "
            "script on a networked machine to verify the published-weight "
            "contract. All in-repo parity tests use synthesized reference "
            "fixtures instead (tests/test_*_parity.py, tests/test_hub.py).",
            file=sys.stderr,
        )
        if args.out:
            with open(args.out, "w") as f:
                json.dump(
                    {"skipped": "no network", "stream_smoke": stream_status}, f,
                    indent=2,
                )
        # Exit 4 if the stream smoke worked (partial network?) so the states
        # are distinguishable; 3 = fully offline.
        sys.exit(4 if stream_status.get("ok") else 3)

    import numpy as np
    import torch

    from ref_loader import load_reference

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

    from skillful_nowcasting_tpu import (
        DGMR,
        ContextConditioningStack,
        Discriminator,
        LatentConditioningStack,
        Sampler,
    )
    from skillful_nowcasting_tpu.hub import compose_generator
    from skillful_nowcasting_tpu.utils import set_parity_precision

    set_parity_precision()  # full-f32 matmuls for the tight comparison
    ref = load_reference()
    rng = np.random.default_rng(0)
    errors: dict = {}

    def record(name: str, ours: np.ndarray, theirs: np.ndarray):
        err = float(np.max(np.abs(np.asarray(ours) - np.asarray(theirs))))
        errors[name] = err
        status = "ok" if err <= args.tol else "FAIL"
        print(f"{name:<42s} max|Δ| = {err:.3e}  [{status}]")

    # ------------------------------------------------------------------
    # 1. Full DGMR: 18-step 256^2 forward, fixed z.
    # ------------------------------------------------------------------
    t_dgmr = ref.DGMR.from_pretrained(REPOS["dgmr"])
    t_dgmr.eval()
    bound = DGMR.from_pretrained(paths["dgmr"])
    size = int(bound.config.get("output_shape", 256))
    zs = size // 32
    z_np = rng.standard_normal((8, zs, zs, 1)).astype(np.float32)
    t_dgmr.latent_stack.distribution = _FixedDist(torch.from_numpy(z_np))
    x = rng.random((1, 4, 1, size, size), np.float32).astype(np.float32)
    with torch.no_grad():
        out_ref = t_dgmr(torch.from_numpy(x)).numpy()
    out = bound(
        jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))),
        z=jnp.asarray(np.transpose(z_np, (3, 1, 2, 0))),
    )
    record("DGMR (end-to-end, fixed z)", out, np.transpose(out_ref, (0, 1, 3, 4, 2)))

    # ------------------------------------------------------------------
    # 2. Component repos, recomposed Generator (README.md:62-68 flow).
    # ------------------------------------------------------------------
    t_ctz = ref.ContextConditioningStack.from_pretrained(REPOS["context_stack"])
    t_lat = ref.LatentConditioningStack.from_pretrained(REPOS["latent_stack"])
    t_sam = ref.Sampler.from_pretrained(REPOS["sampler"])
    t_gen = ref.Generator(t_ctz, t_lat, t_sam)
    t_gen.eval()

    ctz = ContextConditioningStack.from_pretrained(paths["context_stack"])
    lat = LatentConditioningStack.from_pretrained(paths["latent_stack"])
    sam = Sampler.from_pretrained(paths["sampler"])
    gen = compose_generator(ctz, lat, sam)

    t_lat.distribution = _FixedDist(torch.from_numpy(z_np))
    with torch.no_grad():
        out_ref = t_gen(torch.from_numpy(x)).numpy()
    out = gen(
        jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))),
        z=jnp.asarray(np.transpose(z_np, (3, 1, 2, 0))),
    )
    record("Generator (recomposed components)", out, np.transpose(out_ref, (0, 1, 3, 4, 2)))

    # Context stack alone: all four conditioning scales.
    with torch.no_grad():
        scales_ref = t_ctz(torch.from_numpy(x))
    scales = ctz(jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2))))
    for i, (a, b) in enumerate(zip(scales, scales_ref)):
        record(
            f"ContextConditioningStack scale {i}",
            a,
            np.transpose(b.numpy(), (0, 2, 3, 1)),
        )

    # Latent stack alone: fixed z through conv/LBlock/attention tower.
    with torch.no_grad():
        lat_ref = t_lat(torch.from_numpy(x)).numpy()
    lat_out = lat.apply(z=jnp.asarray(np.transpose(z_np, (3, 1, 2, 0))))
    record("LatentConditioningStack (fixed z)", lat_out, np.transpose(lat_ref, (0, 2, 3, 1)))

    # ------------------------------------------------------------------
    # 3. Discriminator: fixed frame indices on both sides (quirk Q5).
    # ------------------------------------------------------------------
    t_disc = ref.Discriminator.from_pretrained(REPOS["discriminator"])
    t_disc.eval()
    disc = Discriminator.from_pretrained(paths["discriminator"])
    seq = rng.random((1, 8, 1, size, size), np.float32).astype(np.float32)
    idx = list(range(8))
    orig_randint = torch.randint
    try:
        torch.randint = lambda *a, **k: torch.tensor(idx)
        with torch.no_grad():
            d_ref = t_disc(torch.from_numpy(seq)).numpy()
    finally:
        torch.randint = orig_randint
    d_out = disc.apply(
        jnp.asarray(np.transpose(seq, (0, 1, 3, 4, 2))), frame_indices=jnp.asarray(idx)
    )
    record("Discriminator (fixed frames)", d_out, d_ref)

    ok = all(e <= args.tol for e in errors.values()) and stream_status.get("ok", False)
    results = {"tol": args.tol, "pass": ok, "stream_smoke": stream_status, **errors}
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
