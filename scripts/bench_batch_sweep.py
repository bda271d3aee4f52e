"""Inference batch sweep: kill-or-explain the B>=24 throughput cliff.

Round-2 finding (CLAUDE.md): B=16 is the per-chip sweet spot; B=24/32
regressed >2x (activation spill past the ~16 GB HBM).  Round-3 fix: in-jit
microbatch chunking (``make_generate(microbatch=16)``) chains ceil(B/16)
forwards of <=16 inside one program so serving throughput stays flat in B.

Measures frames/sec/chip for each (batch, microbatch) pair with the
scan-chain protocol from ``bench.py`` (fetch forces the whole chain; per-call
``block_until_ready`` is not trustworthy through the axon tunnel).

Usage::

    python scripts/bench_batch_sweep.py [--batches 16,24,32,48] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="16,24,32,48")
    p.add_argument("--microbatches", default="none,16")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--samples", type=int, default=1)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from skillful_nowcasting_tpu import DGMR
    from skillful_nowcasting_tpu.hub.pretrained import abstract_variables
    from skillful_nowcasting_tpu.inference import make_generate
    from skillful_nowcasting_tpu.utils import random_fill_variables

    print(f"devices: {jax.devices()}", file=sys.stderr)
    model = DGMR()  # paper config
    variables = random_fill_variables(abstract_variables(model), jax.random.key(0))
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    results = []
    for mb_s in args.microbatches.split(","):
        mb = None if mb_s in ("none", "0") else int(mb_s)
        gen = make_generate(model, num_samples=args.samples, microbatch=mb)

        @jax.jit
        def chain(variables, x, key, gen=gen):
            def body(_, k):
                return None, jnp.mean(gen(variables, x, k).astype(jnp.float32))

            _, probes = jax.lax.scan(body, None, jax.random.split(key, args.iters))
            return probes

        for b in (int(s) for s in args.batches.split(",")):
            x = jax.random.uniform(jax.random.key(7), (b, 4, 256, 256, 1), dtype)
            try:
                t0 = time.time()
                np.asarray(chain(variables, x, jax.random.key(1)))
                compile_s = time.time() - t0
                t0 = time.time()
                np.asarray(chain(variables, x, jax.random.key(2)))
                dt = (time.time() - t0) / args.iters
            except Exception as e:  # noqa: BLE001 — OOM at large B is a result
                print(f"B={b} mb={mb}: {type(e).__name__}: {e}", file=sys.stderr)
                results.append({"batch": b, "microbatch": mb, "error": type(e).__name__})
                continue
            fps = b * args.samples * model.forecast_steps / dt
            per_b = fps / b
            print(
                f"B={b:<3d} mb={mb or '-':<4} {args.dtype}: {dt*1000:7.1f} ms/gen "
                f"-> {fps:8.1f} frames/s/chip ({per_b:6.1f} per batch-elem; "
                f"compile+1st {compile_s:.0f}s)",
                file=sys.stderr,
            )
            results.append(
                {"batch": b, "microbatch": mb, "dtype": args.dtype,
                 "ms_per_generate": round(dt * 1000, 1),
                 "frames_per_sec_chip": round(fps, 1)}
            )
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
