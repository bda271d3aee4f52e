"""Measure the torch reference's GAN train step on CPU (the baseline side).

Closes VERDICT r4 weak #2: BASELINE.md promises a head-to-head
"GAN train steps/sec" and until now only OUR side was measured.  This runs
the reference's OWN ``training_step`` (``/root/reference/dgmr/dgmr.py:137-218``
— 2 discriminator updates + 6-sample generator update + logging forward,
torch.utils.checkpoint on every generator call) at paper config on this
host's torch-CPU, exactly as shipped (the ctor force-enables
``torch.autograd.set_detect_anomaly(True)``, quirk Q8), then once more with
that debugging overhead off — the same two-sided protocol as the inference
baseline (BASELINE.md).

Paper config does fit in host RAM at small batch; CPU time scales ~linearly
in batch on this 1-core host, so the pinned number is recorded per-sample
alongside steps/sec at the measured batch.  Results cache to
``.bench_ref_train.json`` (repo root); bench.py pins the round-5 measurement
as a constant the same way PINNED_REF_FPS pins the inference side.

Usage::

    python scripts/bench_ref_train.py [--batch 1] [--steps 1] [--out PATH]

Run on a QUIET host: 1 step at B=1 is ~10-20 min of single-core torch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--steps", type=int, default=1, help="timed steps per side")
    p.add_argument("--skip-warmup", action="store_true")
    p.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".bench_ref_train.json"),
    )
    args = p.parse_args()

    from ref_loader import load_reference

    import torch

    torch.manual_seed(0)
    ref = load_reference()
    model = ref.DGMR()  # paper config; ctor turns detect_anomaly ON (as-is)
    model.train()
    # The ref_loader LightningModule stub wires self.optimizers() to
    # self._optimizers; training_step unpacks (g_opt, d_opt).
    (opt_g, opt_d), _ = model.configure_optimizers()
    model._optimizers = (opt_g, opt_d)

    g = torch.Generator().manual_seed(1)
    images = torch.rand((args.batch, 4, 1, 256, 256), generator=g)
    future = torch.rand((args.batch, 18, 1, 256, 256), generator=g)

    def run_steps(n: int) -> float:
        t0 = time.time()
        for i in range(n):
            model.training_step((images, future), i)
        return (time.time() - t0) / n

    if not args.skip_warmup:
        t0 = time.time()
        model.training_step((images, future), 0)  # lazy init + allocator warmup
        print(f"warmup step: {time.time() - t0:.1f}s", flush=True)

    dt = run_steps(args.steps)
    print(
        f"as-is (detect_anomaly on): {dt:.1f} s/step at B={args.batch} "
        f"-> {1.0 / dt:.5f} steps/s, {args.batch / dt:.5f} samples/s",
        flush=True,
    )

    torch.autograd.set_detect_anomaly(False)
    dt_clean = run_steps(args.steps)
    torch.autograd.set_detect_anomaly(True)
    print(
        f"detect_anomaly off: {dt_clean:.1f} s/step "
        f"-> {1.0 / dt_clean:.5f} steps/s, {args.batch / dt_clean:.5f} samples/s",
        flush=True,
    )

    result = {
        "batch": args.batch,
        "timed_steps": args.steps,
        "seconds_per_step": dt,
        "steps_per_sec": 1.0 / dt,
        "samples_per_sec": args.batch / dt,
        "seconds_per_step_no_detect_anomaly": dt_clean,
        "steps_per_sec_no_detect_anomaly": 1.0 / dt_clean,
        "samples_per_sec_no_detect_anomaly": args.batch / dt_clean,
        "torch_threads": torch.get_num_threads(),
        "nproc": os.cpu_count(),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
