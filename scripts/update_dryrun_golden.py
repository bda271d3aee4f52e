#!/usr/bin/env python
"""Regenerate tests/golden/dryrun_step_key.txt — the canonicalized-computation
hash of the multichip dryrun's DP train step (see
tests/test_parallel.py::test_dryrun_cache_key_golden).

Run whenever the train step's program intentionally changes, then re-warm the
persistent cache (`python __graft_entry__.py` or a test-suite run) so the
driver's MULTICHIP dryrun stays on the warm path.
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from __graft_entry__ import _dryrun_program  # noqa: E402


def main():
    step, state, images, future = _dryrun_program(8)
    lowered = step.lower(state, images, future, jax.random.key(1))
    from jax._src import cache_key as ck

    module = lowered.compiler_ir(dialect="stablehlo")
    canonical = ck._canonicalize_ir(module, ck.IgnoreCallbacks.NO)
    digest = hashlib.sha256(bytes(canonical)).hexdigest()
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir, "tests", "golden",
        "dryrun_step_key.txt",
    )
    with open(path, "w") as f:
        f.write(digest + "\n")
    print(f"wrote {os.path.normpath(path)}: {digest}")


if __name__ == "__main__":
    main()
