"""Utilities: fast variable materialization, precision helpers."""

import hashlib
import os

import jax

from .init import random_fill_variables

__all__ = ["compile_cache_dir", "random_fill_variables", "set_parity_precision"]


def compile_cache_dir(base: str, platform: str = "cpu") -> str:
    """Per-host-ISA persistent-compile-cache directory for CPU backends.

    XLA:CPU persistent-cache entries are AOT machine code whose cache key
    does NOT include the host ISA: entries written on a different machine
    load with a ``cpu_aot_loader`` SIGILL warning and can crash at execution
    time (observed round 3: a cache built on another host aborted the test
    suite).  For CPU runs, key the cache by a fingerprint of the host CPU
    flags so each machine gets its own entries; other platforms (the axon
    TPU) share ``base`` — their executables are not host machine code.
    """
    if platform != "cpu":
        return base
    try:
        with open("/proc/cpuinfo") as f:
            flags = next(line for line in f if line.startswith("flags"))
    except (OSError, StopIteration):  # non-Linux or exotic /proc
        import platform as _platform

        flags = _platform.processor() or _platform.machine()
    fp = hashlib.sha1(flags.encode()).hexdigest()[:8]
    return os.path.join(base, f"cpu-{fp}")


def set_parity_precision(exact: bool = True) -> None:
    """Toggle exact checkpoint-parity numerics on TPU.

    TPU matmuls/convs default to fast (bf16-pass) f32 — measured end-to-end
    deviation vs the torch reference 9.7e-4 (within the 1e-3 budget).  With
    ``exact=True`` matmul precision is raised to full f32: measured deviation
    1.0e-7, at ~3x the conv cost.
    """
    jax.config.update("jax_default_matmul_precision", "float32" if exact else "fastest")
