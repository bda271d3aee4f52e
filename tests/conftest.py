"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-device tests use the standard JAX trick of
``--xla_force_host_platform_device_count`` so pjit/shard_map semantics are
exercised without TPU hardware (SURVEY.md §4).

Note: the environment's sitecustomize imports jax and pins
``JAX_PLATFORMS=axon`` before pytest starts, so the platform must be forced
back to CPU via ``jax.config`` (the env var alone is latched too early).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the DGMR train step takes minutes to compile
# on CPU; cache it across test runs (dir is gitignored).  CPU entries are
# host machine code keyed WITHOUT the host ISA, so the cache dir is
# fingerprinted per machine (a cache written on another host aborts at
# execution — see utils.compile_cache_dir).
import sys  # noqa: E402

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir)))
from skillful_nowcasting_tpu.utils import compile_cache_dir  # noqa: E402

_cache_dir = compile_cache_dir(
    os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"))
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
