"""Tracing / profiling subsystem (SURVEY.md §5).

The reference has no profiling (its only introspection is a permanently-on
``torch.autograd.set_detect_anomaly``, ``dgmr.py:130``).  TPU-native
equivalents provided here:

* :func:`trace` — context manager around ``jax.profiler`` writing
  TensorBoard/Perfetto traces;
* :func:`start_server` — live profiler server for ``tensorboard --logdir``
  capture;
* :func:`enable_nan_checks` — ``jax_debug_nans``, the functional mirror of
  torch's ``detect_anomaly`` (off by default here: quirk Q8 made the
  reference pay that overhead always);
* :func:`annotate` — ``jax.named_scope`` pass-through so model blocks show
  up by name in traces.
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False) -> Iterator[None]:
    """Profile a region: ``with trace("./profile"): run_step()``."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """Start the live profiler server (connect from TensorBoard's profile tab)."""
    return jax.profiler.start_server(port)


def enable_nan_checks(enable: bool = True) -> None:
    """Mirror of torch ``detect_anomaly``: error out on NaN in jitted code."""
    jax.config.update("jax_debug_nans", enable)


annotate = jax.named_scope
