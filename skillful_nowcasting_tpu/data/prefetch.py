"""Double-buffered host->HBM prefetch.

Replaces the reference's DataLoader worker/pin-memory machinery
(``train/run.py:186-215``) with the TPU-native pattern: a background thread
stages the next batches onto the device (optionally sharded over the mesh)
while the current step runs, hiding host->HBM transfer latency behind
compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax


class _PrefetchError:
    """Wrapper carrying a producer-thread exception to the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch_to_device(
    iterator: Iterator,
    size: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
    transfer_dtype=None,
) -> Iterator:
    """Yield items from ``iterator`` staged onto device ``size`` batches ahead.

    Each item is an arbitrary pytree of numpy arrays; with ``sharding`` given
    (e.g. ``batch_sharding(mesh)``) every leaf is placed sharded over the
    mesh, otherwise committed to the default device.

    With ``transfer_dtype`` (e.g. ``jnp.bfloat16``) floating-point leaves are
    cast host-side before the transfer, halving host->device bytes — the lever
    for link-limited hosts where batch staging serializes with compute (see
    CLAUDE.md on the axon tunnel).  The cast quantizes the data (the train
    step upcasts on device), so it is opt-in: with ``compute_dtype=bfloat16``
    training the generator/discriminator inputs are bitwise unchanged, but
    f32-path consumers (the grid-loss target) see bf16-rounded values.

    Exceptions raised by the underlying iterator (or by the device transfer)
    are re-raised in the consumer so a broken data pipeline fails the training
    loop with the real error instead of a silent end-of-stream.
    """
    import numpy as np

    q: "queue.Queue" = queue.Queue(maxsize=size)
    end = object()

    def cast(x):
        # Host numpy leaves only — casting a committed device array would
        # round-trip it through the host, defeating the point.
        if (
            transfer_dtype is not None
            and isinstance(x, np.ndarray)
            and np.issubdtype(x.dtype, np.floating)
        ):
            return x.astype(transfer_dtype)
        return x

    def put(item):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(cast(x), sharding), item)
        return jax.tree.map(lambda x: jax.device_put(cast(x)), item)

    def producer():
        try:
            for item in iterator:
                q.put(put(item))
        except BaseException as e:  # noqa: BLE001 — forwarded to the consumer
            q.put(_PrefetchError(e))
        else:
            q.put(end)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    while True:
        item = q.get()
        if item is end:
            return
        if isinstance(item, _PrefetchError):
            raise item.exc
        yield item
