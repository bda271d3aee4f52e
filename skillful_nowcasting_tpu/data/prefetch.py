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


def prefetch_to_device(
    iterator: Iterator,
    size: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> Iterator:
    """Yield items from ``iterator`` staged onto device ``size`` batches ahead.

    Each item is an arbitrary pytree of numpy arrays; with ``sharding`` given
    (e.g. ``batch_sharding(mesh)``) every leaf is placed sharded over the
    mesh, otherwise committed to the default device.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def put(item):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), item)
        return jax.tree.map(jax.device_put, item)

    def producer():
        try:
            for item in iterator:
                q.put(put(item))
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item
