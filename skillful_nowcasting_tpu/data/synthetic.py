"""Synthetic radar batches for tests, smoke training, and benchmarks.

Equivalent in role to the reference's in-memory random ``DS`` fixture
(``/root/reference/tests/test_model.py:322-332``), generalized to an
infinite deterministic iterator.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


def synthetic_batches(
    batch_size: int = 1,
    input_frames: int = 4,
    target_frames: int = 18,
    size: int = 256,
    channels: int = 1,
    seed: int = 0,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield ``(images, future_images)`` NTHWC float32 batches forever."""
    rng = np.random.default_rng(seed)
    while True:
        images = rng.random(
            (batch_size, input_frames, size, size, channels), np.float32
        )
        future = rng.random(
            (batch_size, target_frames, size, size, channels), np.float32
        )
        yield images, future
