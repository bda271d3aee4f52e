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


def synthetic_radar_batches(
    batch_size: int = 1,
    input_frames: int = 4,
    target_frames: int = 18,
    size: int = 256,
    channels: int = 1,
    seed: int = 0,
    n_blobs: int = 8,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Advecting-Gaussian-blob sequences: structured, *learnable* synthetic radar.

    Each sample is a field of ``n_blobs`` Gaussian rain cells translating
    with constant per-sample velocity (the classic advection model that
    nowcasting baselines like PySTEPS assume), so future frames are
    predictable from the context — unlike :func:`synthetic_batches`' i.i.d.
    noise, the grid-cell loss has signal to descend during smoke training.

    Intensities are scaled to [0, ~12] mm/h-like values so the reference's
    ``max(y+1, 24)`` grid-loss weighting (quirk Q4) is exercised in its flat
    region, matching the scale of normalized nimrod data.
    """
    rng = np.random.default_rng(seed)
    t_total = input_frames + target_frames
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")

    while True:
        seq = np.zeros((batch_size, t_total, size, size, channels), np.float32)
        for b in range(batch_size):
            pos = rng.uniform(0, size, (n_blobs, 2))
            vel = rng.uniform(-3.0, 3.0, (n_blobs, 2))
            sigma = rng.uniform(size / 32, size / 8, n_blobs)
            amp = rng.uniform(2.0, 12.0, n_blobs)
            for t in range(t_total):
                field = np.zeros((size, size), np.float32)
                for k in range(n_blobs):
                    cy = (pos[k, 0] + vel[k, 0] * t) % size
                    cx = (pos[k, 1] + vel[k, 1] * t) % size
                    # Wrap-around distance keeps blobs continuous at edges.
                    dy = np.minimum(np.abs(yy - cy), size - np.abs(yy - cy))
                    dx = np.minimum(np.abs(xx - cx), size - np.abs(xx - cx))
                    field += amp[k] * np.exp(-(dy * dy + dx * dx) / (2 * sigma[k] ** 2))
                seq[b, t, :, :, 0] = field
        yield seq[:, :input_frames], seq[:, input_frames:]
