"""Random-crop window sampling from a frame pool (paper training config).

The paper trains on 256x256 crops of larger radar fields with 4+18-frame
windows (BASELINE.md "Paper GAN training config"); MRMS-style pools are
(T, H, W, C) arrays much larger than one crop.  Sampling = pick a window
start and a crop corner per batch element, then gather/normalize/pack —
done in one OpenMP pass by the native library
(:mod:`skillful_nowcasting_tpu.data.native`).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

from .native import pack_windows
from .windows import NUM_INPUT_FRAMES, NUM_TARGET_FRAMES


def random_crop_batches(
    frame_pool: np.ndarray,
    batch_size: int,
    *,
    crop: int = 256,
    num_input_frames: int = NUM_INPUT_FRAMES,
    num_target_frames: int = NUM_TARGET_FRAMES,
    scale: float = 1.0,
    offset: float = 0.0,
    nan_fill: float = 0.0,
    seed: int = 0,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield NTHWC ``(inputs, targets)`` batches of random spatiotemporal crops.

    ``frame_pool`` is ``(T, H, W, C)`` float32 (e.g. a loaded MRMS chunk or a
    concatenation of nimrod sequences).
    """
    pool = np.ascontiguousarray(frame_pool, np.float32)
    t, h, w, _ = pool.shape
    total = num_input_frames + num_target_frames
    if t < total or h < crop or w < crop:
        raise ValueError(
            f"pool {pool.shape} too small for {total}-frame {crop}^2 windows"
        )
    rng = np.random.default_rng(seed)
    while True:
        starts = rng.integers(0, t - total + 1, batch_size).astype(np.int64)
        crop_y = rng.integers(0, h - crop + 1, batch_size).astype(np.int64)
        crop_x = rng.integers(0, w - crop + 1, batch_size).astype(np.int64)
        yield pack_windows(
            pool,
            starts,
            crop_y,
            crop_x,
            n_in=num_input_frames,
            n_tgt=num_target_frames,
            crop_h=crop,
            crop_w=crop,
            scale=scale,
            offset=offset,
            nan_fill=nan_fill,
        )
