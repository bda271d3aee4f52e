"""Radar window extraction (reference ``train/run.py:114-123``).

Frames are NTHWC/THWC throughout (the TPU-native layout; the reference
moves to TCHW for torch, ``run.py:156-158`` — not needed here).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

NUM_INPUT_FRAMES = 4
NUM_TARGET_FRAMES = 18


def extract_input_and_target_frames(
    radar_frames: np.ndarray,
    num_input_frames: int = NUM_INPUT_FRAMES,
    num_target_frames: int = NUM_TARGET_FRAMES,
) -> Tuple[np.ndarray, np.ndarray]:
    """Split a >= (input+target)-frame THWC window into (context, target).

    Matches the reference slicing: inputs are frames
    ``[-(input+target) : -target]``, targets the final ``target`` frames
    (``run.py:118-123``).
    """
    total = num_input_frames + num_target_frames
    if radar_frames.shape[0] < total:
        raise ValueError(
            f"window has {radar_frames.shape[0]} frames, need >= {total}"
        )
    input_frames = radar_frames[-total:-num_target_frames]
    target_frames = radar_frames[-num_target_frames:]
    return input_frames, target_frames
