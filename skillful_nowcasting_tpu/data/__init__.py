"""Data pipeline: window extraction, nimrod streaming, prefetch, synthetic."""

from .crops import random_crop_batches
from .mrms import MRMSSequences, mrms_tiles, open_zarr
from .nimrod import DGMRDataModule, NimrodStream, batch_windows
from .prefetch import prefetch_to_device
from .synthetic import (
    blob_fields,
    synthetic_batches,
    synthetic_radar_batches,
    synthetic_radar_batches_device,
)
from .windows import (
    NUM_INPUT_FRAMES,
    NUM_TARGET_FRAMES,
    extract_input_and_target_frames,
)

__all__ = [
    "DGMRDataModule",
    "MRMSSequences",
    "NUM_INPUT_FRAMES",
    "NUM_TARGET_FRAMES",
    "NimrodStream",
    "batch_windows",
    "extract_input_and_target_frames",
    "mrms_tiles",
    "open_zarr",
    "prefetch_to_device",
    "random_crop_batches",
    "blob_fields",
    "synthetic_batches",
    "synthetic_radar_batches",
    "synthetic_radar_batches_device",
]
