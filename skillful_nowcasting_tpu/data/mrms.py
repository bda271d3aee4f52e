"""MRMS CONUS radar loading: Zarr-backed sequences and tiled inference feed.

Reference context: the reference README describes MRMS training data as
3500x7000 CONUS Zarr with 24-frame sequences (``/root/reference/README.md:41-49``)
but contains no loader — cropping happened upstream.  Here the loader is a
first-class component:

* :class:`MRMSSequences` — random 256^2 crop batches of (4 context +
  ``num_target``) windows straight from a (T, H, W[, C]) Zarr array (or any
  array-protocol object: numpy, h5py, xarray.DataArray.data), packed by the
  native C++ path;
* :func:`mrms_tiles` — full-domain context windows for
  :func:`skillful_nowcasting_tpu.inference.tiled_nowcast`.

``zarr`` is optional: ``open_zarr`` raises a clear ImportError when absent,
and everything accepts plain arrays for tests.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from .crops import random_crop_batches


def open_zarr(path: str, variable: Optional[str] = None):
    """Open an MRMS Zarr store; returns the (T, H, W[, C]) array object."""
    try:
        import zarr
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "zarr is not installed; pass a numpy/array-protocol object to "
            "MRMSSequences / mrms_tiles instead"
        ) from e
    root = zarr.open(path, mode="r")
    if variable is not None:
        return root[variable]
    if hasattr(root, "shape"):
        return root
    # Zarr group: take the first array.
    keys = list(root.array_keys())
    if not keys:
        raise ValueError(f"no arrays in zarr store {path}")
    return root[keys[0]]


def _ensure_thwc(a: np.ndarray) -> np.ndarray:
    if a.ndim == 3:
        return a[..., None]
    if a.ndim == 4:
        return a
    raise ValueError(f"expected (T,H,W[,C]) array, got shape {a.shape}")


class MRMSSequences:
    """Random-crop training sequences from a CONUS-scale radar array.

    Reads a time-chunk of frames into host memory at a time (Zarr chunk
    streaming), then serves random 256^2 crop batches from it via the native
    packer — the host analog of the nimrod shuffle-buffer, sized for
    hundreds-of-GB stores.
    """

    def __init__(
        self,
        array,
        *,
        batch_size: int = 16,
        crop: int = 256,
        num_input_frames: int = 4,
        num_target_frames: int = 18,
        frames_per_chunk: int = 96,
        batches_per_chunk: int = 64,
        scale: float = 1.0,
        offset: float = 0.0,
        nan_fill: float = 0.0,
        seed: int = 0,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.array = array
        self.batch_size = batch_size
        self.crop = crop
        self.n_in = num_input_frames
        self.n_tgt = num_target_frames
        self.frames_per_chunk = max(frames_per_chunk, num_input_frames + num_target_frames)
        self.batches_per_chunk = batches_per_chunk
        self.scale, self.offset, self.nan_fill = scale, offset, nan_fill
        self.seed = seed
        if process_index is None or process_count is None:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        self.process_index = process_index
        self.process_count = process_count

    def _next_chunk_start(
        self, rng: np.random.Generator, t_total: int, phase: int = 0
    ) -> int:
        """Disjoint per-host chunk start: chunk-aligned slots on the time axis,
        strided by host index, so no two hosts ever read the same chunk.

        ``phase`` shifts the WHOLE slot grid by the same offset (all hosts use
        the same per-epoch phase, so the shifted chunks stay pairwise
        disjoint) — without it training windows would never cross the fixed
        chunk boundaries.  Shifting can drop the final slot (the shifted grid
        holds one fewer complete chunk); slots are recomputed per phase.

        Falls back to independent draws when the array is too short to give
        every host its own slot — this LOSES the disjointness guarantee
        (warned once): hosts may then sample overlapping windows.
        """
        max_start = t_total - self.frames_per_chunk
        if max_start <= 0:
            return 0
        phase = min(phase, max_start)
        n_slots = (max_start - phase) // self.frames_per_chunk + 1
        host_slots = np.arange(n_slots)[self.process_index :: self.process_count]
        if host_slots.size:
            return phase + int(rng.choice(host_slots)) * self.frames_per_chunk
        if not self._warned_overlap:
            self._warned_overlap = True
            import sys

            print(
                f"MRMSSequences: {self.process_count} hosts > {n_slots} "
                f"chunk slots — falling back to independent uniform chunk "
                "starts (hosts may sample overlapping data)",
                file=sys.stderr,
            )
        return int(rng.integers(0, max_start + 1))

    _warned_overlap = False

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        t_total = self.array.shape[0]
        rng = np.random.default_rng(self.seed + 7919 * self.process_index)
        # Host-independent phase stream: every host draws the same phase
        # sequence (seeded by ``seed`` alone) so the k-th chunk pick uses the
        # same slot-boundary shift on all hosts, preserving disjointness.
        phase_rng = np.random.default_rng(self.seed ^ 0x5EED)
        while True:
            phase = int(phase_rng.integers(0, self.frames_per_chunk))
            start = self._next_chunk_start(rng, t_total, phase)
            pool = _ensure_thwc(
                np.asarray(self.array[start : start + self.frames_per_chunk], np.float32)
            )
            it = random_crop_batches(
                pool,
                self.batch_size,
                crop=self.crop,
                num_input_frames=self.n_in,
                num_target_frames=self.n_tgt,
                scale=self.scale,
                offset=self.offset,
                nan_fill=self.nan_fill,
                seed=int(rng.integers(0, 2**31 - 1)),
            )
            for _ in range(self.batches_per_chunk):
                yield next(it)


def mrms_tiles(
    array,
    t_index: int,
    *,
    num_input_frames: int = 4,
    scale: float = 1.0,
    offset: float = 0.0,
    nan_fill: float = 0.0,
) -> np.ndarray:
    """Extract the (num_input_frames, H, W, C) context window ending at ``t_index``.

    Feed the result to :func:`skillful_nowcasting_tpu.inference.tiled_nowcast`
    for full-CONUS nowcasts.
    """
    if t_index + 1 < num_input_frames:
        raise ValueError("not enough history before t_index")
    window = np.asarray(
        array[t_index + 1 - num_input_frames : t_index + 1], np.float32
    )
    window = _ensure_thwc(window)
    return np.nan_to_num(window, nan=nan_fill) * scale + offset
