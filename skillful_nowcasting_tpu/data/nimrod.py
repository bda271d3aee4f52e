"""nimrod-uk-1km streaming pipeline (reference ``train/run.py:126-215``).

TPU-native redesign of the reference's ``TFDataset`` + ``DGMRDataModule``:

* the reference streams the full HF dataset independently on every rank with
  random reshuffles (``run.py:147-154``) — an every-rank-streams-everything
  antipattern (SURVEY.md §2.8).  Here the stream is **deterministically
  sharded per host** (``datasets.distributed.split_dataset_by_node`` keyed on
  ``jax.process_index()``, applied BEFORE the seeded shuffle so the buffer
  holds only this host's shard), so hosts read disjoint data;
* windows are split [-22:-18] context / [-18:] target (``windows.py``) and
  kept THWC (no torch axis-moving);
* batches are assembled host-side as numpy and handed to
  :func:`skillful_nowcasting_tpu.data.prefetch.prefetch_to_device` for
  double-buffered HBM staging.

Network access is required for the real hub dataset; the full streaming
path (open → shard → shuffle → window) is exercised offline in
``tests/test_data.py`` by pointing ``dataset_name="parquet"`` +
``load_kwargs={"data_files": ...}`` at a local fixture, and training falls
back to :mod:`.synthetic` when no network exists.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from .windows import NUM_INPUT_FRAMES, NUM_TARGET_FRAMES, extract_input_and_target_frames


class NimrodStream:
    """Per-host sharded, reshuffling stream of (context, target) windows."""

    def __init__(
        self,
        split: str = "train",
        num_input_frames: int = NUM_INPUT_FRAMES,
        num_target_frames: int = NUM_TARGET_FRAMES,
        seed: int = 0,
        shuffle_buffer: int = 1000,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        dataset_name: str = "openclimatefix/nimrod-uk-1km",
        config_name: Optional[str] = "sample",
        load_kwargs: Optional[dict] = None,
    ):
        import jax

        self.split = split
        self.num_input_frames = num_input_frames
        self.num_target_frames = num_target_frames
        self.seed = seed
        self.shuffle_buffer = shuffle_buffer
        self.process_index = (
            process_index if process_index is not None else jax.process_index()
        )
        self.process_count = (
            process_count if process_count is not None else jax.process_count()
        )
        self.dataset_name = dataset_name
        self.config_name = config_name
        # Extra load_dataset kwargs — e.g. ``data_files=...`` with
        # ``dataset_name="parquet"`` streams a LOCAL fixture through the
        # exact hub code path (shuffle/shard/window), which is how the
        # pipeline is tested offline (tests/test_data.py).
        self.load_kwargs = dict(load_kwargs or {})
        self._epoch = 0
        self._iter = None

    def _open(self):
        from datasets import load_dataset

        args = (self.dataset_name,) if self.config_name is None else (
            self.dataset_name,
            self.config_name,
        )
        ds = load_dataset(*args, split=self.split, streaming=True, **self.load_kwargs)
        # Disjoint per-host shards FIRST, then a deterministic per-epoch
        # shuffle within the shard.  Order matters: shuffling first would
        # buffer (and with `datasets` >= 5, crash on) the un-sharded stream.
        # split_dataset_by_node assigns whole files when they divide evenly
        # over hosts and falls back to strided example-skipping otherwise —
        # disjoint either way.
        if self.process_count > 1:
            from datasets.distributed import split_dataset_by_node

            ds = split_dataset_by_node(
                ds, rank=self.process_index, world_size=self.process_count
            )
        ds = ds.shuffle(seed=self.seed + self._epoch, buffer_size=self.shuffle_buffer)
        return iter(ds)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        return self

    def __next__(self) -> Tuple[np.ndarray, np.ndarray]:
        if self._iter is None:
            self._iter = self._open()
        try:
            row = next(self._iter)
        except StopIteration:
            # Epoch boundary: reshuffle and restart (reference run.py:147-154,
            # but with a deterministic epoch-derived seed).
            self._epoch += 1
            self._iter = self._open()
            row = next(self._iter)
        frames = np.asarray(row["radar_frames"], np.float32)  # THWC
        return extract_input_and_target_frames(
            frames, self.num_input_frames, self.num_target_frames
        )


def batch_windows(
    stream: Iterator[Tuple[np.ndarray, np.ndarray]], batch_size: int
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Stack per-sample windows into NTHWC batches."""
    while True:
        inputs, targets = [], []
        for _ in range(batch_size):
            i, t = next(stream)
            inputs.append(i)
            targets.append(t)
        yield np.stack(inputs), np.stack(targets)


class DGMRDataModule:
    """Train/val batch iterators (reference ``train/run.py:161-215``).

    The reference's DataLoader knobs (workers, pin_memory) are replaced by
    the device prefetcher; ``batch_size`` default matches ``run.py:182``.
    """

    def __init__(
        self,
        batch_size: int = 16,
        num_input_frames: int = NUM_INPUT_FRAMES,
        num_target_frames: int = NUM_TARGET_FRAMES,
        seed: int = 0,
        **stream_kwargs,
    ):
        self.batch_size = batch_size
        self.num_input_frames = num_input_frames
        self.num_target_frames = num_target_frames
        self.seed = seed
        self.stream_kwargs = stream_kwargs

    def _loader(self, split: str, seed: int):
        stream = NimrodStream(
            split=split,
            num_input_frames=self.num_input_frames,
            num_target_frames=self.num_target_frames,
            seed=seed,
            **self.stream_kwargs,
        )
        return batch_windows(stream, self.batch_size)

    def train_dataloader(self):
        return self._loader("train", self.seed)

    def val_dataloader(self):
        return self._loader("validation", self.seed + 10_000)
