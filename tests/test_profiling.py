"""Profiling / observability subsystem smoke tests (SURVEY.md §5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_trace_writes_profile(tmp_path):
    from skillful_nowcasting_tpu.profiling import trace

    with trace(str(tmp_path)):
        jax.jit(lambda x: x * 2)(jnp.ones((8, 8))).block_until_ready()
    written = [
        os.path.join(root, f)
        for root, _, files in os.walk(tmp_path)
        for f in files
    ]
    assert written, "profiler wrote no trace files"


def test_nan_check_toggle():
    from skillful_nowcasting_tpu.profiling import enable_nan_checks

    enable_nan_checks(True)
    try:
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: x / 0.0)(jnp.zeros(()))
    finally:
        enable_nan_checks(False)


def test_metrics_logger_tensorboard(tmp_path):
    from skillful_nowcasting_tpu.logging_utils import MetricsLogger

    logger = MetricsLogger(str(tmp_path))
    logger.log_scalars({"train/g_loss": 1.5, "train/d_loss": 0.25}, step=1)
    logger.log_video_frames(
        "train/Generated_Image", np.random.rand(1, 3, 8, 8, 1).astype(np.float32), 1
    )
    logger.flush()
    logger.close()
    files = [f for _, _, fs in os.walk(tmp_path) for f in fs]
    assert any("tfevents" in f for f in files)
