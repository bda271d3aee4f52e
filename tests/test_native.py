"""Native host data-path tests: C++ pack_windows / space_to_depth vs numpy."""

import numpy as np
import pytest

from skillful_nowcasting_tpu.data.native import (
    native_available,
    pack_windows,
    space_to_depth_host,
)


def _ref_pack(frames, starts, crop_y, crop_x, n_in, n_tgt, ch, cw, scale, offset, nan_fill):
    b = len(starts)
    total = n_in + n_tgt
    ins, tgs = [], []
    for i in range(b):
        win = frames[starts[i] : starts[i] + total, crop_y[i] : crop_y[i] + ch, crop_x[i] : crop_x[i] + cw]
        win = np.nan_to_num(win, nan=nan_fill) * scale + offset
        ins.append(win[:n_in])
        tgs.append(win[n_in:])
    return np.stack(ins), np.stack(tgs)


def test_native_builds():
    assert native_available(), "native library failed to build"


def test_pack_windows_matches_numpy():
    rng = np.random.default_rng(0)
    frames = rng.random((30, 64, 80, 1), np.float32)
    frames[3, 5, 7, 0] = np.nan
    starts = np.array([0, 4, 8], np.int64)
    cy = np.array([0, 10, 32], np.int64)
    cx = np.array([0, 16, 40], np.int64)

    out_in, out_tg = pack_windows(
        frames, starts, cy, cx, n_in=4, n_tgt=18, crop_h=32, crop_w=32,
        scale=2.0, offset=-1.0, nan_fill=0.5,
    )
    ref_in, ref_tg = _ref_pack(frames, starts, cy, cx, 4, 18, 32, 32, 2.0, -1.0, 0.5)
    np.testing.assert_allclose(out_in, ref_in, rtol=1e-6)
    np.testing.assert_allclose(out_tg, ref_tg, rtol=1e-6)
    assert out_in.shape == (3, 4, 32, 32, 1)
    assert out_tg.shape == (3, 18, 32, 32, 1)


def test_pack_windows_bounds():
    frames = np.zeros((10, 8, 8, 1), np.float32)
    with pytest.raises(ValueError):
        pack_windows(
            frames, np.array([0], np.int64), np.array([0], np.int64),
            np.array([0], np.int64), n_in=4, n_tgt=18, crop_h=8, crop_w=8,
        )


def test_space_to_depth_host_matches_device_op():
    import jax.numpy as jnp

    from skillful_nowcasting_tpu.ops import space_to_depth

    rng = np.random.default_rng(1)
    x = rng.random((2, 3, 8, 8, 2), np.float32)
    host = space_to_depth_host(x, 2)
    dev = np.asarray(space_to_depth(jnp.asarray(x), 2))
    np.testing.assert_allclose(host, dev, rtol=1e-6)
