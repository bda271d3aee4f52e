"""Loss tests mirroring the reference suite (``/root/reference/tests/test_losses.py``)
plus exact-value checks against hand computations and the reference hinge /
grid-cell formulas (`/root/reference/dgmr/losses.py`, `/root/reference/dgmr/dgmr.py:20-33`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skillful_nowcasting_tpu.losses import (
    GridCellLoss,
    MS_SSIMLoss,
    NowcastingLoss,
    SSIMLoss,
    SSIMLossDynamic,
    FocalLoss,
    GradientDifferenceLoss,
    get_loss,
    grid_cell_regularizer,
    loss_hinge_disc,
    loss_hinge_gen,
    tv_loss,
    weight_fn,
)


def _rand(key, shape):
    return jax.random.uniform(jax.random.key(key), shape, jnp.float32)


def test_ssim_loss():
    x = _rand(0, (2, 32, 32, 3))
    y = _rand(1, (2, 32, 32, 3))

    loss = SSIMLoss()
    assert float(loss(x, x)) == pytest.approx(0.0, abs=1e-6)
    assert float(loss(x, y)) != 0

    loss = SSIMLoss(convert_range=True)
    assert float(loss(x, y)) != 0


def test_ms_ssim_loss():
    x = _rand(2, (2, 256, 256, 3))
    y = _rand(3, (2, 256, 256, 3))

    loss = MS_SSIMLoss()
    assert float(loss(x, x)) == pytest.approx(0.0, abs=1e-5)
    assert float(loss(x, y)) != 0

    loss = MS_SSIMLoss(convert_range=True)
    assert float(loss(x, y)) != 0


@pytest.mark.parametrize("hw", [(10, 10), (11, 11), (11, 14), (9, 12)])
def test_msssim_downsample_matches_torch_avg_pool(hw):
    """Odd-dim downsample parity: torch ``avg_pool2d(k=2, padding=s%2)``."""
    import torch
    import torch.nn.functional as F

    from skillful_nowcasting_tpu.losses import _msssim_downsample

    h, w = hw
    x = np.asarray(_rand(11, (2, h, w, 3)))
    ours = np.asarray(_msssim_downsample(jnp.asarray(x)))
    xt = torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))  # NCHW
    ref = F.avg_pool2d(xt, kernel_size=2, padding=(h % 2, w % 2)).numpy()
    np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 3, 1)), rtol=1e-6, atol=1e-6)


def test_ms_ssim_odd_size_runs():
    # A pyramid level with odd H/W must downsample with torch semantics.
    x = _rand(7, (1, 181, 181, 1))
    loss = MS_SSIMLoss()
    assert float(loss(x, x)) == pytest.approx(0.0, abs=1e-5)


def test_ssim_loss_dynamic():
    x = _rand(4, (2, 256, 256, 3))
    y = _rand(5, (2, 256, 256, 3))
    curr = _rand(6, (2, 256, 256, 3))

    loss = SSIMLossDynamic()
    assert float(loss(curr, x, x)) == pytest.approx(0.0, abs=1e-5)
    assert float(loss(curr, x, y)) != 0

    loss = SSIMLossDynamic(convert_range=True)
    assert float(loss(curr, x, y)) != 0


def test_tv_loss():
    # Reference closed-form check (tests/test_losses.py:44-48), NHWC layout.
    x = np.ones((2, 256, 256, 3), np.float32)
    x[0, 0, 0, 0] = 2.5
    assert float(tv_loss(jnp.asarray(x), tv_weight=2)) == pytest.approx(
        2 * (1.5**2 + 1.5**2)
    )


def test_hinge_losses():
    gen = jnp.array([[0.5], [-2.0]])
    real = jnp.array([[0.3], [3.0]])
    # relu(1-0.3)=0.7, relu(1-3)=0 -> mean 0.35 ; relu(1+0.5)=1.5, relu(1-2)=0 -> mean 0.75
    assert float(loss_hinge_disc(gen, real)) == pytest.approx(0.35 + 0.75)
    assert float(loss_hinge_gen(gen)) == pytest.approx(-0.5 * (0.5 - 2.0) * 1.0, abs=1e-6)
    assert float(loss_hinge_gen(gen)) == pytest.approx(0.75)


def test_weight_fn_quirk_q4():
    y = jnp.array([0.0, 10.0, 30.0])
    w = weight_fn(y)
    # max(y+1, 24): a FLOOR of 24 (reference quirk Q4, dgmr.py:33).
    np.testing.assert_allclose(np.asarray(w), [24.0, 24.0, 31.0])


def test_grid_cell_loss_quirk_q3():
    # (B, T, H, W, C) = (1, 2, 3, 4, 1); no weight_fn.
    gen = jnp.ones((1, 2, 3, 4, 1)) * 2.0
    tgt = jnp.ones((1, 2, 3, 4, 1))
    loss = GridCellLoss()
    # ||diff||_1 = 24;  24 / T(=2) * H(=3) * W(=4) = 144  (Q3: multiply by H*W)
    assert float(loss(gen, tgt)) == pytest.approx(24.0 / 2 * 3 * 4)

    weighted = GridCellLoss(weight_fn=weight_fn, precip_weight_cap=24.0)
    # weights = max(1+1, 24) = 24 everywhere -> 24x the unweighted value
    assert float(weighted(gen, tgt)) == pytest.approx(24.0 * 144.0)


def test_nowcasting_loss():
    x = jnp.array([0.5, -0.5])
    loss = NowcastingLoss()
    assert float(loss(x, real_flag=True)) == pytest.approx(0.5 * (0.5 + 1.5))
    assert float(loss(x, real_flag=False)) == pytest.approx(0.5 * (1.5 + 0.5))


def test_grid_cell_regularizer():
    samples = jnp.ones((3, 1, 2, 4, 4, 1)) * 2.0
    targets = jnp.ones((1, 2, 4, 4, 1)) * 30.0
    # weights clip to 24, |mean - target| = 28 -> mean(28 * 24)
    assert float(grid_cell_regularizer(samples, targets)) == pytest.approx(28.0 * 24.0)


def test_gradient_difference_loss():
    x = _rand(7, (1, 2, 8, 8, 1))
    y = _rand(8, (1, 2, 8, 8, 1))
    gdl = GradientDifferenceLoss(alpha=2)
    assert float(gdl(x, x)) == pytest.approx(0.0)
    assert float(gdl(x, y)) > 0


def test_focal_loss():
    logit = jax.nn.softmax(_rand(9, (4, 3)), axis=1)
    target = jnp.array([0, 1, 2, 1])
    loss = FocalLoss()
    val = float(loss(logit, target))
    assert np.isfinite(val) and val > 0


def test_get_loss_factory():
    x = _rand(10, (2, 32, 32, 1))
    y = _rand(11, (2, 32, 32, 1))
    assert float(get_loss("mse")(x, y)) == pytest.approx(float(jnp.mean((x - y) ** 2)))
    assert float(get_loss("l1")(x, y)) == pytest.approx(float(jnp.mean(jnp.abs(x - y))))
    assert float(get_loss("ssim")(x, y)) != 0
    assert callable(get_loss("tv"))
    assert callable(get_loss("focal"))
    with pytest.raises(AssertionError):
        get_loss("nope")


# ---------------------------------------------------------------------------
# Golden-value tests vs the reference's torch loss classes (VERDICT r4 #6).
# The reference's SSIM classes wrap pytorch_msssim (not in this image);
# tests/ref_loader.py vendors that library's published algorithm in torch —
# an independent execution path (torch grouped conv / avg_pool2d) from our
# lax implementation.  FocalLoss is the reference's own code, imported as-is.
# ---------------------------------------------------------------------------


def _golden_pair(seed, shape):
    """Matched (torch NCHW, jax NHWC) inputs in [0, 1]."""
    import torch

    rng = np.random.default_rng(seed)
    a = rng.random(shape, np.float32)  # NHWC
    return torch.from_numpy(np.ascontiguousarray(np.transpose(a, (0, 3, 1, 2)))), jnp.asarray(a)


@pytest.mark.parametrize("convert_range", [False, True])
def test_ssim_loss_golden_vs_reference(convert_range):
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from ref_loader import load_reference

    ref = load_reference()
    xt, xj = _golden_pair(0, (2, 176, 176, 3))
    yt, yj = _golden_pair(1, (2, 176, 176, 3))
    if convert_range:  # feed [-1, 1] when the class rescales
        xt, xj = 2 * xt - 1, 2 * xj - 1
        yt, yj = 2 * yt - 1, 2 * yj - 1

    ref_loss = ref.losses.SSIMLoss(
        convert_range=convert_range, data_range=1.0, channel=3
    )
    ours = SSIMLoss(convert_range=convert_range, data_range=1.0)
    import torch

    with torch.no_grad():
        want = float(ref_loss(xt, yt))
    np.testing.assert_allclose(float(ours(xj, yj)), want, rtol=0, atol=1e-5)


@pytest.mark.parametrize("convert_range", [False, True])
def test_ms_ssim_loss_golden_vs_reference(convert_range):
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from ref_loader import load_reference

    ref = load_reference()
    # 176 and 181 exercise both the even and the odd (asymmetric-pad
    # avg-pool) pyramid paths; 5 levels of win 11 need min side > 160.
    for seed, size in ((2, 176), (3, 181)):
        xt, xj = _golden_pair(seed, (1, size, size, 1))
        yt, yj = _golden_pair(seed + 10, (1, size, size, 1))
        if convert_range:
            xt, xj = 2 * xt - 1, 2 * xj - 1
            yt, yj = 2 * yt - 1, 2 * yj - 1
        ref_loss = ref.losses.MS_SSIMLoss(
            convert_range=convert_range, data_range=1.0, channel=1
        )
        ours = MS_SSIMLoss(convert_range=convert_range, data_range=1.0)
        import torch

        with torch.no_grad():
            want = float(ref_loss(xt, yt))
        np.testing.assert_allclose(
            float(ours(xj, yj)), want, rtol=0, atol=1e-5,
            err_msg=f"size {size}",
        )


def test_ssim_dynamic_golden_vs_reference():
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from ref_loader import load_reference

    ref = load_reference()
    ct, cj = _golden_pair(4, (1, 176, 176, 1))
    xt, xj = _golden_pair(5, (1, 176, 176, 1))
    yt, yj = _golden_pair(6, (1, 176, 176, 1))
    ref_loss = ref.losses.SSIMLossDynamic(data_range=1.0, channel=1)
    ours = SSIMLossDynamic(data_range=1.0)
    import torch

    with torch.no_grad():
        want = float(ref_loss(ct, xt, yt))
    np.testing.assert_allclose(float(ours(cj, xj, yj)), want, rtol=0, atol=1e-5)


@pytest.mark.parametrize(
    "alpha,size_average", [(None, True), (0.25, True), ([1.0, 2.0, 3.0], False)]
)
def test_focal_loss_golden_vs_reference(alpha, size_average):
    """Reference FocalLoss (its own vendored code, losses.py:209-304) on
    fixed probability inputs — all three alpha dialects + both reductions."""
    import sys

    import torch

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from ref_loader import load_reference

    ref = load_reference()
    rng = np.random.default_rng(7)
    raw = rng.random((4, 3, 8, 8)).astype(np.float32) + 0.1
    probs = raw / raw.sum(axis=1, keepdims=True)  # valid class probabilities
    target = rng.integers(0, 3, (4, 1, 8, 8))

    ref_loss = ref.losses.FocalLoss(alpha=alpha, size_average=size_average)
    with torch.no_grad():
        want = float(
            ref_loss(torch.from_numpy(probs), torch.from_numpy(target).long())
        )
    ours = FocalLoss(alpha=alpha, size_average=size_average)
    got = float(ours(jnp.asarray(probs), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
