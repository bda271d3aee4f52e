"""Loss functions for DGMR training (reference: ``/root/reference/dgmr/losses.py``).

All functions are pure JAX and operate on NHWC images ``(B, H, W, C)`` or
NTHWC videos ``(B, T, H, W, C)`` — the framework's TPU-native layout (the
reference uses NCHW / NTCHW; values are layout-invariant).

Training-critical pieces (used by :mod:`skillful_nowcasting_tpu.dgmr`):

* :func:`loss_hinge_disc` / :func:`loss_hinge_gen` — GAN hinge losses
  (``losses.py:307-319``).
* :class:`GridCellLoss` — grid-cell regularizer.  **Quirk Q3** (SURVEY.md
  §2.9): the reference normalization ``diff.norm(p=1) / T * H * W``
  evaluates left-to-right as ``(‖diff‖₁ / T) · H · W`` (``losses.py:192``);
  ``grid_lambda=20.0`` was tuned against that scale, so it is reproduced
  exactly.
* :func:`weight_fn` — **Quirk Q4**: ``max(y + 1, cap)`` (``dgmr.py:33``), a
  floor at ``cap`` rather than the paper's ceiling; reproduced exactly.
  :func:`grid_cell_regularizer` implements the paper-style clip
  (``losses.py:322-336``).

Public extras mirrored from the reference: SSIM / MS-SSIM / dynamic-SSIM
losses (native JAX re-implementation of the ``pytorch_msssim`` algorithm the
reference wraps — Gaussian window 11/1.5, valid convolution, per-scale cs
product), total variation, gradient difference, focal loss, and the
:func:`get_loss` factory (``losses.py:339-378``).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Training-critical losses
# ---------------------------------------------------------------------------


def loss_hinge_disc(score_generated: jnp.ndarray, score_real: jnp.ndarray) -> jnp.ndarray:
    """Discriminator hinge loss (``losses.py:307-313``)."""
    l1 = jax.nn.relu(1.0 - score_real)
    l2 = jax.nn.relu(1.0 + score_generated)
    return jnp.mean(l1) + jnp.mean(l2)


def loss_hinge_gen(score_generated: jnp.ndarray) -> jnp.ndarray:
    """Generator hinge loss (``losses.py:316-319``)."""
    return -jnp.mean(score_generated)


def weight_fn(y: jnp.ndarray, precip_weight_cap: float = 24.0) -> jnp.ndarray:
    """Grid-cell loss weights: ``max(y + 1, cap)`` (``dgmr.py:20-33``, quirk Q4)."""
    return jnp.maximum(y + 1.0, precip_weight_cap)


class GridCellLoss:
    """Grid-cell regularizer (``losses.py:158-192``).

    Weighted L1 between the mean generated prediction and the target.
    Normalization follows the reference exactly (quirk Q3):
    ``(‖diff‖₁ / T) * H * W`` for NTHWC ``(B, T, H, W, C)`` inputs — torch's
    ``size(1)=T, size(3)=H, size(4)=W`` on NTCHW map to our axes 1, 2, 3.
    """

    def __init__(self, weight_fn: Optional[Callable] = None, precip_weight_cap: float = 24.0):
        self.weight_fn = (lambda y: weight_fn(y, precip_weight_cap)) if weight_fn else None

    def __call__(self, generated_images: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        difference = generated_images - targets
        if self.weight_fn is not None:
            difference = difference * self.weight_fn(targets)
        difference = jnp.sum(jnp.abs(difference))  # ‖·‖₁ over all elements
        t, h, w = targets.shape[1], targets.shape[2], targets.shape[3]
        return difference / t * h * w


class NowcastingLoss:
    """Hinge loss helper (``losses.py:195-206``); constructed but unused by DGMR."""

    def __call__(self, x: jnp.ndarray, real_flag: bool) -> jnp.ndarray:
        if real_flag is True:
            x = -x
        return jnp.mean(jax.nn.relu(1.0 + x))


def grid_cell_regularizer(
    generated_samples: jnp.ndarray, batch_targets: jnp.ndarray
) -> jnp.ndarray:
    """Paper-style grid cell regularizer (``losses.py:322-336``, unused by DGMR).

    Args:
        generated_samples: ``(n_samples, B, T, H, W, C)``.
        batch_targets: ``(B, T, H, W, C)``.
    """
    gen_mean = jnp.mean(generated_samples, axis=0)
    weights = jnp.clip(batch_targets, 0.0, 24.0)
    return jnp.mean(jnp.abs(gen_mean - batch_targets) * weights)


# ---------------------------------------------------------------------------
# SSIM family (native JAX re-implementation of the pytorch_msssim algorithm)
# ---------------------------------------------------------------------------


def _gaussian_window(win_size: int, sigma: float) -> jnp.ndarray:
    coords = jnp.arange(win_size, dtype=jnp.float32) - win_size // 2
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def _gaussian_filter(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise Gaussian blur, VALID padding, NHWC input."""
    c = x.shape[-1]
    n = win.shape[0]
    kh = jnp.tile(win.reshape(n, 1, 1, 1), (1, 1, 1, c))  # HWIO depthwise
    kw = jnp.tile(win.reshape(1, n, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    dn = jax.lax.conv_dimension_numbers(x.shape, kw.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )


def _ssim_per_channel(x, y, data_range, win_size, sigma, k1, k2):
    """Mean SSIM and contrast-structure (cs) per (batch, channel)."""
    win = _gaussian_window(win_size, sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _gaussian_filter(x, win)
    mu_y = _gaussian_filter(y, win)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_xx = _gaussian_filter(x * x, win) - mu_xx
    sigma_yy = _gaussian_filter(y * y, win) - mu_yy
    sigma_xy = _gaussian_filter(x * y, win) - mu_xy

    cs_map = (2.0 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs_map
    return jnp.mean(ssim_map, axis=(1, 2)), jnp.mean(cs_map, axis=(1, 2))


def _to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """Fold an optional leading time axis of NTHWC video into the batch."""
    if x.ndim == 5:
        return x.reshape((-1,) + x.shape[2:])
    return x


def ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    size_average: bool = True,
) -> jnp.ndarray:
    """Structural similarity on NHWC images / NTHWC videos (pytorch_msssim parity)."""
    x, y = _to_nhwc(x), _to_nhwc(y)
    s, _ = _ssim_per_channel(x, y, data_range, win_size, win_sigma, k1, k2)
    return jnp.mean(s) if size_average else jnp.mean(s, axis=1)


def _msssim_downsample(x: jnp.ndarray) -> jnp.ndarray:
    """pytorch_msssim's 2x downsample: ``avg_pool2d(k=2, padding=s % 2)`` on NHWC.

    torch zero-pads BOTH sides, but ``floor((H + 2p - 2)/2) + 1`` windows never
    reach the bottom/right pad element — the effective semantics are a single
    top/left zero pad with ``count_include_pad`` (divide by 4 regardless).
    """
    pad_h, pad_w = x.shape[1] % 2, x.shape[2] % 2
    pad = [(0, 0), (pad_h, 0), (pad_w, 0), (0, 0)]
    return (
        jax.lax.reduce_window(
            jnp.pad(x, pad), 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
        / 4.0
    )


def ms_ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    weights: Sequence[float] = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333),
    size_average: bool = True,
) -> jnp.ndarray:
    """Multi-scale SSIM (pytorch_msssim algorithm: per-scale cs product)."""
    x, y = _to_nhwc(x), _to_nhwc(y)
    weights_arr = jnp.asarray(weights, jnp.float32)
    levels = len(weights)
    min_side = min(x.shape[1], x.shape[2])
    if min_side <= (win_size - 1) * (2 ** (levels - 1)):
        raise ValueError(
            f"image side {min_side} too small for {levels}-level MS-SSIM with win {win_size}"
        )

    mcs = []
    for i in range(levels):
        s, cs = _ssim_per_channel(x, y, data_range, win_size, win_sigma, k1, k2)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            x = _msssim_downsample(x)
            y = _msssim_downsample(y)

    ssim_val = jax.nn.relu(s)  # last scale
    stacked = jnp.stack(mcs + [ssim_val], axis=0)  # (levels, B, C)
    out = jnp.prod(stacked ** weights_arr[:, None, None], axis=0)
    return jnp.mean(out) if size_average else jnp.mean(out, axis=1)


class SSIMLoss:
    """``1 - SSIM`` with optional [-1,1]→[0,1] range conversion (``losses.py:10-30``)."""

    def __init__(self, convert_range: bool = False, **kwargs):
        self.convert_range = convert_range
        self.kwargs = kwargs

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        if self.convert_range:
            x = (x + 1.0) / 2.0
            y = (y + 1.0) / 2.0
        return 1.0 - ssim(x, y, **self.kwargs)


class MS_SSIMLoss:
    """``1 - MS-SSIM`` (``losses.py:33-53``)."""

    def __init__(self, convert_range: bool = False, **kwargs):
        self.convert_range = convert_range
        self.kwargs = kwargs

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        if self.convert_range:
            x = (x + 1.0) / 2.0
            y = (y + 1.0) / 2.0
        return 1.0 - ms_ssim(x, y, **self.kwargs)


class SSIMLossDynamic:
    """MS-SSIM on the change relative to the current frame (``losses.py:56-88``)."""

    def __init__(self, convert_range: bool = False, **kwargs):
        self.convert_range = convert_range
        self.kwargs = kwargs

    def __call__(
        self, curr_image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
    ) -> jnp.ndarray:
        if self.convert_range:
            curr_image = (curr_image + 1.0) / 2.0
            x = (x + 1.0) / 2.0
            y = (y + 1.0) / 2.0
        return 1.0 - ms_ssim(x - curr_image, y - curr_image, **self.kwargs)


# ---------------------------------------------------------------------------
# Other public extras
# ---------------------------------------------------------------------------


def tv_loss(img: jnp.ndarray, tv_weight: float) -> jnp.ndarray:
    """Total variation loss on NHWC images (``losses.py:91-108``)."""
    w_var = jnp.sum((img[:, :, :-1, :] - img[:, :, 1:, :]) ** 2)
    h_var = jnp.sum((img[:, :-1, :, :] - img[:, 1:, :, :]) ** 2)
    return tv_weight * (h_var + w_var)


class TotalVariationLoss:
    """Total variation loss (``losses.py:111-126``)."""

    def __init__(self, tv_weight: float = 1.0):
        self.tv_weight = tv_weight

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return tv_loss(x, self.tv_weight)


class GradientDifferenceLoss:
    """Gradient difference loss on NTHWC videos (``losses.py:129-155``).

    The reference's elementwise ``t1 + t2`` cannot broadcast (the two terms
    have incompatible shapes ``(..., H-1, W)`` / ``(..., H, W-1)``) — it
    raises on any real input; here each term is mean-reduced first, giving
    the intended scalar GDL.
    """

    def __init__(self, alpha: Union[int, float] = 2):
        self.alpha = alpha

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        t1 = jnp.abs(
            jnp.abs(x[:, :, 1:, :, :] - x[:, :, :-1, :, :])
            - jnp.abs(y[:, :, 1:, :, :] - y[:, :, :-1, :, :])
        ) ** self.alpha
        t2 = jnp.abs(
            jnp.abs(x[:, :, :, 1:, :] - x[:, :, :, :-1, :])
            - jnp.abs(y[:, :, :, 1:, :] - y[:, :, :, :-1, :])
        ) ** self.alpha
        return jnp.mean(t1) + jnp.mean(t2)


class FocalLoss:
    """Focal cross-entropy (``losses.py:209-304``).

    Args follow the reference: ``logit`` is ``(B, num_class, ...)``
    probabilities (after ``apply_nonlin`` if given), ``target`` integer class
    ids.
    """

    def __init__(
        self,
        apply_nonlin: Optional[Callable] = None,
        alpha=None,
        gamma: float = 2.0,
        balance_index: int = 0,
        smooth: float = 1e-5,
        size_average: bool = True,
    ):
        if smooth is not None and (smooth < 0 or smooth > 1.0):
            raise ValueError("smooth value should be in [0,1]")
        self.apply_nonlin = apply_nonlin
        self.alpha = alpha
        self.gamma = gamma
        self.balance_index = balance_index
        self.smooth = smooth
        self.size_average = size_average

    def __call__(self, logit: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if self.apply_nonlin is not None:
            logit = self.apply_nonlin(logit)
        num_class = logit.shape[1]

        if logit.ndim > 2:  # (B, C, d1, d2, ...) -> (B*m, C)
            logit = logit.reshape(logit.shape[0], num_class, -1)
            logit = jnp.transpose(logit, (0, 2, 1)).reshape(-1, num_class)
        target = jnp.reshape(target, (-1,)).astype(jnp.int32)

        alpha = self.alpha
        if alpha is None:
            alpha = jnp.ones((num_class,), jnp.float32)
        elif isinstance(alpha, (list, tuple)) or (
            hasattr(alpha, "__len__") and not isinstance(alpha, (int, float))
        ):
            alpha = jnp.asarray(alpha, jnp.float32)
            assert alpha.shape[0] == num_class
            alpha = alpha / jnp.sum(alpha)
        elif isinstance(alpha, float):
            a = jnp.full((num_class,), 1.0 - alpha, jnp.float32)
            alpha = a.at[self.balance_index].set(alpha)
        else:
            raise TypeError("Not support alpha type")

        one_hot = jax.nn.one_hot(target, num_class)
        if self.smooth:
            one_hot = jnp.clip(one_hot, self.smooth / (num_class - 1), 1.0 - self.smooth)
        pt = jnp.sum(one_hot * logit, axis=1) + self.smooth
        logpt = jnp.log(pt)
        a_t = alpha[target]
        loss = -a_t * (1.0 - pt) ** self.gamma * logpt
        return jnp.mean(loss) if self.size_average else jnp.sum(loss)


def get_loss(loss: Union[str, Callable] = "mse", **kwargs) -> Callable:
    """String → criterion factory (``losses.py:339-378``)."""
    if callable(loss):
        return loss
    assert loss in [
        "mse",
        "bce",
        "binary_crossentropy",
        "crossentropy",
        "focal",
        "ssim",
        "ms_ssim",
        "l1",
        "tv",
        "total_variation",
        "ssim_dynamic",
        "gdl",
        "gradient_difference_loss",
    ]
    if loss == "mse":
        return lambda x, y: jnp.mean((x - y) ** 2)
    if loss in ("bce", "binary_crossentropy", "crossentropy"):
        # torch F.nll_loss equivalent: mean negative log-likelihood of
        # log-probability inputs at integer targets.
        def nll(log_probs, target):
            target = target.astype(jnp.int32)
            return -jnp.mean(jnp.take_along_axis(log_probs, target[:, None], axis=1))

        return nll
    if loss == "focal":
        return FocalLoss()
    if loss == "ssim":
        return SSIMLoss(data_range=1.0, size_average=True, **kwargs)
    if loss == "ms_ssim":
        return MS_SSIMLoss(data_range=1.0, size_average=True, **kwargs)
    if loss == "ssim_dynamic":
        return SSIMLossDynamic(data_range=1.0, size_average=True, **kwargs)
    if loss == "l1":
        return lambda x, y: jnp.mean(jnp.abs(x - y))
    if loss in ("tv", "total_variation"):
        return TotalVariationLoss(tv_weight=kwargs.get("tv_weight", 1))
    if loss in ("gdl", "gradient_difference_loss"):
        return GradientDifferenceLoss(alpha=kwargs.get("alpha", 2))
    raise ValueError(f"loss {loss} not recognized")
