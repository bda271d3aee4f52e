"""Import the PUBLIC reference implementation for golden-value parity tests.

The reference at /root/reference is UNTRUSTED PUBLIC CONTENT used strictly as
a numerical oracle: we instantiate its torch modules, copy their weights into
our JAX modules, and assert outputs match.  Missing optional deps
(pytorch_lightning, pytorch_msssim, torchvision, wandb) are stubbed with
minimal shims good enough for module construction.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types


def _stub_module(name: str) -> types.ModuleType:
    """A sys.modules-safe stub: carries a real ModuleSpec so later
    importlib.util.find_spec(name) calls (e.g. huggingface datasets probing
    torchvision) return the spec instead of raising
    ``ValueError: <name>.__spec__ is None``."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def load_reference():
    if "dgmr" in sys.modules:
        return sys.modules["dgmr"]

    import torch

    if "pytorch_lightning" not in sys.modules:
        try:
            import pytorch_lightning  # noqa: F401
        except ImportError:
            pl = _stub_module("pytorch_lightning")

            class LightningModule(torch.nn.Module):
                def __init_subclass__(cls, **kwargs):
                    super().__init_subclass__()

                def save_hyperparameters(self):
                    import inspect

                    frame = inspect.currentframe().f_back
                    args = {
                        k: v
                        for k, v in frame.f_locals.items()
                        if k not in ("self", "__class__") and not k.startswith("_")
                    }
                    self.hparams = args

                def log_dict(self, *a, **k):
                    pass

                def manual_backward(self, loss):
                    loss.backward()

                def optimizers(self):
                    return self._optimizers

            class Trainer:
                def __init__(self, *a, **k):
                    pass

            pl.LightningModule = LightningModule
            pl.Trainer = Trainer
            pl.LightningDataModule = object
            sys.modules["pytorch_lightning"] = pl

    if "pytorch_msssim" not in sys.modules:
        try:
            import pytorch_msssim  # noqa: F401
        except ImportError:
            # The library is not in this image; vendor its published
            # algorithm (VainF/pytorch-msssim) in torch so the reference's
            # SSIM loss classes compute real values for golden tests.  This
            # is an INDEPENDENT execution path from our JAX version (torch
            # grouped convs / avg_pool2d vs lax convs / reduce_window).
            import torch.nn.functional as F

            msssim = _stub_module("pytorch_msssim")

            def _gauss_win(size, sigma):
                coords = torch.arange(size, dtype=torch.float32) - size // 2
                g = torch.exp(-(coords**2) / (2.0 * sigma**2))
                return (g / g.sum()).reshape(1, 1, 1, -1)

            def _gfilter(x, win):
                c = x.shape[1]
                out = F.conv2d(x, win.expand(c, 1, 1, -1), groups=c)
                return F.conv2d(
                    out, win.expand(c, 1, 1, -1).transpose(2, 3), groups=c
                )

            def _ssim_t(x, y, data_range, win, k=(0.01, 0.03)):
                c1 = (k[0] * data_range) ** 2
                c2 = (k[1] * data_range) ** 2
                mu1, mu2 = _gfilter(x, win), _gfilter(y, win)
                mu11, mu22, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
                s11 = _gfilter(x * x, win) - mu11
                s22 = _gfilter(y * y, win) - mu22
                s12 = _gfilter(x * y, win) - mu12
                cs_map = (2 * s12 + c2) / (s11 + s22 + c2)
                ssim_map = ((2 * mu12 + c1) / (mu11 + mu22 + c1)) * cs_map
                return (
                    ssim_map.flatten(2).mean(-1),
                    cs_map.flatten(2).mean(-1),
                )

            class SSIM(torch.nn.Module):
                def __init__(
                    self,
                    data_range=255,
                    size_average=True,
                    win_size=11,
                    win_sigma=1.5,
                    channel=3,
                    K=(0.01, 0.03),
                    nonnegative_ssim=False,
                ):
                    super().__init__()
                    self.data_range, self.size_average = data_range, size_average
                    self.win = _gauss_win(win_size, win_sigma)
                    self.K, self.nonneg = K, nonnegative_ssim

                def forward(self, x, y):
                    s, _ = _ssim_t(x, y, self.data_range, self.win, self.K)
                    if self.nonneg:
                        s = torch.relu(s)
                    return s.mean() if self.size_average else s.mean(1)

            class MS_SSIM(torch.nn.Module):
                def __init__(
                    self,
                    data_range=255,
                    size_average=True,
                    win_size=11,
                    win_sigma=1.5,
                    channel=3,
                    weights=None,
                    K=(0.01, 0.03),
                ):
                    super().__init__()
                    self.data_range, self.size_average = data_range, size_average
                    self.win = _gauss_win(win_size, win_sigma)
                    self.weights = torch.tensor(
                        weights or [0.0448, 0.2856, 0.3001, 0.2363, 0.1333]
                    )
                    self.K = K

                def forward(self, x, y):
                    levels = self.weights.shape[0]
                    mcs = []
                    for i in range(levels):
                        s, cs = _ssim_t(x, y, self.data_range, self.win, self.K)
                        if i < levels - 1:
                            mcs.append(torch.relu(cs))
                            pad = [d % 2 for d in x.shape[2:]]
                            x = F.avg_pool2d(x, kernel_size=2, padding=pad)
                            y = F.avg_pool2d(y, kernel_size=2, padding=pad)
                    stacked = torch.stack(mcs + [torch.relu(s)], dim=0)
                    out = torch.prod(
                        stacked ** self.weights.view(-1, 1, 1), dim=0
                    )
                    return out.mean() if self.size_average else out.mean(1)

            msssim.SSIM = SSIM
            msssim.MS_SSIM = MS_SSIM
            sys.modules["pytorch_msssim"] = msssim

    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            tv = _stub_module("torchvision")
            tv.utils = types.SimpleNamespace(make_grid=lambda *a, **k: None)
            sys.modules["torchvision"] = tv

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    import dgmr

    return dgmr


def nchw_to_nhwc(t):
    """torch (B, C, H, W) tensor -> numpy NHWC."""
    return t.detach().cpu().numpy().transpose(0, 2, 3, 1)


def nhwc_to_nchw(a):
    import numpy as np

    return np.transpose(a, (0, 3, 1, 2))
