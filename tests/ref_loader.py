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
            msssim = _stub_module("pytorch_msssim")

            class _Unavailable(torch.nn.Module):
                def __init__(self, **kwargs):
                    super().__init__()

                def forward(self, *a, **k):
                    raise NotImplementedError("pytorch_msssim stub")

            msssim.SSIM = _Unavailable
            msssim.MS_SSIM = _Unavailable
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
