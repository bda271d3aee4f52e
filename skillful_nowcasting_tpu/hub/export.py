"""Export our variables to reference-compatible torch checkpoints.

The inverse of :mod:`.convert`: produces a state dict with the exact key
schema of the reference models (spectral-norm parametrization keys, OIHW
kernels, ``num_batches_tracked`` buffers, and — for DGMR — the duplicated
``generator.*`` aliases torch emits for its shared submodules,
``/root/reference/dgmr/dgmr.py:108-123``).  Written as ``model.safetensors``
(+ ``config.json``), loadable by the reference's ``PyTorchModelHubMixin``
``from_pretrained`` / ``load_state_dict(strict=True)``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping, Optional

import numpy as np

from .serialization import CONFIG_NAME, np_tree


def _invert_weight(w: np.ndarray) -> np.ndarray:
    if w.ndim == 4:  # HWIO -> OIHW
        return np.transpose(w, (3, 2, 0, 1))
    if w.ndim == 5:  # DHWIO -> OIDHW
        return np.transpose(w, (4, 3, 0, 1, 2))
    if w.ndim == 2:  # (in, out) -> (out, in)
        return np.transpose(w, (1, 0))
    return w


def _walk(tree: Mapping[str, Any], prefix: str = ""):
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, Mapping):
            yield from _walk(v, path)
        else:
            yield path, v


def export_torch_state_dict(
    variables: Mapping[str, Any], *, duplicate_generator: bool = False
) -> Dict[str, np.ndarray]:
    """Convert {params, batch_stats, spectral} trees to a torch state dict."""
    variables = np_tree(variables)
    params = variables.get("params", {})
    batch_stats = variables.get("batch_stats", {})
    spectral = variables.get("spectral", {})

    spectral_paths = {path.rsplit(".", 1)[0] for path, _ in _walk(spectral)}
    bn_stats: Dict[str, Dict[str, np.ndarray]] = {}
    for path, value in _walk(batch_stats):
        mod, leaf = path.rsplit(".", 1)
        bn_stats.setdefault(mod, {})[leaf] = value

    out: Dict[str, np.ndarray] = {}
    for path, value in _walk(params):
        mod, leaf = path.rsplit(".", 1)
        if leaf == "kernel":
            w = _invert_weight(np.asarray(value, np.float32))
            if mod in spectral_paths:
                out[f"{mod}.parametrizations.weight.original"] = w
            else:
                out[f"{mod}.weight"] = w
        elif leaf == "scale":  # BatchNorm
            out[f"{mod}.weight"] = np.asarray(value, np.float32)
        elif leaf in ("bias", "gamma"):
            out[f"{mod}.{leaf}"] = np.asarray(value, np.float32)
        else:
            raise ValueError(f"unexported param leaf: {path}")

    for mod, stats in bn_stats.items():
        out[f"{mod}.running_mean"] = np.asarray(stats["mean"], np.float32)
        out[f"{mod}.running_var"] = np.asarray(stats["var"], np.float32)
        out[f"{mod}.num_batches_tracked"] = np.asarray(0, np.int64)

    for path, value in _walk(spectral):
        mod = path.rsplit(".", 1)[0]  # strip the trailing ".uv"
        u, v = value
        out[f"{mod}.parametrizations.weight.0._u"] = np.asarray(u, np.float32)
        out[f"{mod}.parametrizations.weight.0._v"] = np.asarray(v, np.float32)

    if duplicate_generator:
        dup = {}
        for key, value in out.items():
            root = key.split(".", 1)[0]
            if root in ("conditioning_stack", "latent_stack", "sampler"):
                dup[f"generator.{key}"] = value
        out.update(dup)
    return out


def save_torch_checkpoint(
    path: str,
    variables: Mapping[str, Any],
    config: Optional[Dict[str, Any]] = None,
    *,
    duplicate_generator: bool = False,
) -> None:
    """Write ``model.safetensors`` (+ ``config.json``) readable by the reference."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    sd = export_torch_state_dict(variables, duplicate_generator=duplicate_generator)
    # safetensors forbids shared memory between entries: copy duplicated views.
    sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
    save_file(sd, os.path.join(path, "model.safetensors"))
    if config is not None:
        with open(os.path.join(path, CONFIG_NAME), "w") as f:
            json.dump(config, f, indent=2, sort_keys=True)
