"""Native checkpoint format: ``config.json`` + ``flax_model.msgpack``.

Mirrors the capability of the reference's ``PyTorchModelHubMixin``
(``/root/reference/dgmr/dgmr.py:36-42``, ``tests/test_model.py:341-399``):
every model class round-trips (config, weights) through a directory.  The
torch-side weight files (``pytorch_model.bin`` / ``model.safetensors``) are
read by :mod:`skillful_nowcasting_tpu.hub.pretrained` via
:mod:`skillful_nowcasting_tpu.hub.convert`.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping, Tuple

import numpy as np
from flax import serialization

CONFIG_NAME = "config.json"
FLAX_WEIGHTS_NAME = "flax_model.msgpack"


def _tuplify_spectral(tree: Any) -> Any:
    """Restore tuple leaves: serialization maps tuples to ``{"0": .., "1": ..}``."""
    if isinstance(tree, Mapping):
        if tree and all(isinstance(k, str) and k.isdigit() for k in tree):
            return tuple(
                _tuplify_spectral(tree[k]) for k in sorted(tree, key=int)
            )
        return {k: _tuplify_spectral(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return tuple(_tuplify_spectral(v) for v in tree)
    return tree


def save_checkpoint(path: str, config: Dict[str, Any], variables: Mapping[str, Any]) -> None:
    """Write config + all variable collections to ``path`` (a directory)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, CONFIG_NAME), "w") as f:
        json.dump(config, f, indent=2, sort_keys=True)
    host_vars = serialization.to_state_dict(
        np_tree(variables)  # device -> host before serializing
    )
    with open(os.path.join(path, FLAX_WEIGHTS_NAME), "wb") as f:
        f.write(serialization.msgpack_serialize(host_vars))


def np_tree(tree: Any) -> Any:
    if isinstance(tree, Mapping):
        return {k: np_tree(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return tuple(np_tree(v) for v in tree)
    return np.asarray(tree)


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Read (config, variables) from a native checkpoint directory."""
    with open(os.path.join(path, CONFIG_NAME)) as f:
        config = json.load(f)
    with open(os.path.join(path, FLAX_WEIGHTS_NAME), "rb") as f:
        variables = serialization.msgpack_restore(f.read())
    return config, _tuplify_spectral(variables)
