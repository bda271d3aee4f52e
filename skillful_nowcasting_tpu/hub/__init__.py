"""Serialization / hub subsystem (reference capability: PyTorchModelHubMixin)."""

from .convert import convert_torch_state_dict, merge_into_variables
from .pretrained import (
    BoundModel,
    HubMixin,
    abstract_variables,
    build_module,
    compose_generator,
    from_pretrained,
)
from .export import export_torch_state_dict, save_torch_checkpoint
from .lightning import (
    convert_lightning_checkpoint,
    load_lightning_checkpoint,
    train_state_from_lightning,
)
from .serialization import load_checkpoint, save_checkpoint

__all__ = [
    "convert_lightning_checkpoint",
    "load_lightning_checkpoint",
    "train_state_from_lightning",
    "BoundModel",
    "HubMixin",
    "build_module",
    "compose_generator",
    "convert_torch_state_dict",
    "export_torch_state_dict",
    "from_pretrained",
    "save_torch_checkpoint",
    "load_checkpoint",
    "merge_into_variables",
    "save_checkpoint",
]
