"""Distributed layer: device meshes, data-parallel GAN step, multi-host init.

The reference has no in-repo distributed code — DP came implicitly from
PyTorch-Lightning DDP (``/root/reference/train/run.py:227-234``, SURVEY.md
§2.8).  Here the mesh/sharding module is a first-class component: one
``jax.sharding.Mesh``, batches sharded over the ``"data"`` axis, parameters
replicated, and gradient all-reduce inserted by XLA over ICI/DCN.
"""

from .mesh import batch_sharding, init_distributed, make_mesh, replicated_sharding
from .dp import make_dp_eval_step, make_dp_generate, make_dp_train_step, shard_batch
from .spatial import halo_conv2d, halo_exchange, make_spatial_conv, make_spatial_forward

__all__ = [
    "batch_sharding",
    "halo_conv2d",
    "halo_exchange",
    "init_distributed",
    "make_spatial_conv",
    "make_spatial_forward",
    "make_dp_eval_step",
    "make_dp_generate",
    "make_dp_train_step",
    "make_mesh",
    "replicated_sharding",
    "shard_batch",
]
