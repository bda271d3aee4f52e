"""TPU-native op library: convs, norms, pooling, pixel shuffles, attention."""

from .attention import attention_fixed, attention_torch_compat
from .conv import Conv, Dense
from .norm import TorchBatchNorm
from .pixel import depth_to_space, space_to_depth
from .pool import avg_pool
from .resize import upsample_nearest_2x

__all__ = [
    "Conv",
    "Dense",
    "TorchBatchNorm",
    "attention_fixed",
    "attention_torch_compat",
    "avg_pool",
    "depth_to_space",
    "space_to_depth",
    "upsample_nearest_2x",
]
