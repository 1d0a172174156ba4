"""Device ops: rolling k-mer codec and counting kernels."""

from .codec import encode_blocks, combine64, split64
from .count import count_unique, merge_weighted

__all__ = [
    "encode_blocks",
    "combine64",
    "split64",
    "count_unique",
    "merge_weighted",
]
