"""Input abstraction, format detection, sequence readers, and the host packer."""

from .format import SequenceFormat
from .input import Input
from .reader import (
    SequenceWithQuality,
    read_records,
    read_records_with_quality,
    stream_input_chunks,
)
from .mmapfile import MmapFasta
from .packer import PackedBatch, pack_buffer, blockize

__all__ = [
    "Input",
    "MmapFasta",
    "SequenceFormat",
    "SequenceWithQuality",
    "read_records",
    "read_records_with_quality",
    "stream_input_chunks",
    "PackedBatch",
    "pack_buffer",
    "blockize",
]
