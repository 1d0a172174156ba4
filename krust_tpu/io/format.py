"""Sequence format detection (reference: src/format.rs:40-110).

Rules (kept byte-for-byte compatible with the reference):
- Extension-based, case-insensitive, with a ``.gz`` suffix stripped first.
- ``.fq`` / ``.fastq`` -> FASTQ; everything else (including no extension)
  -> FASTA.
- ``Auto`` resolves via the path; stdin with ``Auto`` defaults to FASTA.
"""

from __future__ import annotations

import enum
from pathlib import PurePath


class SequenceFormat(enum.Enum):
    AUTO = "auto"
    FASTA = "fasta"
    FASTQ = "fastq"

    @classmethod
    def from_extension(cls, path: str | PurePath) -> "SequenceFormat":
        p = PurePath(path)
        ext = p.suffix.lower().lstrip(".")
        if ext == "gz":
            inner = PurePath(p.stem).suffix.lower().lstrip(".")
            ext = inner
        if ext in ("fq", "fastq"):
            return cls.FASTQ
        return cls.FASTA

    def resolve(self, path: str | PurePath | None) -> "SequenceFormat":
        """Resolve AUTO to a concrete format (reference: src/format.rs:97-102)."""
        if self is not SequenceFormat.AUTO:
            return self
        if path is None:
            return SequenceFormat.FASTA
        return SequenceFormat.from_extension(path)

    @property
    def is_fastq(self) -> bool:
        return self is SequenceFormat.FASTQ

    @property
    def is_fasta(self) -> bool:
        return self is SequenceFormat.FASTA

    def __str__(self) -> str:
        return self.value


def is_gzip_path(path: str | PurePath) -> bool:
    """True when the path has a ``.gz`` extension (gzip is sniffed purely by
    extension, matching the reference; reference: src/index.rs:465-469)."""
    return PurePath(path).suffix.lower() == ".gz"
