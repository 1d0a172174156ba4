"""Binary .kmix k-mer index: save, load, query (reference: src/index.rs).

Byte-exact with the reference's format version 1 so indexes are portable in
both directions (reference: src/index.rs:7-29):

    +--------+--------+------+--------+------------------+--------+
    | MAGIC  | VERSION|  K   | COUNT  |      DATA        | CRC32  |
    | 4 bytes| 1 byte |1 byte| 8 bytes| 16 bytes x COUNT | 4 bytes|
    +--------+--------+------+--------+------------------+--------+

    MAGIC   "KMIX"; VERSION 1; K in 1..=32; COUNT little-endian u64;
    DATA    (packed: u64 LE, count: u64 LE) pairs;
    CRC32   IEEE (poly 0xEDB88320) over all preceding bytes, little-endian.

``.gz`` paths are gzip-compressed/decompressed transparently, selected purely
by extension (reference: src/index.rs:465-469). Entries are written sorted by
packed key for determinism; the reference accepts any order on load.
"""

from __future__ import annotations

import gzip
import os
import struct
import zlib

import numpy as np

from .errors import IndexReadError, IndexWriteError, InvalidIndexError
from .io.format import is_gzip_path
from .kmer import KmerLength

MAGIC = b"KMIX"
VERSION = 1
_HEADER = struct.Struct("<4sBBQ")  # magic, version, k, count
_MIN_SIZE = 18  # header (14) + crc (4)


class KmerIndex:
    """Packed canonical k-mer -> count mapping (reference: src/index.rs:68-133)."""

    def __init__(self, k: KmerLength | int, counts: dict[int, int]):
        self._k = k if isinstance(k, KmerLength) else KmerLength(k)
        self._counts = counts

    @property
    def k(self) -> KmerLength:
        return self._k

    @property
    def counts(self) -> dict[int, int]:
        return self._counts

    def __len__(self) -> int:
        return len(self._counts)

    def is_empty(self) -> bool:
        return not self._counts

    def get(self, packed_bits: int) -> int | None:
        """Look up a canonical packed k-mer; None when absent."""
        return self._counts.get(packed_bits)

    def to_string_counts(self) -> dict[str, int]:
        from .kmer import unpack_many

        codes = np.fromiter(self._counts.keys(), dtype=np.uint64, count=len(self._counts))
        strings = unpack_many(codes, self._k)
        return dict(zip(strings, self._counts.values()))


def serialize_index(index: KmerIndex) -> bytes:
    """Serialize to the raw (uncompressed) byte format."""
    n = len(index.counts)
    body = bytearray(_HEADER.size + 16 * n + 4)
    _HEADER.pack_into(body, 0, MAGIC, VERSION, index.k.get(), n)
    if n:
        pairs = np.empty((n, 2), dtype="<u8")
        pairs[:, 0] = np.fromiter(index.counts.keys(), dtype=np.uint64, count=n)
        pairs[:, 1] = np.fromiter(index.counts.values(), dtype=np.uint64, count=n)
        order = np.argsort(pairs[:, 0], kind="stable")
        pairs = pairs[order]
        body[_HEADER.size : _HEADER.size + 16 * n] = pairs.tobytes()
    crc = zlib.crc32(bytes(body[:-4])) & 0xFFFFFFFF
    struct.pack_into("<I", body, len(body) - 4, crc)
    return bytes(body)


def deserialize_index(data: bytes, path: str | None = None) -> KmerIndex:
    """Parse and validate raw index bytes (reference: src/index.rs:282-401).

    Validation order matches the reference: size, magic, CRC, version, k,
    count, data size.
    """
    if len(data) < _MIN_SIZE:
        raise InvalidIndexError("file too small", path)
    if data[:4] != MAGIC:
        raise InvalidIndexError("bad magic bytes (not a .kmix index)", path)
    (stored_crc,) = struct.unpack_from("<I", data, len(data) - 4)
    actual_crc = zlib.crc32(data[:-4]) & 0xFFFFFFFF
    if stored_crc != actual_crc:
        raise InvalidIndexError(
            f"CRC32 mismatch (stored {stored_crc:#010x}, computed {actual_crc:#010x})",
            path,
        )
    _, version, k_raw, count = _HEADER.unpack_from(data, 0)
    if version != VERSION:
        raise InvalidIndexError(f"unsupported version {version}", path)
    try:
        k = KmerLength(k_raw)
    except Exception:
        raise InvalidIndexError(f"invalid k={k_raw}", path) from None
    expect = _HEADER.size + 16 * count + 4
    if len(data) != expect:
        raise InvalidIndexError(
            f"size mismatch: {len(data)} bytes, expected {expect} for {count} entries",
            path,
        )
    if count:
        pairs = np.frombuffer(
            data, dtype="<u8", count=2 * count, offset=_HEADER.size
        ).reshape(count, 2)
        counts = dict(zip(pairs[:, 0].tolist(), pairs[:, 1].tolist()))
    else:
        counts = {}
    return KmerIndex(k, counts)


def save_index(index: KmerIndex, path: str | os.PathLike) -> None:
    """Write an index to disk, gzip-compressing for ``.gz`` paths
    (reference: src/index.rs:156-176)."""
    raw = serialize_index(index)
    try:
        if is_gzip_path(path):
            with gzip.open(path, "wb") as f:
                f.write(raw)
        else:
            with open(path, "wb") as f:
                f.write(raw)
    except OSError as e:
        raise IndexWriteError(f"failed to write index {path}: {e}") from e


def load_index(path: str | os.PathLike) -> KmerIndex:
    """Read an index from disk (reference: src/index.rs:199-219)."""
    try:
        if is_gzip_path(path):
            with gzip.open(path, "rb") as f:
                data = f.read()
        else:
            with open(path, "rb") as f:
                data = f.read()
    except (OSError, EOFError) as e:
        # EOFError: truncated gzip stream (not an OSError subclass)
        raise IndexReadError(f"failed to read index {path}: {e}") from e
    return deserialize_index(data, str(path))
