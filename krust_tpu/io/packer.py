"""Host packer: flat code streams -> dense haloed block tensors for the device.

The device codec consumes fixed-shape int8 tensors. Given the flat
separator-delimited code stream from the reader, this module chops it into
``B`` rows of ``W + k - 1`` codes, where consecutive rows overlap by ``k - 1``
codes (the halo) so every length-k window of the stream appears in exactly one
row. Padding rows/tails are filled with INVALID_CODE so their windows are
masked out by construction — the TPU analog of the reference's per-record
window scan restarting after an invalid base (reference: src/run.rs:526-563,
src/streaming.rs:622-660).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..kmer import INVALID_CODE

#: Windows per block row. The last dim the device sees is W + k - 1; keep W a
#: multiple of 256 so both it and typical padded widths align to TPU lanes.
DEFAULT_BLOCK_WINDOWS = 4096

#: Row-count multiple for padding (int8 sublane tiling wants 32-row multiples).
ROW_MULTIPLE = 8


@dataclass
class PackedBatch:
    """One device-ready batch.

    ``codes``: [B, W + k - 1] uint8 in 0..4 (4 = invalid/separator/pad).
    ``qual``: same shape uint8 Phred+33 bytes (0xFF where not applicable), or
    None when no quality filtering is active.
    ``n_windows``: number of *real* stream windows covered (<= B * W); rows
    beyond the stream are pure padding.
    """

    codes: np.ndarray
    qual: np.ndarray | None
    n_windows: int
    block_windows: int


def _halo_view(stream: np.ndarray, k: int, w: int, n_blocks: int, fill: int) -> np.ndarray:
    """Return [n_blocks, w + k - 1] rows, row i starting at stream offset i*w,
    padded with ``fill``."""
    width = w + k - 1
    need = (n_blocks - 1) * w + width if n_blocks > 0 else 0
    if stream.shape[0] < need:
        stream = np.concatenate(
            [stream, np.full(need - stream.shape[0], fill, dtype=np.uint8)]
        )
    if n_blocks == 0:
        return np.zeros((0, width), dtype=np.uint8)
    view = np.lib.stride_tricks.sliding_window_view(stream, width)[:: w][:n_blocks]
    return np.ascontiguousarray(view)


def blockize(
    codes: np.ndarray,
    qual: np.ndarray | None,
    k: int,
    block_windows: int = DEFAULT_BLOCK_WINDOWS,
    row_multiple: int = ROW_MULTIPLE,
    min_rows: int | None = None,
) -> PackedBatch:
    """Chop a flat code stream into a haloed block tensor.

    The stream has T = len(codes) - k + 1 windows (0 if shorter than k).
    Every window lands in exactly one row: row i covers windows
    [i*W, (i+1)*W). Rows are padded up to a multiple of ``row_multiple``
    (and at least ``min_rows`` when given, for sharding) with invalid codes.
    """
    w = block_windows
    t = max(codes.shape[0] - k + 1, 0)
    n_blocks = -(-t // w) if t > 0 else 0
    rows = n_blocks
    if min_rows is not None:
        rows = max(rows, min_rows)
    rows = max(-(-rows // row_multiple) * row_multiple, row_multiple)
    width = w + k - 1

    out_codes = np.full((rows, width), INVALID_CODE, dtype=np.uint8)
    if n_blocks > 0:
        out_codes[:n_blocks] = _halo_view(codes, k, w, n_blocks, INVALID_CODE)

    out_qual = None
    if qual is not None:
        out_qual = np.full((rows, width), 0xFF, dtype=np.uint8)
        if n_blocks > 0:
            out_qual[:n_blocks] = _halo_view(qual, k, w, n_blocks, 0xFF)

    return PackedBatch(out_codes, out_qual, t, w)


def pack_buffer(
    codes: np.ndarray,
    qual: np.ndarray | None,
    k: int,
    block_windows: int = DEFAULT_BLOCK_WINDOWS,
    batch_rows: int | None = None,
):
    """Yield :class:`PackedBatch` chunks covering the whole stream.

    ``batch_rows`` bounds rows per batch (memory control for inputs larger
    than HBM); the stream is split at row boundaries, re-haloed so no window
    is lost or duplicated.
    """
    w = block_windows
    t = max(codes.shape[0] - k + 1, 0)
    if t == 0:
        yield blockize(codes, qual, k, w)
        return
    n_blocks = -(-t // w)
    if batch_rows is None or n_blocks <= batch_rows:
        yield blockize(codes, qual, k, w)
        return
    for row0 in range(0, n_blocks, batch_rows):
        start = row0 * w
        end = min((row0 + batch_rows) * w, t) + k - 1
        yield blockize(
            codes[start:end],
            None if qual is None else qual[start:end],
            k,
            w,
        )
