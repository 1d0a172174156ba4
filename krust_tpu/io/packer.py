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


@dataclass
class PackedBatch2:
    """Bit-packed device batch: 2-bit base codes + 1-bit invalid mask.

    Cuts host->device transfer to 0.375 bytes/base (vs 1 for raw codes, plus
    1 more for quality bytes): ``packed2`` holds 4 bases/byte (first base in
    the high 2 bits), ``badbits`` 8 validity flags/byte (bit 7 = first base;
    set = invalid). Quality filtering is folded into ``badbits`` on the host,
    so no quality bytes ever cross the link. The device unpacks both (cheap
    VPU work against ~free HBM bandwidth) before the rolling codec.
    """

    packed2: np.ndarray  # [B, ceil(width/4)] uint8
    badbits: np.ndarray  # [B, ceil(width/8)] uint8
    n_windows: int
    block_windows: int
    width: int  # unpacked row width = block_windows + k - 1


def pack_stream_2bit(
    codes: np.ndarray,
    qual: np.ndarray | None = None,
    quality_threshold: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Pack a flat code stream into (packed2, badbits) arrays (host, numpy)."""
    n = codes.shape[0]
    bad = codes >= INVALID_CODE
    if qual is not None and quality_threshold is not None:
        bad = bad | (qual < quality_threshold)
    b2 = codes & 3

    n4 = -(-max(n, 1) // 4) * 4
    if n4 != n:
        b2 = np.concatenate([b2, np.zeros(n4 - n, np.uint8)])
    q = b2.reshape(-1, 4).astype(np.uint8)
    packed2 = (q[:, 0] << 6) | (q[:, 1] << 4) | (q[:, 2] << 2) | q[:, 3]

    n8 = -(-max(n, 1) // 8) * 8
    if n8 != n:
        bad = np.concatenate([bad, np.ones(n8 - n, bool)])
    badbits = np.packbits(bad)
    return packed2, badbits


def pack_buffer_2bit(
    codes: np.ndarray,
    qual: np.ndarray | None,
    k: int,
    quality_threshold: int | None = None,
    block_windows: int = DEFAULT_BLOCK_WINDOWS,
    batch_rows: int | None = None,
    row_multiple: int = ROW_MULTIPLE,
):
    """Yield :class:`PackedBatch2` chunks covering the whole stream.

    ``block_windows`` must be a multiple of 8 so every row starts on both a
    4-base (packed2) and 8-base (badbits) boundary.
    """
    w = block_windows
    assert w % 8 == 0, "block_windows must be a multiple of 8"
    width = w + k - 1
    t = max(codes.shape[0] - k + 1, 0)
    n_blocks = -(-t // w) if t > 0 else 0

    packed2, badbits = pack_stream_2bit(codes, qual, quality_threshold)
    p4 = -(-width // 4)
    p8 = -(-width // 8)

    # pad packed streams so the last row's slices stay in bounds
    need4 = (max(n_blocks, 1) - 1) * (w // 4) + p4
    if packed2.shape[0] < need4:
        packed2 = np.concatenate(
            [packed2, np.zeros(need4 - packed2.shape[0], np.uint8)]
        )
    need8 = (max(n_blocks, 1) - 1) * (w // 8) + p8
    if badbits.shape[0] < need8:
        badbits = np.concatenate(
            [badbits, np.full(need8 - badbits.shape[0], 0xFF, np.uint8)]
        )

    step_rows = batch_rows if batch_rows is not None else max(n_blocks, 1)
    for row0 in range(0, max(n_blocks, 1), step_rows):
        rows = min(step_rows, max(n_blocks, 1) - row0)
        rows_padded = max(-(-rows // row_multiple) * row_multiple, row_multiple)
        v4 = np.lib.stride_tricks.sliding_window_view(packed2, p4)[:: w // 4]
        v8 = np.lib.stride_tricks.sliding_window_view(badbits, p8)[:: w // 8]
        out4 = np.zeros((rows_padded, p4), np.uint8)
        out8 = np.full((rows_padded, p8), 0xFF, np.uint8)
        if n_blocks > 0:
            out4[:rows] = v4[row0 : row0 + rows]
            out8[:rows] = v8[row0 : row0 + rows]
        covered = min((row0 + rows) * w, t) - row0 * w if t > 0 else 0
        yield PackedBatch2(out4, out8, max(covered, 0), w, width)


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
