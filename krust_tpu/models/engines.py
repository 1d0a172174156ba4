"""Counting engines.

Three interchangeable engines produce identical results (a determinism
contract tested in tests/test_flat.py and tests/test_sharded.py):

- :class:`BatchEngine` — the TPU path. 2-bit stream slices transfer in
  fixed-shape batches; a jitted step runs the rolling codec
  (:mod:`krust_tpu.ops.codec` / Pallas) and emits raw sentinel-keyed
  windows into the epoch-sort table (:class:`krust_tpu.ops.table.
  EpochTable`: one flat XLA sort per epoch + the fused RLE/compaction
  kernel in :mod:`krust_tpu.ops.pallas_rle`). Replaces the reference's
  rayon + dashmap engine (reference: src/run.rs:489-583).
- :class:`NumpyEngine` — the same algorithm in pure numpy uint64 on host.
  Fallback when no accelerator is usable, and the differential oracle.
- :class:`SequentialEngine` — record-at-a-time counting (numpy per record),
  mirroring the reference's single-threaded paths
  (reference: src/streaming.rs:665-830).

All engines consume :class:`~krust_tpu.io.reader.ParsedStreams` and return
:class:`PackedCounts`.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Callable

import jax
import numpy as np

from ..io.packer import PackedBatch
from ..io.reader import ParsedStreams
from ..kmer import INVALID_CODE, unpack_many
from ..utils.config import EngineConfig
from ..utils.progress import Progress, ProgressTracker
from ..utils.tracing import span, trace_event

ProgressCallback = Callable[[Progress], None]


@dataclass
class PackedCounts:
    """Final counting result: sorted distinct canonical codes and counts.

    ``codes``/``counts`` are uint64 numpy arrays sorted by code. Counts use
    u64 accumulation; saturation at u64::MAX matches the reference contract
    (reference: src/run.rs:569) though it is unreachable for physical inputs.
    """

    k: int
    codes: np.ndarray
    counts: np.ndarray

    @property
    def distinct(self) -> int:
        return int(self.codes.shape[0])

    @property
    def total(self) -> int:
        return int(self.counts.sum())

    def to_packed_dict(self) -> dict[int, int]:
        return dict(zip(self.codes.tolist(), self.counts.tolist()))

    def to_string_dict(self) -> dict[str, int]:
        strings = unpack_many(self.codes, self.k)
        return dict(zip(strings, self.counts.tolist()))

    def get(self, packed: int) -> int:
        i = np.searchsorted(self.codes, np.uint64(packed))
        if i < self.codes.shape[0] and self.codes[i] == np.uint64(packed):
            return int(self.counts[i])
        return 0

    @classmethod
    def empty(cls, k: int) -> "PackedCounts":
        return cls(k, np.zeros(0, np.uint64), np.zeros(0, np.uint64))


class _HostAccumulator:
    """Merges per-batch (codes, counts) partials into one sorted table.

    Compacts lazily: partials concatenate until ``threshold`` entries, then a
    sort-merge collapses duplicates — amortized O(n log n) host work that
    overlaps with device compute of subsequent batches.
    """

    def __init__(self, threshold: int = 64_000_000):
        self._codes: list[np.ndarray] = []
        self._counts: list[np.ndarray] = []
        self._pending = 0
        self._threshold = threshold

    def add(self, codes: np.ndarray, counts: np.ndarray) -> None:
        if codes.shape[0] == 0:
            return
        self._codes.append(np.asarray(codes, np.uint64))
        self._counts.append(np.asarray(counts, np.uint64))
        self._pending += codes.shape[0]
        if self._pending > self._threshold:
            self._compact()

    def _compact(self) -> None:
        merged = _merge_partials(self._codes, self._counts)
        self._codes = [merged[0]]
        self._counts = [merged[1]]
        self._pending = merged[0].shape[0]

    def result(self) -> tuple[np.ndarray, np.ndarray]:
        self._compact()
        return self._codes[0], self._counts[0]


def _merge_partials(
    codes_list: list[np.ndarray], counts_list: list[np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    if not codes_list:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint64)
    codes = np.concatenate(codes_list)
    counts = np.concatenate(counts_list)
    uniq, inverse = np.unique(codes, return_inverse=True)
    sums = np.zeros(uniq.shape[0], dtype=np.uint64)
    np.add.at(sums, inverse, counts)
    return uniq, sums


def _quality_threshold(min_quality: int | None) -> int | None:
    """Phred threshold -> ASCII threshold, saturating (reference: src/run.rs:538)."""
    if min_quality is None:
        return None
    return min(min_quality + 33, 255)


class _ProgressPacer:
    """Apportions stream-level progress across device batches.

    The reference fires its callback after every sequence from worker
    threads (reference: src/run.rs:586-654); the device engine's unit of
    work is a window batch, so the callback fires once per batch with
    record/base totals apportioned by window fraction, then trued up to the
    exact totals when the stream is done. Same Progress payload, monotonic,
    batch cadence.
    """

    def __init__(
        self,
        tracker: ProgressTracker | None,
        callback: ProgressCallback | None,
        n_records: int,
        n_bases: int,
        total_windows: int,
    ):
        self._tracker = tracker
        self._callback = callback
        self._n_records = n_records
        self._n_bases = n_bases
        self._total = max(total_windows, 1)
        self._done_windows = 0
        self._rec_sent = 0
        self._base_sent = 0

    def step(self, windows: int) -> None:
        """Record one processed batch covering ``windows`` real windows."""
        if self._tracker is None:
            return
        self._done_windows = min(self._done_windows + windows, self._total)
        frac = self._done_windows / self._total
        rec = min(int(frac * self._n_records), self._n_records)
        base = min(int(frac * self._n_bases), self._n_bases)
        self._tracker.record_batch(rec - self._rec_sent, base - self._base_sent)
        self._rec_sent, self._base_sent = rec, base
        if self._callback is not None:
            self._callback(self._tracker.snapshot())

    def finish(self) -> None:
        """True up to the exact stream totals (always fires once)."""
        if self._tracker is None:
            return
        self._tracker.record_batch(
            self._n_records - self._rec_sent, self._n_bases - self._base_sent
        )
        self._rec_sent = self._n_records
        self._base_sent = self._n_bases
        if self._callback is not None:
            self._callback(self._tracker.snapshot())


# --- numpy host engine -----------------------------------------------------------


def count_stream_numpy(
    codes: np.ndarray,
    qual: np.ndarray | None,
    k: int,
    quality_threshold: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Rolling canonical encode + count on host in uint64.

    Same semantics as the device codec (see ops/codec.py docstring); numpy
    has native 64-bit lanes so no hi/lo split is needed.
    """
    t = codes.shape[0] - k + 1
    if t <= 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint64)
    good = codes < INVALID_CODE
    if qual is not None and quality_threshold is not None:
        good = good & (qual >= quality_threshold)
    b = np.where(good, codes, 0).astype(np.uint64)
    comp = np.where(good, 3 - codes.astype(np.int64), 0).astype(np.uint64)

    fwd = np.zeros(t, np.uint64)
    rc = np.zeros(t, np.uint64)
    valid = np.ones(t, bool)
    for j in range(k):
        fwd = (fwd << np.uint64(2)) | b[j : j + t]
        rc = (rc << np.uint64(2)) | comp[k - 1 - j : k - 1 - j + t]
        valid &= good[j : j + t]
    canon = np.minimum(fwd, rc)
    return np.unique(canon[valid], return_counts=True)


def count_stream_host(
    codes: np.ndarray,
    qual: np.ndarray | None,
    k: int,
    quality_threshold: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Best host path: native C++ rolling+sort core, numpy fallback.

    The native core (io/native/krust_native.cpp krust_count_stream) is the
    sort-based host twin of the TPU engine — ~50x the pure-numpy path on a
    single core — used when no accelerator is available.
    """
    from ..io import native as _native

    res = _native.count_stream_native(codes, qual, quality_threshold, k)
    if res is not None:
        return res
    return count_stream_numpy(codes, qual, k, quality_threshold)


class NumpyEngine:
    """Pure-host engine; exact, no accelerator required.

    Stays pure numpy on purpose: it is the mid-level oracle of the 3-way
    differential (device / numpy / brute-force, SURVEY.md §4). The fast
    host path for production fallback is :class:`NativeEngine`.
    """

    def __init__(self, config: EngineConfig | None = None):
        self.config = config or EngineConfig()

    def count(
        self,
        streams: ParsedStreams,
        k: int,
        min_quality: int | None = None,
        progress: ProgressCallback | None = None,
        tracker: ProgressTracker | None = None,
    ) -> PackedCounts:
        thr = _quality_threshold(min_quality) if streams.qual is not None else None
        with span("process_sequences", engine="numpy", k=k):
            uniq, cnt = count_stream_numpy(streams.codes, streams.qual, k, thr)
        if tracker is not None:
            tracker.record_batch(streams.n_records, streams.n_bases)
            if progress is not None:
                progress(tracker.snapshot())
        counts = cnt.astype(np.uint64)
        return PackedCounts(k, uniq, counts)


class NativeEngine:
    """Host engine on the native C++ counting core (numpy fallback).

    The no-accelerator production engine: rolling canonical encode + sort +
    RLE in one native call — the same sort-based design as the device
    engine, not the reference's hash map (reference: src/run.rs:489-583).
    """

    def __init__(self, config: EngineConfig | None = None):
        self.config = config or EngineConfig()

    def count(
        self,
        streams: ParsedStreams,
        k: int,
        min_quality: int | None = None,
        progress: ProgressCallback | None = None,
        tracker: ProgressTracker | None = None,
    ) -> PackedCounts:
        thr = _quality_threshold(min_quality) if streams.qual is not None else None
        with span("process_sequences", engine="native", k=k):
            uniq, cnt = count_stream_host(streams.codes, streams.qual, k, thr)
        if tracker is not None:
            tracker.record_batch(streams.n_records, streams.n_bases)
            if progress is not None:
                progress(tracker.snapshot())
        return PackedCounts(k, uniq, np.asarray(cnt, dtype=np.uint64))


# --- device batch engine ----------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "rows", "block_windows", "use_pallas", "mode", "fused", "interpret"
    ),
)
def _count_flat_step(
    packed2, invpos, covered, k, rows, block_windows, use_pallas, mode="raw",
    fused=False, interpret=False,
):
    """Flat-transfer batch step: the minimum-byte device pipeline.

    Unpacks a contiguous 2-bit stream slice, scatters invalid positions,
    blockizes with reshape/slice on device, runs the rolling codec, and masks
    windows at global index >= ``covered``. Output by ``mode``:

    - ``"raw"``: per-window (hi, lo, weight) with weight 1 for valid windows
      (DeviceTable: dedup happens in the LSM merge sorts).
    - ``"raw_sent"``: UNSORTED (hi, lo) with invalid windows as the
      (SENT, SENT) key — the EpochTable path; the epoch sort orders
      everything at once, so the batch step stays codec-only.

    ``fused=True`` (round 5, requires block_windows % 512 == 0) runs the
    single-kernel codec (:mod:`krust_tpu.ops.pallas_fused`): the packed
    bytes go straight into the kernel — no uint8 block tensor in HBM — and
    window validity is reconstructed OUTSIDE from the sparse invalid
    positions (scatter + log-step dilation + covered mask). Outputs are in
    the kernel's plane-separated window order; counting is order-
    insensitive, so no consumer cares. ``interpret`` is for CPU tests of
    the fused path only.
    """
    jnp = jax.numpy
    w = block_windows
    if fused:
        from ..ops.pallas_fused import HALO_BYTES, encode_packed_pallas

        w4 = w // 4
        need = (rows + 1) * w4
        n = packed2.shape[0]
        if n < need:
            packed2 = jnp.concatenate(
                [packed2, jnp.zeros(need - n, jnp.uint8)]
            )
        else:
            packed2 = packed2[:need]
        main = packed2[: rows * w4].reshape(rows, w4)
        halo = packed2[w4:].reshape(rows, w4)[:, :HALO_BYTES]
        # plane-separated global window index: column r*w4 + q is window
        # 4q + r, i.e. stream position row*w + 4q + r
        q4 = jnp.arange(w4, dtype=jnp.int32)
        offs = jnp.concatenate([4 * q4 + r for r in range(4)])
        idx = jnp.arange(rows, dtype=jnp.int32)[:, None] * w + offs[None, :]
        valid = idx < covered
        # window poisoning: window j is invalid iff any invalid base sits in
        # [j, j + k - 1] — scatter the sparse positions, then OR-dilate to
        # window coverage in log2(k) shifted passes
        nbad = rows * w + k - 1
        bad = jnp.zeros(nbad, jnp.bool_).at[invpos].set(True, mode="drop")
        c = 1
        while c < k:
            s = min(c, k - c)
            bad = bad | jnp.concatenate([bad[s:], jnp.zeros(s, jnp.bool_)])
            c += s
        badw = (
            bad[: rows * w]
            .reshape(rows, w4, 4)
            .transpose(0, 2, 1)
            .reshape(rows, w)
        )
        valid = valid & ~badw
        if mode == "raw_sent":
            # the kernel writes the sentinel pairs itself — no full-volume
            # sentinel where pass outside. k <= 16: hi is identically zero
            # and the epoch sort is lo-only, so the hi plane is never
            # materialized at all (half the output HBM/concat volume).
            badm = (~valid).astype(jnp.uint8)
            if k <= 16:
                lo = encode_packed_pallas(
                    main, halo, k, interpret, badm, emit_hi=False
                )
                return (lo.reshape(-1),)
            hi, lo = encode_packed_pallas(main, halo, k, interpret, badm)
            return hi.reshape(-1), lo.reshape(-1)
        hi, lo = encode_packed_pallas(main, halo, k, interpret)
    else:
        from ..ops.codec import encode_blocks, unpack_flat_blocks
        from ..ops.pallas_codec import encode_blocks_pallas

        blocks = unpack_flat_blocks(packed2, invpos, k, rows, block_windows)
        enc = encode_blocks_pallas if use_pallas else encode_blocks
        hi, lo, valid = enc(blocks, k, None, None)
        idx = jnp.arange(rows * w, dtype=jnp.int32).reshape(rows, w)
        valid = valid & (idx < covered)
    if mode == "raw_sent":
        return _sentinel_part(hi, lo, valid, k)
    return hi, lo, valid.astype(jnp.uint32)


def _sentinel_part(hi, lo, valid, k=32):
    """Unsorted (hi, lo) with invalid windows keyed (SENT, SENT) — never a
    canonical code for any k (the all-ones k-mer's RC is all-zeros).

    k <= 16: hi is identically zero and the epoch sort is lo-only, so the
    part is a 1-tuple (lo,) — the hi plane never materializes."""
    jnp = jax.numpy
    sent = jnp.uint32(0xFFFFFFFF)
    valid = valid.reshape(-1)
    s_lo = jnp.where(valid, lo.reshape(-1), sent)
    if k <= 16:
        return (s_lo,)
    return (jnp.where(valid, hi.reshape(-1), sent), s_lo)


@functools.partial(
    jax.jit, static_argnames=("k", "width", "use_pallas", "mode")
)
def _dense_raw_step(packed2, badbits, k, width, use_pallas=False, mode="raw"):
    """Dense-mask batch step: unpack -> codec -> per-window output (see
    :func:`_count_flat_step` for the mode contract)."""
    from ..ops.codec import encode_blocks, unpack_2bit
    from ..ops.pallas_codec import encode_blocks_pallas

    codes = unpack_2bit(packed2, badbits, width)
    enc = encode_blocks_pallas if use_pallas else encode_blocks
    hi, lo, valid = enc(codes, k, None, None)
    if mode == "raw_sent":
        return _sentinel_part(hi, lo, valid, k)
    return hi, lo, valid.astype(jax.numpy.uint32)


def _prefetch_staged(gen, stage_fn, depth: int):
    """Run ``stage_fn`` over ``gen`` in a background thread, ``depth`` deep.

    The double-buffered host->device feed (SURVEY §7 L3; VERDICT r4 weak
    #3): ``stage_fn`` does the per-batch host glue + ``device_put``
    dispatch off the main thread, so transfers overlap the device compute
    the main loop keeps dispatching. A bounded queue caps in-flight
    batches (device memory: ~8MB packed bytes each). FIFO order is
    preserved — results are bit-identical to the synchronous loop, pinned
    by tests/test_flat.py. ``depth <= 0`` degrades to the synchronous
    map (used by tests and single-batch inputs).

    Reference analog: rayon's read/compute overlap (src/reader.rs:58-79).
    """
    if depth <= 0:
        for b in gen:
            yield stage_fn(b)
        return
    import queue as _queue
    import threading

    q: _queue.Queue = _queue.Queue(maxsize=depth)
    done = object()
    stop = threading.Event()
    err: list[BaseException] = []

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except _queue.Full:
                continue
        return False

    def worker():
        try:
            for b in gen:
                if stop.is_set() or not put(stage_fn(b)):
                    return
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            put(done)

    t = threading.Thread(target=worker, name="krust-feed", daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is done:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()  # consumer abandoned early: unblock the worker


def _pallas_available() -> bool:
    """Pallas TPU kernels require a TPU-like backend (not cpu/gpu)."""
    try:
        return jax.devices()[0].platform not in ("cpu", "gpu")
    except Exception:
        return False


class BatchEngine:
    """Device engine: stream fixed-shape batches through a fused jitted step.

    Batches are padded to power-of-two row buckets so at most
    ``log2(batch_rows)`` distinct shapes are ever compiled.
    """

    def __init__(self, config: EngineConfig | None = None):
        self.config = config or EngineConfig()

    def _bucket_rows(self, rows: int) -> int:
        cap = self.config.batch_rows
        b = 8
        while b < rows and b < cap:
            b *= 2
        return max(b, rows) if rows > cap else b

    def _pad_batch(self, batch: PackedBatch) -> PackedBatch:
        rows = batch.codes.shape[0]
        target = self._bucket_rows(rows)
        if target == rows:
            return batch
        pad = target - rows
        codes = np.vstack(
            [batch.codes, np.full((pad, batch.codes.shape[1]), INVALID_CODE, np.uint8)]
        )
        qual = None
        if batch.qual is not None:
            qual = np.vstack(
                [batch.qual, np.full((pad, batch.qual.shape[1]), 0xFF, np.uint8)]
            )
        return PackedBatch(codes, qual, batch.n_windows, batch.block_windows)

    def _pad_batch2(self, batch):
        from ..io.packer import PackedBatch2

        rows = batch.packed2.shape[0]
        target = self._bucket_rows(rows)
        if target == rows:
            return batch
        pad = target - rows
        packed2 = np.vstack(
            [batch.packed2, np.zeros((pad, batch.packed2.shape[1]), np.uint8)]
        )
        badbits = np.vstack(
            [batch.badbits, np.full((pad, batch.badbits.shape[1]), 0xFF, np.uint8)]
        )
        return PackedBatch2(
            packed2, badbits, batch.n_windows, batch.block_windows, batch.width
        )

    def _make_table(self, k: int):
        from ..ops.table import DeviceTable, EpochTable

        cfg = self.config
        if cfg.use_epoch_sort:
            return "raw_sent", EpochTable(k, interpret=not _pallas_available())
        return "raw", DeviceTable(k)

    def _feed_streams(
        self, streams, k, min_quality, table, mode, epochs, on_windows
    ) -> None:
        """Feed one parsed stream's batches into ``table`` (shared by the
        eager and chunked ingest paths)."""
        from ..io.packer import flat_batches, pack_buffer_2bit
        from ..ops.table import EPOCH_WINDOW_LIMIT

        cfg = self.config
        thr = _quality_threshold(min_quality) if streams.qual is not None else None
        use_pallas = cfg.use_pallas and _pallas_available()
        qual_stream = streams.qual if thr is not None else None
        flat = (
            flat_batches(
                streams.codes, qual_stream, k, thr,
                cfg.block_windows, cfg.batch_rows,
            )
            if cfg.use_flat
            else None
        )
        fused = (
            cfg.use_fused_codec and use_pallas and cfg.block_windows % 512 == 0
        )
        depth = cfg.feed_depth
        if flat is not None:
            # stage (host glue + device_put dispatch) runs on the feeder
            # thread so transfers overlap the compute dispatched below
            staged = _prefetch_staged(
                flat,
                lambda b: (
                    jax.numpy.asarray(b.packed2),
                    jax.numpy.asarray(b.invpos),
                    b,
                ),
                depth,
            )
            for p2, iv, batch in staged:
                batch_windows = batch.rows * batch.block_windows
                if table.windows_this_epoch + batch_windows >= EPOCH_WINDOW_LIMIT:
                    epochs.append(table.finalize())  # uint32 headroom exhausted
                with span("encode_count_batch", rows=batch.rows):
                    out = _count_flat_step(
                        p2,
                        iv,
                        np.int32(batch.covered),
                        k,
                        batch.rows,
                        batch.block_windows,
                        use_pallas,
                        mode,
                        fused,
                    )
                    if len(out) == 1:  # lo-only sentinel part (k <= 16)
                        table.add(None, out[0], None, batch_windows)
                    elif len(out) == 2:
                        table.add(out[0], out[1], None, batch_windows)
                    else:
                        table.add(out[0], out[1], out[2], batch_windows)
                on_windows(batch.covered)
        else:  # dense path: invalid/quality-masked bases too numerous
            batches = pack_buffer_2bit(
                streams.codes, qual_stream, k, thr, cfg.block_windows, cfg.batch_rows
            )

            def _stage_dense(batch):
                batch = self._pad_batch2(batch)
                return (
                    jax.numpy.asarray(batch.packed2),
                    jax.numpy.asarray(batch.badbits),
                    batch,
                )

            for p2, bb, batch in _prefetch_staged(batches, _stage_dense, depth):
                batch_windows = batch.packed2.shape[0] * batch.block_windows
                if table.windows_this_epoch + batch_windows >= EPOCH_WINDOW_LIMIT:
                    epochs.append(table.finalize())
                with span("encode_count_batch", rows=batch.packed2.shape[0]):
                    out = _dense_raw_step(
                        p2,
                        bb,
                        k,
                        batch.width,
                        use_pallas,
                        mode,
                    )
                    if len(out) == 1:  # lo-only sentinel part (k <= 16)
                        table.add(None, out[0], None, batch_windows)
                    elif len(out) == 2:
                        table.add(out[0], out[1], None, batch_windows)
                    else:
                        table.add(out[0], out[1], out[2], batch_windows)
                on_windows(batch.n_windows)

    @staticmethod
    def _merge_epochs(epochs, k) -> PackedCounts:
        if len(epochs) == 1:
            codes64, counts64 = epochs[0]  # already sorted and distinct
        else:
            codes64, counts64 = _merge_partials(
                [e[0] for e in epochs], [e[1] for e in epochs]
            )
        trace_event("unpack_kmers", unique_kmers=int(codes64.shape[0]))
        return PackedCounts(k, codes64, counts64)

    def count(
        self,
        streams: ParsedStreams,
        k: int,
        min_quality: int | None = None,
        progress: ProgressCallback | None = None,
        tracker: ProgressTracker | None = None,
    ) -> PackedCounts:
        mode, table = self._make_table(k)
        epochs: list[tuple[np.ndarray, np.ndarray]] = []
        total_windows = max(streams.codes.shape[0] - k + 1, 0)
        pacer = _ProgressPacer(
            tracker, progress, streams.n_records, streams.n_bases, total_windows
        )
        self._feed_streams(
            streams, k, min_quality, table, mode, epochs, pacer.step
        )
        pacer.finish()
        epochs.append(table.finalize())
        return self._merge_epochs(epochs, k)

    def count_chunked(
        self,
        chunks,
        k: int,
        min_quality: int | None = None,
        progress: ProgressCallback | None = None,
        tracker: ProgressTracker | None = None,
    ) -> PackedCounts:
        """Count an iterator of :class:`ParsedStreams` chunks as one input.

        The bounded-host-memory ingest path (reference's true-streaming
        engines: src/streaming.rs:513-616): each chunk is parsed, fed, and
        released before the next is read, so host RSS stays at
        O(chunk + device tables) regardless of input size. Exact: chunks cut
        at record boundaries, and the table accumulates across chunks.
        """
        mode, table = self._make_table(k)
        epochs: list[tuple[np.ndarray, np.ndarray]] = []
        for streams in chunks:
            self._feed_streams(
                streams, k, min_quality, table, mode, epochs, lambda w: None
            )
            if tracker is not None:
                tracker.record_batch(streams.n_records, streams.n_bases)
                if progress is not None:
                    progress(tracker.snapshot())
        epochs.append(table.finalize())
        return self._merge_epochs(epochs, k)


# --- sequential engine -------------------------------------------------------------


class SequentialEngine:
    """Record-at-a-time engine (reference: src/streaming.rs:665-830).

    Processes each record independently and merges — useful for bounded-memory
    pipes and as a third differential implementation.
    """

    def __init__(self, config: EngineConfig | None = None):
        self.config = config or EngineConfig()

    def count_records(
        self,
        records,
        k: int,
        min_quality: int | None = None,
        progress: ProgressCallback | None = None,
        tracker: ProgressTracker | None = None,
    ) -> PackedCounts:
        from ..kmer import BASE_LUT

        acc = _HostAccumulator()
        for rec in records:
            seq = rec.seq if hasattr(rec, "seq") else rec
            qual = rec.qual if hasattr(rec, "qual") else None
            codes = BASE_LUT[np.frombuffer(seq, dtype=np.uint8)]
            qarr = (
                np.frombuffer(qual, dtype=np.uint8) if qual is not None else None
            )
            thr = _quality_threshold(min_quality) if qarr is not None else None
            uniq, cnt = count_stream_numpy(codes, qarr, k, thr)
            acc.add(uniq, np.asarray(cnt, dtype=np.uint64))
            if tracker is not None:
                tracker.record_sequence(len(seq))
                if progress is not None:
                    progress(tracker.snapshot())
        codes64, counts64 = acc.result()
        return PackedCounts(k, codes64, counts64)


# --- engine selection ---------------------------------------------------------------


def _jax_usable() -> bool:
    """Probe jax backend availability without risking an engine-select hang.

    ``jax.devices()`` against a dead remote accelerator link can retry-sleep
    indefinitely inside a C call — exactly the situation where the native
    host fallback is most needed. The probe runs in a daemon thread with a
    deadline (KRUST_JAX_PROBE_TIMEOUT_S, default 60 s — generous because a
    healthy tunneled backend may legitimately spend tens of seconds on
    first-contact negotiation); on timeout the backend is treated as
    unusable and the (possibly still-sleeping) probe thread is abandoned.
    A successful probe is cached by jax; a timed-out or failed probe is
    cached here for the process lifetime (a later backend recovery would
    otherwise charge every subsequent count the full timeout again).
    """
    global _JAX_USABLE_CACHE
    if _JAX_USABLE_CACHE is not None:
        return _JAX_USABLE_CACHE
    import threading

    result: list[bool] = []

    def probe() -> None:
        try:
            import jax

            jax.devices()
            result.append(True)
        except Exception:
            result.append(False)

    t = threading.Thread(target=probe, daemon=True, name="krust-jax-probe")
    t.start()
    try:
        timeout_s = float(os.environ.get("KRUST_JAX_PROBE_TIMEOUT_S", "60"))
    except ValueError:
        timeout_s = 60.0
    t.join(timeout_s)
    _JAX_USABLE_CACHE = bool(result) and result[0]
    return _JAX_USABLE_CACHE


#: process-lifetime verdict of _jax_usable (None = not probed yet)
_JAX_USABLE_CACHE: bool | None = None


def _jax_backend() -> str | None:
    try:
        import jax

        return jax.default_backend()
    except Exception:
        return None


def _cpu_platform_forced() -> bool:
    """True when the user explicitly asked for the jax-CPU platform.

    KRUST_PLATFORM=cpu is the documented way to exercise the jax pipeline
    without an accelerator (tests, CI, the 8-device virtual mesh), but the
    canonical jax spellings — JAX_PLATFORMS=cpu or
    ``jax.config.update("jax_platforms", "cpu")`` — count too; honoring
    them keeps auto-dispatch from silently rerouting an explicitly
    requested XLA-CPU run to the host core.
    """
    if os.environ.get("KRUST_PLATFORM", "").lower() == "cpu":
        return True
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        return True
    try:
        return (jax.config.jax_platforms or "").lower() == "cpu"
    except Exception:
        return False


def select_engine(cfg: EngineConfig):
    """The best available engine for this config and machine.

    Dispatch order: explicit numpy request (config beats environment —
    it is the documented differential-testing knob) -> KRUST_ENGINE env
    override (``native`` / ``numpy`` / ``device``; a forced device still
    runs the deadline probe and raises rather than hang on a dead
    backend) -> no usable jax -> native host core; jax usable but its
    best backend is plain CPU (no accelerator) -> native host core too,
    UNLESS the CPU platform was explicitly forced (the XLA-CPU pipeline
    exists for testing, not speed — the C++ core is ~50x faster
    single-core); otherwise the device engine.
    """
    if cfg.use_numpy_backend:
        return NumpyEngine(cfg)  # explicit request: the pure-numpy oracle
    forced = os.environ.get("KRUST_ENGINE", "").lower()
    if forced == "numpy":
        return NumpyEngine(cfg)
    if forced == "native":
        return NativeEngine(cfg)
    if forced in ("device", "jax", "batch"):
        if not _jax_usable():
            raise RuntimeError(
                "KRUST_ENGINE=device requested but the jax backend probe "
                "failed or timed out (KRUST_JAX_PROBE_TIMEOUT_S)"
            )
        return BatchEngine(cfg)
    if forced:
        raise ValueError(
            f"KRUST_ENGINE={forced!r}: expected 'native', 'numpy' or 'device'"
        )
    if not _jax_usable():
        return NativeEngine(cfg) if cfg.use_native_host else NumpyEngine(cfg)
    if (
        cfg.use_native_host
        and _jax_backend() == "cpu"
        and not _cpu_platform_forced()
    ):
        return NativeEngine(cfg)
    return BatchEngine(cfg)


def count_streams(
    streams: ParsedStreams,
    k: int,
    min_quality: int | None = None,
    config: EngineConfig | None = None,
    progress: ProgressCallback | None = None,
    tracker: ProgressTracker | None = None,
) -> PackedCounts:
    """Count with the best available engine (see :func:`select_engine`)."""
    cfg = config or EngineConfig()
    engine = select_engine(cfg)
    return engine.count(streams, k, min_quality, progress, tracker)


def count_chunked_streams(
    chunks,
    k: int,
    min_quality: int | None = None,
    config: EngineConfig | None = None,
    progress: ProgressCallback | None = None,
    tracker: ProgressTracker | None = None,
) -> PackedCounts:
    """Count an iterator of :class:`ParsedStreams` chunks as one input.

    The bounded-host-memory twin of :func:`count_streams` (reference's
    true-streaming engines: src/streaming.rs:513-616): chunks are consumed
    and released one at a time on whichever engine is available, so host RSS
    stays at O(chunk + tables) for arbitrarily large pipes.
    """
    cfg = config or EngineConfig()
    engine = select_engine(cfg)
    if isinstance(engine, BatchEngine):
        return engine.count_chunked(chunks, k, min_quality, progress, tracker)
    count_fn = (
        count_stream_host
        if isinstance(engine, NativeEngine)
        else count_stream_numpy
    )
    acc = _HostAccumulator(cfg.host_compact_threshold)
    for streams in chunks:
        thr = _quality_threshold(min_quality) if streams.qual is not None else None
        uniq, cnt = count_fn(streams.codes, streams.qual, k, thr)
        acc.add(uniq, np.asarray(cnt, dtype=np.uint64))
        if tracker is not None:
            tracker.record_batch(streams.n_records, streams.n_bases)
            if progress is not None:
                progress(tracker.snapshot())
    codes64, counts64 = acc.result()
    return PackedCounts(k, codes64, counts64)
