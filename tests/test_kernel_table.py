"""Merge-kernel table (use_merge_kernel): differential vs the default engine."""

import numpy as np
import pytest

from krust_tpu.io.reader import ParsedStreams
from krust_tpu.kmer import INVALID_CODE
from krust_tpu.models.engines import BatchEngine, NumpyEngine
from krust_tpu.utils.config import EngineConfig


def _stream(rng, n, p_invalid=0.0):
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    if p_invalid:
        codes[rng.random(n) < p_invalid] = INVALID_CODE
    return codes


def _cfg(batch_rows=8):
    return EngineConfig(
        block_windows=256, batch_rows=batch_rows, use_merge_kernel=True
    )


@pytest.mark.parametrize("k", [1, 5, 15, 16, 17, 21, 31, 32])
def test_kernel_table_matches_oracle(k):
    rng = np.random.default_rng(k + 100)
    codes = _stream(rng, 6000, p_invalid=0.01)
    streams = ParsedStreams(codes, None, 1, codes.shape[0])
    got = BatchEngine(_cfg()).count(streams, k)
    exp = NumpyEngine(EngineConfig()).count(streams, k)
    assert np.array_equal(got.codes, exp.codes)
    assert np.array_equal(got.counts, exp.counts)


def test_kernel_table_dense_path():
    rng = np.random.default_rng(9)
    codes = _stream(rng, 4000, p_invalid=0.2)  # routes to dense badbits path
    streams = ParsedStreams(codes, None, 1, codes.shape[0])
    got = BatchEngine(_cfg()).count(streams, 11)
    exp = NumpyEngine(EngineConfig()).count(streams, 11)
    assert np.array_equal(got.codes, exp.codes)
    assert np.array_equal(got.counts, exp.counts)


def test_kernel_table_homopolymer_counts():
    codes = np.zeros(70_000, np.uint8)  # one k-mer, count >> 255
    streams = ParsedStreams(codes, None, 1, codes.shape[0])
    res = BatchEngine(_cfg(batch_rows=32)).count(streams, 5)
    assert res.distinct == 1 and int(res.counts[0]) == 70_000 - 4


def test_kernel_table_epoch_flush(monkeypatch):
    import krust_tpu.ops.table as table_mod

    rng = np.random.default_rng(19)
    codes = _stream(rng, 6000, p_invalid=0.01)
    streams = ParsedStreams(codes, None, 1, codes.shape[0])
    exp = NumpyEngine(EngineConfig()).count(streams, 11)
    monkeypatch.setattr(table_mod, "EPOCH_WINDOW_LIMIT", 4096)
    got = BatchEngine(_cfg()).count(streams, 11)
    assert np.array_equal(got.codes, exp.codes)
    assert np.array_equal(got.counts, exp.counts)
