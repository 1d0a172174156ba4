"""Epoch-sort table (use_epoch_sort): differential vs oracle and DeviceTable."""

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
    return EngineConfig(block_windows=256, batch_rows=batch_rows, use_epoch_sort=True)


@pytest.mark.parametrize("k", [1, 5, 15, 16, 17, 21, 31, 32])
def test_epoch_table_matches_oracle(k):
    rng = np.random.default_rng(k + 100)
    codes = _stream(rng, 6000, p_invalid=0.01)
    streams = ParsedStreams(codes, None, 1, codes.shape[0])
    got = BatchEngine(_cfg()).count(streams, k)
    exp = NumpyEngine(EngineConfig()).count(streams, k)
    assert np.array_equal(got.codes, exp.codes)
    assert np.array_equal(got.counts, exp.counts)


def test_epoch_table_dense_path():
    rng = np.random.default_rng(9)
    codes = _stream(rng, 4000, p_invalid=0.2)  # routes to dense badbits path
    streams = ParsedStreams(codes, None, 1, codes.shape[0])
    got = BatchEngine(_cfg()).count(streams, 11)
    exp = NumpyEngine(EngineConfig()).count(streams, 11)
    assert np.array_equal(got.codes, exp.codes)
    assert np.array_equal(got.counts, exp.counts)


def test_epoch_table_homopolymer_counts():
    codes = np.zeros(70_000, np.uint8)  # one k-mer, count >> 255
    streams = ParsedStreams(codes, None, 1, codes.shape[0])
    res = BatchEngine(_cfg(batch_rows=32)).count(streams, 5)
    assert res.distinct == 1 and int(res.counts[0]) == 70_000 - 4


def test_epoch_table_window_limit_flush(monkeypatch):
    import krust_tpu.ops.table as table_mod

    rng = np.random.default_rng(19)
    codes = _stream(rng, 6000, p_invalid=0.01)
    streams = ParsedStreams(codes, None, 1, codes.shape[0])
    exp = NumpyEngine(EngineConfig()).count(streams, 11)
    monkeypatch.setattr(table_mod, "EPOCH_WINDOW_LIMIT", 4096)
    got = BatchEngine(_cfg()).count(streams, 11)
    assert np.array_equal(got.codes, exp.codes)
    assert np.array_equal(got.counts, exp.counts)


def test_epoch_table_vs_device_table():
    """The retired-default DeviceTable remains the on-device oracle: both
    table designs must agree bit-for-bit."""
    rng = np.random.default_rng(77)
    codes = _stream(rng, 9000, p_invalid=0.02)
    streams = ParsedStreams(codes, None, 1, codes.shape[0])
    a = BatchEngine(EngineConfig(block_windows=256, batch_rows=8, use_epoch_sort=True)).count(streams, 17)
    b = BatchEngine(EngineConfig(block_windows=256, batch_rows=8, use_epoch_sort=False)).count(streams, 17)
    assert np.array_equal(a.codes, b.codes)
    assert np.array_equal(a.counts, b.counts)


@pytest.mark.slow
def test_epoch_table_raw_epoch_entry_flush(monkeypatch):
    """Force the raw-entry epoch limit so multiple sort+rle flushes and the
    compacted-part merge path execute."""
    import krust_tpu.ops.table as table_mod

    monkeypatch.setattr(table_mod, "EPOCH_ENTRY_LIMIT", 2048)
    rng = np.random.default_rng(5)
    codes = _stream(rng, 20_000, p_invalid=0.01)
    streams = ParsedStreams(codes, None, 1, codes.shape[0])
    got = BatchEngine(_cfg()).count(streams, 13)
    exp = NumpyEngine(EngineConfig()).count(streams, 13)
    assert np.array_equal(got.codes, exp.codes)
    assert np.array_equal(got.counts, exp.counts)


def test_k16_one_op_sentinel_safety():
    """k=16 rides the 1-operand epoch sort (round 4): codes span all 32
    bits, so the invalid-window sentinel 0xFFFFFFFF is only safe because
    the all-T k-mer is never canonical (its RC is all-A == 0). Feed
    poly-T runs abutting Ns — codes adjacent to the sentinel — and require
    exact equality with the oracle."""
    t = np.full(600, 3, np.uint8)  # poly-T: fwd code all-ones
    n = np.full(3, INVALID_CODE, np.uint8)
    rng = np.random.default_rng(16)
    codes = np.concatenate([t, n, _stream(rng, 3000), n, t])
    streams = ParsedStreams(codes, None, 1, codes.shape[0])
    got = BatchEngine(_cfg()).count(streams, 16)
    exp = NumpyEngine(EngineConfig()).count(streams, 16)
    assert np.array_equal(got.codes, exp.codes)
    assert np.array_equal(got.counts, exp.counts)
    # the all-A canonical code (poly-T folded) dominates
    assert got.codes[0] == 0 and got.counts[0] >= 2 * (600 - 15)


class TestAdaptiveAndScaledLimits:
    """Round 5: HBM-scaled entry limits + duplication-adaptive epoch sizing."""

    def test_env_override_pins_limits(self, monkeypatch):
        import krust_tpu.ops.table as table_mod

        monkeypatch.setenv("KRUST_EPOCH_ENTRIES", "12345")
        monkeypatch.setenv("KRUST_PENDING_ENTRIES", "6789")
        assert table_mod.epoch_entry_limit() == 12345
        t = table_mod.EpochTable(k=11)
        assert t._epoch_limit == 12345
        assert t._pending_limit == 6789
        assert t._adaptive is False  # explicit pin disables adaptation

    def test_hbm_scaling(self, monkeypatch):
        import krust_tpu.ops.table as table_mod

        monkeypatch.delenv("KRUST_EPOCH_ENTRIES", raising=False)
        # simulate a 8GB part: limits halve vs the 16GB tuning point
        monkeypatch.setattr(table_mod, "_HBM_CACHE", 8 << 30)
        assert table_mod.epoch_entry_limit() == 120_000_000
        # simulate a tiny device: the 1M floor holds
        monkeypatch.setattr(table_mod, "_HBM_CACHE", 1 << 20)
        assert table_mod.epoch_entry_limit() == 1 << 20
        # unqueryable (CPU): tuned constants as-is
        monkeypatch.setattr(table_mod, "_HBM_CACHE", None)
        assert table_mod.epoch_entry_limit() == table_mod.EPOCH_ENTRY_LIMIT

    def test_adaptive_epoch_shrinks_on_duplication(self, monkeypatch):
        """High-duplication input retunes the epoch limit after epoch 1
        (to ADAPT_DUP_TARGET * distinct) and stays exact vs the oracle."""
        import krust_tpu.ops.table as table_mod

        monkeypatch.delenv("KRUST_EPOCH_ENTRIES", raising=False)
        monkeypatch.setattr(table_mod, "EPOCH_ENTRY_LIMIT", 4096)
        monkeypatch.setattr(table_mod.EpochTable, "ADAPT_MIN", 64)
        rng = np.random.default_rng(55)
        # ~30 distinct 9-mers duplicated heavily: dup ratio >> ADAPT target
        motif = _stream(rng, 40, 0.0)
        codes = np.concatenate([motif for _ in range(600)])
        streams = ParsedStreams(codes, None, 1, codes.shape[0])
        engine = BatchEngine(_cfg())
        mode, table = engine._make_table(9)

        epochs = []
        engine._feed_streams(streams, 9, None, table, mode, epochs, lambda w: None)
        assert table._adaptive is False
        assert table._epoch_limit < 4096  # shrunk from the big limit
        got_codes, got_counts = table.finalize()
        for e_codes, e_counts in epochs:
            # fold any early-epoch results (uint32 headroom flushes)
            merged = {}
            for c, n in zip(got_codes.tolist(), got_counts.tolist()):
                merged[c] = merged.get(c, 0) + n
            for c, n in zip(e_codes.tolist(), e_counts.tolist()):
                merged[c] = merged.get(c, 0) + n
            got_codes = np.array(sorted(merged), np.uint64)
            got_counts = np.array([merged[c] for c in sorted(merged)], np.uint64)
        exp = NumpyEngine(EngineConfig()).count(streams, 9)
        assert np.array_equal(got_codes, exp.codes)
        assert np.array_equal(got_counts, exp.counts)

    def test_adaptive_epoch_keeps_large_on_low_duplication(self, monkeypatch):
        import krust_tpu.ops.table as table_mod

        monkeypatch.delenv("KRUST_EPOCH_ENTRIES", raising=False)
        monkeypatch.setattr(table_mod, "EPOCH_ENTRY_LIMIT", 2048)
        monkeypatch.setattr(table_mod.EpochTable, "ADAPT_MIN", 64)
        rng = np.random.default_rng(56)
        codes = _stream(rng, 12_000, 0.0)  # random: low duplication
        streams = ParsedStreams(codes, None, 1, codes.shape[0])
        engine = BatchEngine(_cfg())
        mode, table = engine._make_table(15)
        epochs = []
        engine._feed_streams(streams, 15, None, table, mode, epochs, lambda w: None)
        table.finalize()
        # distinct ~= windows: target 64 * n exceeds the limit -> unchanged
        assert table._epoch_limit == 2048
