"""Regression tests for error-surface and config-threading review fixes."""

import gzip
import subprocess
import sys

import pytest

from krust_tpu import KmerCounter, count_kmers, load_index
from krust_tpu.errors import FormatError, IndexReadError, ReadError
from krust_tpu.io.format import SequenceFormat
from krust_tpu.io.reader import parse_records
from krust_tpu.utils.config import EngineConfig


def _truncated_gz(tmp_path, name, payload):
    blob = gzip.compress(payload)
    p = tmp_path / name
    p.write_bytes(blob[: len(blob) - 6])  # cut the gzip trailer
    return p


def test_truncated_gzip_fasta_raises_read_error(tmp_path):
    p = _truncated_gz(tmp_path, "x.fa.gz", b">a\n" + b"ACGT" * 500 + b"\n")
    with pytest.raises(ReadError):
        count_kmers(p, 3)


def test_truncated_gzip_index_raises_index_error(tmp_path):
    from krust_tpu import KmerIndex, save_index

    idx = KmerIndex(3, {5: 7})
    p = tmp_path / "x.kmix.gz"
    save_index(idx, p)
    blob = p.read_bytes()
    p.write_bytes(blob[: len(blob) - 5])
    with pytest.raises(IndexReadError):
        load_index(p)


def test_truncated_gzip_cli_exit_code(tmp_path):
    p = _truncated_gz(tmp_path, "x.fa.gz", b">a\n" + b"ACGT" * 500 + b"\n")
    r = subprocess.run(
        [sys.executable, "-m", "krust_tpu", "3", str(p), "-q"],
        capture_output=True,
        text=True,
        env={"KRUST_PLATFORM": "cpu", "KRUST_ENGINE": "native",
             "PATH": "/usr/bin:/bin", "PYTHONPATH": "."},
    )
    assert r.returncode == 1
    assert "Traceback" not in r.stderr


def test_fastq_empty_final_quality_line_parses():
    recs = parse_records(b"@a\nACGT\n+\nIIII\n@b\n\n+\n\n", SequenceFormat.FASTQ)
    assert len(recs) == 2
    assert recs[1].seq == b""


def test_fastq_stray_trailing_blank_lines_rejected():
    with pytest.raises(FormatError):
        parse_records(b"@a\nACGT\n+\nIIII\n\n\n", SequenceFormat.FASTQ)


def test_quiet_suppresses_min_quality_warning(tmp_path):
    p = tmp_path / "g.fa"
    p.write_text(">a\nACGTACGT\n")
    r = subprocess.run(
        [sys.executable, "-m", "krust_tpu", "3", str(p), "-q", "-Q", "20"],
        capture_output=True,
        text=True,
        env={"KRUST_PLATFORM": "cpu", "KRUST_ENGINE": "native",
             "PATH": "/usr/bin:/bin", "PYTHONPATH": "."},
    )
    assert r.returncode == 0
    assert r.stderr == ""  # the quiet contract: zero stderr


def test_builder_engine_config_reaches_engine(tmp_path, monkeypatch):
    """engine_config() must actually steer the engine in count()."""
    import krust_tpu.models.engines as eng

    p = tmp_path / "g.fa"
    p.write_text(">a\nACGTACGTACGT\n")
    seen = {}
    orig = eng.count_streams

    def spy(streams, k, min_quality=None, config=None, progress=None, tracker=None):
        seen["config"] = config
        return orig(streams, k, min_quality, config, progress, tracker)

    monkeypatch.setattr(eng, "count_streams", spy)
    import krust_tpu.api as api_mod

    monkeypatch.setattr(api_mod, "count_streams", spy)
    cfg = EngineConfig(block_windows=64, batch_rows=8)
    KmerCounter.new().k(3).engine_config(cfg).count(p)
    assert seen["config"] is cfg


class TestJaxProbeDeadline:
    """select_engine must survive a hanging backend probe (VERDICT r3 #9).

    A dead tunneled accelerator has two observed failure modes for
    ``jax.devices()``: fast connection-refused and retry-sleep-forever
    inside a C call. The probe contract: with a never-returning
    ``jax.devices``, select_engine falls back to NativeEngine within the
    KRUST_JAX_PROBE_TIMEOUT_S deadline instead of hanging the process.
    """

    def test_hanging_devices_probe_times_out(self, monkeypatch):
        import threading
        import time

        import jax

        from krust_tpu.models import engines as eng

        hang = threading.Event()

        def never_returns():
            hang.wait()  # blocks until the test ends; thread is a daemon
            return []

        monkeypatch.setattr(jax, "devices", never_returns)
        monkeypatch.setenv("KRUST_JAX_PROBE_TIMEOUT_S", "0.5")
        old_cache = eng._JAX_USABLE_CACHE
        eng._JAX_USABLE_CACHE = None  # force a fresh probe
        try:
            t0 = time.monotonic()
            engine = eng.select_engine(EngineConfig())
            elapsed = time.monotonic() - t0
            assert isinstance(engine, eng.NativeEngine)
            assert elapsed < 5.0, f"probe did not honor its deadline ({elapsed:.1f}s)"
            # the verdict is cached: a second select is instant
            t0 = time.monotonic()
            engine2 = eng.select_engine(EngineConfig())
            assert isinstance(engine2, eng.NativeEngine)
            assert time.monotonic() - t0 < 0.1
        finally:
            eng._JAX_USABLE_CACHE = old_cache
            hang.set()  # release the abandoned probe thread

    def test_failing_devices_probe_falls_back(self, monkeypatch):
        import jax

        from krust_tpu.models import engines as eng

        def raises():
            raise RuntimeError("backend exploded")

        monkeypatch.setattr(jax, "devices", raises)
        old_cache = eng._JAX_USABLE_CACHE
        eng._JAX_USABLE_CACHE = None
        try:
            engine = eng.select_engine(EngineConfig())
            assert isinstance(engine, eng.NativeEngine)
        finally:
            eng._JAX_USABLE_CACHE = old_cache


class TestEngineOverridePrecedence:
    """KRUST_ENGINE contracts (round-4 review): explicit config beats the
    env override, and a forced device still honors the probe deadline."""

    def test_explicit_numpy_beats_env(self, monkeypatch):
        from krust_tpu.models import engines as eng

        monkeypatch.setenv("KRUST_ENGINE", "native")
        engine = eng.select_engine(EngineConfig(use_numpy_backend=True))
        assert isinstance(engine, eng.NumpyEngine)

    def test_forced_device_raises_on_dead_probe(self, monkeypatch):
        import jax

        from krust_tpu.models import engines as eng

        def raises():
            raise RuntimeError("backend exploded")

        monkeypatch.setattr(jax, "devices", raises)
        monkeypatch.setenv("KRUST_ENGINE", "device")
        old_cache = eng._JAX_USABLE_CACHE
        eng._JAX_USABLE_CACHE = None
        try:
            with pytest.raises(RuntimeError, match="KRUST_ENGINE=device"):
                eng.select_engine(EngineConfig())
        finally:
            eng._JAX_USABLE_CACHE = old_cache

    def test_bogus_value_rejected(self, monkeypatch):
        from krust_tpu.models import engines as eng

        monkeypatch.setenv("KRUST_ENGINE", "gpu")
        with pytest.raises(ValueError, match="KRUST_ENGINE"):
            eng.select_engine(EngineConfig())
