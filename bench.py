"""Benchmark: end-to-end canonical k-mer counting throughput at k=21.

Workload (mirrors BASELINE.json config 2's shape): synthetic sequencing reads
at ~32x coverage of a 16 Mbase genome — 512 Mbases of 250 bp reads, ~16M
distinct canonical 21-mers — counted end-to-end (pack -> transfer -> device
rolling codec -> epoch-sort counting core -> full table pull to host),
excluding compilation (one warmup pass) and output formatting, matching the
reference's criterion macro-bench scope
(reference: benches/kmer_benchmark.rs:127-188).

Note on this rig: the TPU is reached through a ~20-40 MB/s tunnel (measured),
so end-to-end throughput here is transfer-bound — the 2-bit input stream plus
the pulled count table set a hard wall-clock floor that would not exist on
directly-attached hardware (PCIe/ICI are ~100-1000x faster). The pipeline is
byte-minimal on both directions for exactly this reason, and the stderr line
reports a phase breakdown so compute and link time are separable.

Baseline (MEASURED, round 2 — replaces round 1's credited number): the
reference publishes no numbers (BASELINE.md) and Rust is not installable in
this image, so `benches/baseline_cpp/kmerust_like.cpp` reproduces the
reference's hot-loop shape faithfully (per-window allocation + validate +
pack + canonical + FxHash map update; reference: src/run.rs:526-571,
src/kmer.rs:266-398) and was measured single-thread on this host at k=21 on
the same read distribution (64 Mbase subset):

    faithful (reference shape):  2.26 Mbases/s/thread
    rolling  (best-case rewrite): 11.9 Mbases/s/thread

The operative baseline is faithful x 64 threads with IDEAL scaling (dashmap
contention ignored) = 144.6 Mbases/s. The rolling x 64 = 760 Mbases/s
upper bound for any CPU implementation is also reported on stderr.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

#: measured: 2.26 Mbases/s/thread (faithful C++ reference-shape proxy,
#: this host) x 64 threads ideal scaling. See module docstring.
BASELINE_BASES_PER_S = 144.6e6
#: best-case CPU bound: rolling zero-alloc variant x 64 ideal
BASELINE_ROLLING_64T = 760.0e6
K = 21
GENOME_MBASES = 16
COVERAGE = 32
READ_LEN = 250


def make_reads(rng: np.random.Generator):
    """Synthetic reads: COVERAGE x random substrings of one random genome."""
    genome = rng.integers(0, 4, size=GENOME_MBASES * 1_000_000, dtype=np.uint8)
    n_reads = (genome.shape[0] * COVERAGE) // READ_LEN
    starts = rng.integers(0, genome.shape[0] - READ_LEN, size=n_reads, dtype=np.int32)
    idx = starts[:, None] + np.arange(READ_LEN, dtype=np.int32)[None, :]
    reads = genome[idx]  # [n_reads, READ_LEN] of 2-bit codes
    return reads


def reads_to_stream(reads: np.ndarray) -> np.ndarray:
    """Code rows -> flat separator-delimited stream (reader output format)."""
    from krust_tpu.kmer import INVALID_CODE

    n, L = reads.shape
    out = np.empty((n, L + 1), dtype=np.uint8)
    out[:, :L] = reads
    out[:, L] = INVALID_CODE
    return out.reshape(-1)[:-1]  # one separator between reads, none trailing


_WATCHDOG = {"deadline": None, "what": ""}


def _arm_watchdog(seconds: float, what: str) -> None:
    """Abort with a diagnostic instead of hanging into an external timeout.

    The tunneled TPU backend can wedge entirely (every transfer blocks
    forever inside a C call — so SIGALRM handlers never run; it recovers on
    its own after tens of minutes). A daemon watchdog THREAD checks the
    deadline and os._exit(3)s with an explanation: a fast, explained
    failure tells the driver more than a hang.
    """
    import threading

    first = _WATCHDOG["deadline"] is None
    _WATCHDOG["deadline"] = time.monotonic() + seconds
    _WATCHDOG["what"] = what
    if not first:
        return

    def _watch():
        while True:
            dl = _WATCHDOG["deadline"]
            if dl is None:
                return
            if time.monotonic() > dl:
                print(
                    f"# bench aborted: {_WATCHDOG['what']} did not complete "
                    "in time — the TPU tunnel is unresponsive (known "
                    "transient wedge; transfers block indefinitely until "
                    "the backend recovers)",
                    file=sys.stderr,
                    flush=True,
                )
                os._exit(3)
            time.sleep(5)

    threading.Thread(target=_watch, daemon=True).start()


def main() -> None:
    import jax

    os.makedirs("/tmp/krust_jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/krust_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    # pre-flight: a trivial round-trip proves the device is reachable
    _arm_watchdog(180, "device pre-flight round-trip")
    _ = np.asarray(jax.numpy.zeros(8, jax.numpy.uint8))
    _arm_watchdog(1800, "the benchmark")

    from krust_tpu.io.reader import ParsedStreams
    from krust_tpu.models.engines import BatchEngine
    from krust_tpu.utils.config import EngineConfig

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(7)

    reads = make_reads(rng)
    n_bases = int(reads.size)
    stream = reads_to_stream(reads)
    streams = ParsedStreams(stream, None, reads.shape[0], n_bases)

    cfg = EngineConfig()
    engine = BatchEngine(cfg)

    # warmup: one full pass compiles every shape in the pipeline (batch
    # buckets AND table-merge sizes); remote compiles are minutes-slow and
    # must stay out of the timed region. Executables persist in the
    # compilation cache, so subsequent bench runs skip this cost too.
    engine.count(streams, K)

    # best of up to 3 timed passes: the tunneled link's throughput varies
    # ~2x run-to-run AND degrades under sustained transfer load (observed:
    # passes of 12.6/13.0/12.0 then 37/47s in one run), so fewer passes =
    # less self-inflicted degradation; the fastest pass best reflects the
    # pipeline (criterion likewise reports distribution minima). A time
    # budget caps total wall so a degraded tunnel can't run the bench into
    # an external timeout.
    times = []
    budget = 150.0
    for _ in range(3):
        t0 = time.perf_counter()
        result = engine.count(streams, K)
        times.append(time.perf_counter() - t0)
        budget -= times[-1]
        if budget <= min(times):
            break
    elapsed = min(times)

    bases_per_s = n_bases / elapsed

    # phase breakdown (instrumented pass with forced syncs; slightly slower
    # than the timed passes but separates host pack / h2d feed / device
    # compute / finalize pull for the record)
    phases = _instrumented_pass(engine, streams)

    # probe the host<->TPU link so a tunnel-degraded run is interpretable:
    # observed same-code wall times span 16s..98s purely with link phases
    # (healthy ~40 MB/s h2d / ~20 MB/s d2h; degraded under 10 MB/s)
    import jax.numpy as jnp

    probe = np.random.randint(0, 255, 8 << 20, np.uint8)
    x = jax.device_put(probe)
    _ = np.asarray(x[:1])
    t0 = time.perf_counter()
    x2 = jax.device_put(np.random.randint(0, 255, 8 << 20, np.uint8))
    _ = np.asarray(x2[:1])
    h2d = 8 / (time.perf_counter() - t0)
    r = jnp.asarray(probe) + jnp.uint8(1)
    _ = np.asarray(r[:1])
    t0 = time.perf_counter()
    _ = np.asarray(r)
    d2h = 8 / (time.perf_counter() - t0)

    _WATCHDOG["deadline"] = None  # bench finished: disarm
    print(
        json.dumps(
            {
                "metric": f"bases_per_second_k{K}",
                "value": round(bases_per_s, 1),
                "unit": "bases/s",
                "vs_baseline": round(bases_per_s / BASELINE_BASES_PER_S, 3),
            }
        )
    )
    print(
        f"# platform={platform} elapsed={elapsed:.3f}s passes={len(times)} "
        f"times={[round(t, 1) for t in times]} bases={n_bases} "
        f"distinct={result.distinct} total={result.total} "
        f"link_h2d={h2d:.1f}MB/s link_d2h={d2h:.1f}MB/s",
        file=sys.stderr,
    )
    print(
        f"# phases: pack={phases['pack']:.2f}s feed={phases['feed']:.2f}s "
        f"device_compute={phases['compute']:.2f}s "
        f"finalize_pull={phases['finalize']:.2f}s "
        f"compute_only={n_bases / max(phases['compute'], 1e-9) / 1e6:.0f} Mbases/s",
        file=sys.stderr,
    )
    print(
        f"# baseline: measured faithful 64t={BASELINE_BASES_PER_S/1e6:.1f} "
        f"Mbases/s (vs_baseline above); best-case CPU rolling 64t="
        f"{BASELINE_ROLLING_64T/1e6:.0f} Mbases/s -> "
        f"vs_rolling={bases_per_s / BASELINE_ROLLING_64T:.3f}",
        file=sys.stderr,
    )


def _instrumented_pass(engine, streams) -> dict:
    """One pass with per-phase syncs: pack / h2d feed / compute / finalize."""
    import jax

    from krust_tpu.io.packer import flat_batches

    cfg = engine.config
    t0 = time.perf_counter()
    batches = list(
        flat_batches(
            streams.codes, None, K, None, cfg.block_windows, cfg.batch_rows
        )
    )
    t_pack = time.perf_counter() - t0

    mode, table = engine._make_table(K)
    from krust_tpu.models.engines import _count_flat_step

    t_feed = 0.0
    t_compute = 0.0
    for batch in batches:
        t0 = time.perf_counter()
        p2 = jax.device_put(jax.numpy.asarray(batch.packed2))
        iv = jax.device_put(jax.numpy.asarray(batch.invpos))
        _ = np.asarray(p2.ravel()[:1])  # force the transfer
        t_feed += time.perf_counter() - t0
        t0 = time.perf_counter()
        out = _count_flat_step(
            p2, iv, np.int32(batch.covered), K, batch.rows,
            batch.block_windows, cfg.use_pallas, mode,
        )
        if len(out) == 2:
            table.add(out[0], out[1], None, batch.rows * batch.block_windows)
        else:
            table.add(out[0], out[1], out[2], batch.rows * batch.block_windows)
        t_compute += time.perf_counter() - t0
    # flush all queued device work into the compute bucket (resolve the
    # deferred epoch sync so the sort+rle cost lands here, not in finalize)
    t0 = time.perf_counter()
    if hasattr(table, "_flush_raw"):
        table._flush_raw()
        if hasattr(table, "_resolve_epoch"):
            table._resolve_epoch()
        if table._compacted:
            _ = np.asarray(table._compacted[-1][0].ravel()[:1])
    t_compute += time.perf_counter() - t0
    t0 = time.perf_counter()
    table.finalize()
    t_final = time.perf_counter() - t0
    return {
        "pack": t_pack,
        "feed": t_feed,
        "compute": t_compute,
        "finalize": t_final,
    }


if __name__ == "__main__":
    main()
