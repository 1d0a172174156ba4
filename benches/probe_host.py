"""Host counting-core throughput matrix (the no-accelerator path).

Measures ``krust_count_stream`` (rolling canonical + MSD partition +
u32/u64 inner LSD + RLE; io/native/krust_native.cpp) on the bench read
distribution at several k and duplication levels — the reproducible
harness behind the host-core numbers in ROADMAP.md / BASELINE.md.
Single-threaded unless KRUST_NATIVE_THREADS is set (scope matches the
reference's macro benches, benches/kmer_benchmark.rs:127-188, at host
scale).

Run: python benches/probe_host.py [n_bases]   (default 64M; ~1 min)
Output lines are `key: value` so a run can be committed as an artifact.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("KRUST_PLATFORM", "cpu")

import numpy as np

from krust_tpu.io import native

READ_LEN = 250


def make_stream(rng: np.random.Generator, n_bases: int, coverage: int):
    genome = rng.integers(
        0, 4, size=max(n_bases // coverage, READ_LEN + 1), dtype=np.uint8
    )
    n_reads = n_bases // READ_LEN
    starts = rng.integers(
        0, genome.shape[0] - READ_LEN, size=n_reads, dtype=np.int64
    )
    idx = starts[:, None] + np.arange(READ_LEN, dtype=np.int64)[None, :]
    reads = genome[idx]
    out = np.empty((n_reads, READ_LEN + 1), dtype=np.uint8)
    out[:, :READ_LEN] = reads
    out[:, READ_LEN] = 4
    return out.reshape(-1)[:-1]


def main() -> None:
    n_bases = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000_000
    rng = np.random.default_rng(7)
    if not native.available():
        print("native: unavailable")
        return
    print(f"n_bases: {n_bases}")
    print(f"threads: {os.environ.get('KRUST_NATIVE_THREADS', 'auto')}")
    for coverage in (32, 1):
        stream = make_stream(rng, n_bases, coverage)
        for k in (5, 11, 21, 31):
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                uniq, _cnt = native.count_stream_native(stream, None, None, k)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(
                f"count k={k} cov={coverage}: {n_bases / best / 1e6:.1f}"
                f" Mbases/s ({best:.3f}s, unique={uniq.shape[0]})"
            )
        del stream


if __name__ == "__main__":
    main()
