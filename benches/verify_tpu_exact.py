"""On-chip exactness differential at bench scale.

The Pallas kernels (doubling codec, RLE compaction, merge network) were
interpret-validated while the tunnel was dead; this runs the REAL
compiled kernels on the TPU over the bench workload (128 Mbases, the
shapes already in the compilation cache) and asserts the full
(codes, counts) table is identical to the native C++ host engine —
two implementations sharing no code, data structures, or numerics.

Prints one PASS/FAIL line per k and exits non-zero on any divergence.
Run k values via KRUST_VERIFY_KS (default "21,16": the 2-op and one-key
regimes).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/krust_jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/krust_jax_cache")

    from bench import make_reads, reads_to_stream
    from krust_tpu.io.reader import ParsedStreams
    from krust_tpu.models.engines import BatchEngine, NativeEngine
    from krust_tpu.utils.config import EngineConfig

    ks = [int(x) for x in os.environ.get("KRUST_VERIFY_KS", "21,16").split(",")]
    bases = int(os.environ.get("KRUST_VERIFY_BASES", "128000000"))
    print(f"devices: {jax.devices()}  bases={bases}  ks={ks}", flush=True)

    rng = np.random.default_rng(7)  # the bench child's seed
    reads = make_reads(rng, bases)
    streams = ParsedStreams(
        reads_to_stream(reads), None, reads.shape[0], reads.size
    )
    del reads

    dev = BatchEngine(EngineConfig())
    nat = NativeEngine(EngineConfig())
    failed = 0
    for k in ks:
        t0 = time.perf_counter()
        r_dev = dev.count(streams, k)
        t_dev = time.perf_counter() - t0
        t0 = time.perf_counter()
        r_nat = nat.count(streams, k)
        t_nat = time.perf_counter() - t0
        same = np.array_equal(r_dev.codes, r_nat.codes) and np.array_equal(
            r_dev.counts, r_nat.counts
        )
        status = "PASS" if same else "FAIL"
        if not same:
            failed += 1
        print(
            f"k={k}: {status}  distinct={r_dev.distinct} total={r_dev.total} "
            f"(tpu {t_dev:.1f}s, native {t_nat:.1f}s)",
            flush=True,
        )
        if not same:
            nd = min(r_dev.distinct, r_nat.distinct)
            diff = np.flatnonzero(r_dev.codes[:nd] != r_nat.codes[:nd])
            print(
                f"  native distinct={r_nat.distinct}; first code divergence "
                f"at {diff[0] if diff.size else 'tail'}",
                flush=True,
            )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
