"""Count a file larger than device memory in bounded batches
(reference: examples/streaming_large_file.rs)."""

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from krust_tpu import count_with_input, Input
from krust_tpu.utils.config import EngineConfig


def _synthesize(path: str, mbases: int = 8) -> None:
    """Write a synthetic multi-record FASTA of ~mbases Mbases."""
    import numpy as np

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    with open(path, "wb") as f:
        for i in range(mbases):
            seq = bases[rng.integers(0, 4, size=1_000_000)].tobytes()
            f.write(b">contig%d\n" % i + seq + b"\n")


def main() -> None:
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        path = "/tmp/krust_example_large.fa"
        if not os.path.exists(path):
            print("synthesizing an 8 Mbase FASTA at", path)
            _synthesize(path)
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 21

    # bounded HOST memory too: ingest_chunk_bytes streams the file through
    # record-aligned chunks (one shared device table across chunks), so
    # neither the raw bytes nor the parsed stream ever materialize whole —
    # inputs far larger than host RAM and device memory both work
    cfg = EngineConfig(
        block_windows=4096, batch_rows=128, ingest_chunk_bytes=4 << 20
    )
    result = count_with_input(Input.from_path(path), k, config=cfg)
    print(f"{result.distinct} distinct {k}-mers, {result.total} total")


if __name__ == "__main__":
    main()
