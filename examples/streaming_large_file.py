"""Count a file larger than device memory in bounded batches
(reference: examples/streaming_large_file.rs)."""

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from krust_tpu import count_with_input, Input
from krust_tpu.utils.config import EngineConfig


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures/simple.fa"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 21

    # small batches: ~0.5M windows per device step
    cfg = EngineConfig(block_windows=4096, batch_rows=128)
    result = count_with_input(Input.from_path(path), k, config=cfg)
    print(f"{result.distinct} distinct {k}-mers, {result.total} total")


if __name__ == "__main__":
    main()
