"""Progress callback with throughput display
(reference: examples/progress_bar.rs)."""

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import krust_tpu as kt


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures/simple.fa"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    start = time.perf_counter()

    def on_progress(p: kt.Progress) -> None:
        elapsed = time.perf_counter() - start
        rate = p.bases_processed / elapsed if elapsed > 0 else 0.0
        print(
            f"\r{p.sequences_processed} sequences, {p.bases_processed} bases "
            f"({rate / 1e6:.2f} Mbases/s)",
            end="",
            file=sys.stderr,
        )

    counts = kt.count_kmers_with_progress(path, k, on_progress)
    print(file=sys.stderr)
    print(f"{len(counts)} distinct {k}-mers")


if __name__ == "__main__":
    main()
