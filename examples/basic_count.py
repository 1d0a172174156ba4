"""Count k-mers in a file and print the top 10 by count
(reference: examples/basic_count.rs)."""

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import krust_tpu as kt


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures/simple.fa"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    counts = kt.count_kmers(path, k)
    print(f"{len(counts)} distinct {k}-mers, {sum(counts.values())} total")
    for kmer, count in sorted(counts.items(), key=lambda kv: -kv[1])[:10]:
        print(f"{kmer}\t{count}")


if __name__ == "__main__":
    main()
