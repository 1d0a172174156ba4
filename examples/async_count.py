"""Concurrent async counts over multiple files
(reference: examples/async_count.rs)."""

import asyncio
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import krust_tpu as kt


async def main() -> None:
    paths = sys.argv[1:] or ["tests/fixtures/simple.fa", "tests/fixtures/simple.fq"]
    k = 5

    results = await asyncio.gather(
        *(kt.count_kmers_async(p, k) for p in paths)
    )
    for path, counts in zip(paths, results):
        print(f"{path}: {len(counts)} distinct {k}-mers")


if __name__ == "__main__":
    asyncio.run(main())
