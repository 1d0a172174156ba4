"""Differential check against Jellyfish, when installed
(reference: examples/compare_with_jellyfish.rs, tests/jellyfish_compat.rs).

Runs ``jellyfish count -m k -C`` + ``jellyfish dump -c`` on the same input
and diffs the full count maps. Skips when jellyfish is absent.
"""

import shutil
import subprocess
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile

import krust_tpu as kt


def jellyfish_counts(path: str, k: int) -> dict[str, int] | None:
    if shutil.which("jellyfish") is None:
        return None
    with tempfile.NamedTemporaryFile(suffix=".jf") as tmp:
        subprocess.run(
            ["jellyfish", "count", "-m", str(k), "-s", "10M", "-C",
             "-o", tmp.name, path],
            check=True,
        )
        dump = subprocess.run(
            ["jellyfish", "dump", "-c", tmp.name],
            check=True,
            capture_output=True,
            text=True,
        )
    counts = {}
    for line in dump.stdout.splitlines():
        kmer, count = line.split()
        counts[kmer] = int(count)
    return counts


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures/simple.fa"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    ours = kt.count_kmers(path, k)
    theirs = jellyfish_counts(path, k)
    if theirs is None:
        print("jellyfish not installed; skipping comparison")
        print(f"krust_tpu: {len(ours)} distinct {k}-mers")
        return

    if ours == theirs:
        print(f"MATCH: {len(ours)} distinct {k}-mers identical to jellyfish -C")
    else:
        only_ours = set(ours) - set(theirs)
        only_theirs = set(theirs) - set(ours)
        diff = {m for m in set(ours) & set(theirs) if ours[m] != theirs[m]}
        print(f"MISMATCH: +{len(only_ours)} / -{len(only_theirs)} / diff {len(diff)}")
        sys.exit(1)


if __name__ == "__main__":
    main()
