"""Output formatting (reference: src/run.rs:441-486, src/cli.rs:90-101).

Formats:
  fasta      ``>{count}\\n{kmer}`` per entry
  tsv        ``{kmer}\\t{count}`` per entry
  json       pretty-printed array of ``{"kmer": ..., "count": ...}``
  histogram  ``{count}\\t{frequency}`` ascending by count, computed AFTER
             min-count filtering (reference: src/run.rs:471-481)

Entry order for fasta/tsv/json is unspecified in the reference (HashMap
iteration); we emit insertion order of the mapping we're given.
"""

from __future__ import annotations

import enum
import json
import sys
from typing import Mapping, TextIO

from .histogram import compute_histogram


class OutputFormat(enum.Enum):
    FASTA = "fasta"
    TSV = "tsv"
    JSON = "json"
    HISTOGRAM = "histogram"

    def __str__(self) -> str:
        return self.value


def output_counts(
    counts: Mapping[str, int],
    fmt: OutputFormat = OutputFormat.FASTA,
    min_count: int = 1,
    out: TextIO | None = None,
) -> None:
    """Write counts to ``out`` (default stdout) in the requested format.

    ``min_count`` filters entries below the threshold at output time
    (reference: src/run.rs:447-450).
    """
    out = out if out is not None else sys.stdout
    filtered = (
        counts
        if min_count <= 1
        else {kmer: c for kmer, c in counts.items() if c >= min_count}
    )

    if fmt is OutputFormat.FASTA:
        chunks = [f">{c}\n{kmer}\n" for kmer, c in filtered.items()]
        out.write("".join(chunks))
    elif fmt is OutputFormat.TSV:
        chunks = [f"{kmer}\t{c}\n" for kmer, c in filtered.items()]
        out.write("".join(chunks))
    elif fmt is OutputFormat.JSON:
        data = [{"kmer": kmer, "count": c} for kmer, c in filtered.items()]
        json.dump(data, out, indent=2)
        out.write("\n")
    elif fmt is OutputFormat.HISTOGRAM:
        hist = compute_histogram(filtered)
        chunks = [f"{c}\t{f}\n" for c, f in hist.items()]
        out.write("".join(chunks))
    else:  # pragma: no cover
        raise ValueError(f"unknown output format: {fmt}")
    out.flush()
