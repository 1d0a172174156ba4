"""Device probe: does a REAL u64 single-operand `lax.sort` beat the 2-key
u32 sort on this chip?

`benches/probe_r3.py`'s `sort_u64_unstable_134M` line was wrong: without
`jax_enable_x64`, `jnp.asarray(np.uint64 array)` silently downcasts to
uint32, so it re-measured the 1-operand u32 sort (1.62 ns/elem, identical
to the r2 number). This probe enables x64 BEFORE importing jax and
measures the genuine u64 sort, plus the (hi, lo) <-> u64 pack/split
elementwise conversions the epoch path would need around it, so the
all-in cost can be compared against the measured 2-key 3.07 ns/elem.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/krust_jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from probe_r3 import bench_chain  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    n = 1 << 27
    print(f"devices: {jax.devices()}", flush=True)

    a = jnp.asarray(rng.integers(0, 1 << 30, n, np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 30, n, np.uint32))

    # the genuine u64 sort (device-side combine so only u32 crosses the
    # link). The op maps (hi, lo) -> (hi', lo') so the chain is
    # type-stable, and every iteration pays pack + sort + split — exactly
    # the per-epoch cost the production path would pay.
    def sort_via_u64(xy):
        h, l = xy
        u = (h.astype(jnp.uint64) << 32) | l.astype(jnp.uint64)
        (s,) = jax.lax.sort((u,), num_keys=1, is_stable=False)
        return ((s >> 32).astype(jnp.uint32), s.astype(jnp.uint32))

    t = bench_chain(sort_via_u64, (a, b))
    print(f"sort_u64_real_{n>>20}M: {t/n*1e9:.3f} ns/elem (incl pack+split)", flush=True)

    # control: the 2-key u32 sort at the same n on this run
    t = bench_chain(
        lambda xy: jax.lax.sort(xy, num_keys=2, is_stable=False), (a, b)
    )
    print(f"sort_2key_unstable_{n>>20}M: {t/n*1e9:.3f} ns/elem", flush=True)

    # isolated pack + split conversion cost (no sort)
    def pack_split(xy):
        h, l = xy
        u = (h.astype(jnp.uint64) << 32) | l.astype(jnp.uint64)
        return ((u >> 32).astype(jnp.uint32), u.astype(jnp.uint32))

    t = bench_chain(pack_split, (a, b))
    print(f"pack_split_u64_{n>>20}M: {t/n*1e9:.3f} ns/elem", flush=True)


if __name__ == "__main__":
    main()
