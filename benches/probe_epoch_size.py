"""Device probe: does a smaller epoch pay at high duplication?

The epoch sort's per-element cost scales with log n (measured: 2-op u32
2.26/2.56/3.07 ns/elem at 8M/32M/128M).  Smaller epochs sort cheaper but
produce more compacted parts, which pay the weighted merge + recompaction
chain (0.807 + 0.64 ns/elem measured) on the COMPACTED volume — so the
trade is governed by the duplication ratio: at 32x-coverage read data the
compacted parts are ~1/16 of raw and the merge chain is nearly free,
while at 1x (single genome) compacted ~= raw and small epochs lose.

This probe measures the narrowed-hi (u16, u32) sort across epoch sizes
to anchor the adaptive-epoch decision with this rework's actual operand
mix (the published scaling row is u32/u32).
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/krust_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from probe_r3 import bench_chain  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    def sort2(xy):
        return jax.lax.sort(xy, num_keys=2, is_stable=False)

    for logn in (23, 25, 27):
        n = 1 << logn
        hi = jnp.asarray(rng.integers(0, 1 << 10, n).astype(np.uint16))
        lo = jnp.asarray(
            rng.integers(0, 1 << 32, n, np.uint64).astype(np.uint32)
        )
        t = bench_chain(sort2, (hi, lo))
        print(
            f"sort_2key_hi_u16_{n>>20}M: {t/n*1e9:.3f} ns/elem",
            flush=True,
        )


if __name__ == "__main__":
    main()
