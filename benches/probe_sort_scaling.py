"""Sort-cost scaling probe: flat `lax.sort` vs n, and the row-sort matrix.

Feeds the F-way merge decision (ROADMAP "Next steps" item 3): the flat
2-op sort's per-element cost vs n tells how much a chunked first level
saves, and the row-sort geometry matrix bounds what a short-row first
level + merge tree could reach. All 2-operand (the k>16 regime that the
F-way kernel would target).
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/krust_jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from probe_r3 import bench_chain  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    for logn in (23, 25, 27):
        n = 1 << logn
        a = jnp.asarray(rng.integers(0, 1 << 30, n, np.uint32))
        b = jnp.asarray(rng.integers(0, 1 << 30, n, np.uint32))
        t = bench_chain(
            lambda xy: jax.lax.sort(xy, num_keys=2, is_stable=False), (a, b)
        )
        print(f"sort_2key_flat_{n>>20}M: {t/n*1e9:.3f} ns/elem", flush=True)
        del a, b

    n = 1 << 27
    a = jnp.asarray(rng.integers(0, 1 << 30, n, np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 30, n, np.uint32))
    for rows in (1024, 4096, 16384, 65536):
        cols = n // rows
        ar = a.reshape(rows, cols)
        br = b.reshape(rows, cols)
        t = bench_chain(
            lambda xy: jax.lax.sort(xy, dimension=1, num_keys=2, is_stable=False),
            (ar, br),
        )
        print(
            f"sort_2key_rows_[{rows},{cols}]: {t/n*1e9:.3f} ns/elem", flush=True
        )


if __name__ == "__main__":
    main()
