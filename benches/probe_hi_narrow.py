"""Device probe: does narrowing the hi operand's dtype cut the 2-key sort?

The epoch sort for k in 17..=32 is `lax.sort((hi, lo), num_keys=2)` on two
u32 planes (3.07 ns/elem measured at 134M).  But hi only carries
2*(k-16) significant bits: <= 8 bits for k <= 20, <= 16 bits for k <= 24.
If the sort's cost scales with operand *bytes* (data movement through the
merge network), an (u8|u16 hi, u32 lo) sort would cost 5/6 bytes per
element instead of 8 — up to ~1.6x on the dominant phase at k <= 20 and
~1.33x at k = 21..24 — for a pure dtype change around the existing
kernels.  This probe measures whether the win is real before any wiring.
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
    n = 1 << 27
    print(f"devices: {jax.devices()}", flush=True)

    # k=21-shaped keys: hi uniform in [0, 1024), lo uniform u32
    hi = rng.integers(0, 1 << 10, n, np.uint32)
    lo = rng.integers(0, 1 << 32, n, np.uint64).astype(np.uint32)

    def sort2(xy):
        return jax.lax.sort(xy, num_keys=2, is_stable=False)

    for name, h in (
        ("u32", jnp.asarray(hi)),
        ("u16", jnp.asarray(hi.astype(np.uint16))),
        ("u8", jnp.asarray((hi & 0xFF).astype(np.uint8))),
    ):
        t = bench_chain(sort2, (h, jnp.asarray(lo)))
        print(
            f"sort_2key_hi_{name}_{n>>20}M: {t/n*1e9:.3f} ns/elem",
            flush=True,
        )

    # control: the 1-key u32 sort (the k <= 16 path) at the same n
    t = bench_chain(
        lambda xy: jax.lax.sort(xy, num_keys=1, is_stable=False),
        (jnp.asarray(lo),),
    )
    print(f"sort_1key_u32_{n>>20}M: {t/n*1e9:.3f} ns/elem", flush=True)


if __name__ == "__main__":
    main()
