"""On-chip probe: fused-codec kernel tile geometry.

The fused codec step measures ~37 ms per 33.5M-window batch while its raw
VPU op count (~25-30 ops/window) and HBM traffic (~300 MB/batch) both
price out well under 5 ms — the kernel is bound by neither, suggesting
lowering/occupancy losses. One suspect: uint8 inputs tile at 32 sublanes
on TPU, so TILE_ROWS=8 tiles quarter-fill the sublane dimension.

Times the bare kernel (no step machinery) at bench geometry
[8192 rows x 1024 packed bytes] for TILE_ROWS in {8, 16, 32}, k in
{16, 21}. jax caches are cleared between settings (TILE_ROWS is read at
trace time).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/krust_jax_cache_tile")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

ROWS, W4 = 8192, 1024
N_W = ROWS * W4 * 4


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timed(fn, iters=3):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn()
        sync(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import krust_tpu.ops.pallas_fused as pf

    print(f"devices: {jax.devices()}  [{ROWS}x{W4}] = {N_W>>20}M windows",
          flush=True)
    rng = np.random.default_rng(0)
    main_np = rng.integers(0, 256, (ROWS, W4), np.uint8)
    halo_np = rng.integers(0, 256, (ROWS, pf.HALO_BYTES), np.uint8)
    bad_np = (rng.random((ROWS, 4 * W4)) < 0.01).astype(np.uint8)

    main_d = jax.device_put(jnp.asarray(main_np))
    halo_d = jax.device_put(jnp.asarray(halo_np))
    bad_d = jax.device_put(jnp.asarray(bad_np))
    sync((main_d, halo_d, bad_d))

    ref = {}
    for tile in (8, 16, 32):
        pf.TILE_ROWS = tile
        jax.clear_caches()
        for k in (16, 21):
            try:
                emit_hi = k > 16
                t = timed(
                    lambda: pf.encode_packed_pallas(
                        main_d, halo_d, k, False, bad_d, emit_hi=emit_hi
                    )
                )
                out = pf.encode_packed_pallas(
                    main_d, halo_d, k, False, bad_d, emit_hi=emit_hi
                )
                lo = out[1] if emit_hi else out
                h = int(jnp.bitwise_xor.reduce(lo.ravel()[:: 4097]))
                status = ""
                if (k in ref) and ref[k] != h:
                    status = "  HASH MISMATCH vs tile=8!"
                ref.setdefault(k, h)
                print(
                    f"tile={tile} k={k}: {t*1e3:.1f} ms = "
                    f"{t/N_W*1e9:.3f} ns/window{status}",
                    flush=True,
                )
            except Exception as e:
                print(f"tile={tile} k={k}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
