"""Round-4 device probes (TPU v5e, tunneled rig).

Measures the round-4 kernel work against the recorded r2/r3 costs, with
the same methodology as benches/probe_r3.py (chained jits to amortize the
~60 ms tunnel RTT, 1-element readback to force execution):

1. One-key `rle_compact` (k <= 16: no hi plane) vs the 2-plane kernel —
   projection: ~1/3 less DMA + route work on the epoch-flush volume.
2. `merge_sorted_lv` (one-key part merge) vs `merge_sorted_kv` —
   projection: 2/3 of the DMA planes, 3/4 of the network operands.
3. The pack-doubling codec (O(log k) combines) absolute cost per window
   at production shapes, k in {16, 21, 32} — against ROADMAP's ~1.17
   ns/base share estimate for the r3 rolling codec.

Run on a healthy tunnel and commit the output beside ROADMAP's cost
table (VERDICT r3 item #2). KRUST_PROBE_SMALL=1 shrinks sizes and runs
the kernels in interpret mode for an off-chip smoke check.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/krust_jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# honor KRUST_PLATFORM before any backend init (sitecustomize pins the
# accelerator platform; the smoke path must not touch the tunnel)
if os.environ.get("KRUST_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["KRUST_PLATFORM"])
import jax
import jax.numpy as jnp
import numpy as np

from probe_r3 import bench_chain, bench_once  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    small = bool(os.environ.get("KRUST_PROBE_SMALL"))
    interp = {"interpret": True} if small else {}
    print(f"devices: {jax.devices()}", flush=True)

    # --- one-key vs 2-plane rle_compact at 268M -----------------------------
    from krust_tpu.ops.pallas_rle import rle_compact

    m = 1 << (12 if os.environ.get("KRUST_PROBE_SMALL") else 28)
    lo_np = np.sort(rng.integers(0, m // 4, m).astype(np.uint32))
    lo = jnp.asarray(lo_np)
    hi = jnp.zeros(m, jnp.uint32)
    del lo_np
    t, n_u = bench_once(lambda: rle_compact(None, lo, one_key=True, **interp))
    print(f"rle_compact_1key_268M: {t/m*1e9:.3f} ns/elem ({t*1e3:.0f} ms, "
          f"n_unique={n_u})", flush=True)
    t, _ = bench_once(lambda: rle_compact(hi, lo, **interp))
    print(f"rle_compact_2plane_268M: {t/m*1e9:.3f} ns/elem ({t*1e3:.0f} ms)",
          flush=True)
    del hi

    # weighted one-key at 134M
    mh = m // 2
    lo_s = lo[:mh]
    del lo
    w = jnp.asarray(rng.integers(1, 100, mh).astype(np.uint32))
    t, _ = bench_once(lambda: rle_compact(None, lo_s, w, one_key=True, **interp))
    print(f"rle_compact_1key_weighted_134M: {t/mh*1e9:.3f} ns/elem "
          f"({t*1e3:.0f} ms)", flush=True)
    del lo_s, w

    # --- merge_sorted_lv vs merge_sorted_kv at 2x67M ------------------------
    from krust_tpu.ops.pallas_merge import merge_sorted_kv, merge_sorted_lv

    n = 1 << (12 if os.environ.get("KRUST_PROBE_SMALL") else 27)
    b = jnp.asarray(rng.integers(0, 1 << 30, n, np.uint32))
    l1 = jnp.sort(b[: n // 2])
    l2 = jnp.sort(b[n // 2 :])
    wc = jnp.ones(n // 2, jnp.uint32)

    def mk_lv(args):
        l1, l2 = args
        o_l, o_c = merge_sorted_lv(l1, wc, l2, wc, **interp)
        return jnp.sort(o_l[: n // 2]), jnp.sort(o_l[n // 2 :])

    t = bench_chain(mk_lv, (l1, l2))
    print(f"merge_sorted_lv_134M: {t/n*1e9:.3f} ns/elem ({t*1e3:.0f} ms; "
          "includes a re-sort per chain step)", flush=True)

    zh = jnp.zeros(n // 2, jnp.uint32)

    def mk_kv(args):
        l1, l2 = args
        o_h, o_l, o_c = merge_sorted_kv(zh, l1, wc, zh, l2, wc, **interp)
        return jnp.sort(o_l[: n // 2]), jnp.sort(o_l[n // 2 :])

    t = bench_chain(mk_kv, (l1, l2))
    print(f"merge_sorted_kv_zero_hi_134M: {t/n*1e9:.3f} ns/elem "
          f"({t*1e3:.0f} ms; same re-sort overhead)", flush=True)
    del l1, l2, wc, zh, b

    # --- pack-doubling codec at production shapes ---------------------------
    from krust_tpu.ops.pallas_codec import encode_blocks_pallas

    rows, wweb = (8, 256) if os.environ.get("KRUST_PROBE_SMALL") else (8192, 4096)
    for k in (16, 21, 32):
        codes = jnp.asarray(
            rng.integers(0, 4, (rows, wweb + k - 1), np.uint8)
        )
        n_win = rows * wweb

        t0 = time.perf_counter()
        h, l, v = encode_blocks_pallas(codes, k, **interp)
        np.asarray(l.ravel()[:1])
        print(f"  (codec k={k} warm+compile {time.perf_counter()-t0:.1f}s)",
              flush=True)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            h, l, v = encode_blocks_pallas(codes, k, **interp)
            np.asarray(l.ravel()[:1])
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"codec_doubling_k{k}_{rows}x{wweb}: {t/n_win*1e9:.3f} ns/window "
              f"({t*1e3:.0f} ms)", flush=True)
        del codes, h, l, v


if __name__ == "__main__":
    main()
