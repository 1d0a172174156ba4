"""On-chip probe: fused packed-bytes codec vs the unfused unpack+encode step.

Round-5 kernel (ops/pallas_fused.py): one Pallas kernel consumes the packed
2-bit bytes directly, eliminating the [rows, W + k - 1] uint8 block tensor
that unpack_flat_blocks materialized in HBM between the two old stages
(VERDICT r4 weak #2). This probe, per k in {16, 21, 31}:

  1. verifies compiled-mode exactness at batch scale: sorted sentinel
     outputs of the fused step == the unfused step's, on real bench-shaped
     data with invalid separators;
  2. times both steps (one batch, 33.5M windows) and the fused step with
     all batches queued.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/krust_jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timed(label, fn, iters=2):
    fn()  # warm/compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn()
        sync(r)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)*1e3:.1f} ms", flush=True)
    return min(ts)


def main():
    from bench import make_reads, reads_to_stream
    from krust_tpu.io.packer import flat_batches
    from krust_tpu.models.engines import _count_flat_step
    from krust_tpu.utils.config import EngineConfig

    print(f"devices: {jax.devices()}", flush=True)
    cfg = EngineConfig()
    rng = np.random.default_rng(0)
    reads = make_reads(rng, 128_000_000)
    stream = reads_to_stream(reads)
    n_w = cfg.batch_rows * cfg.block_windows

    for k in (16, 21, 31):
        batches = list(
            flat_batches(stream, None, k, None, cfg.block_windows, cfg.batch_rows)
        )
        staged = []
        for b in batches:
            p2 = jax.device_put(jnp.asarray(b.packed2))
            iv = jax.device_put(jnp.asarray(b.invpos))
            staged.append((p2, iv, b))
        sync(staged[-1][0])
        print(f"k={k}: {len(batches)} batches, n_inv[0]={batches[0].n_invalid}",
              flush=True)

        def step(i, fused):
            p2, iv, b = staged[i]
            return _count_flat_step(
                p2, iv, np.int32(b.covered), k, b.rows, b.block_windows,
                True, "raw_sent", fused,
            )

        # compiled-mode exactness at batch scale: sort both sentinel
        # outputs ON DEVICE and pull one bool (the naive host pull is
        # 536MB over the tunnel). k <= 16 parts are lo-only 1-tuples.
        @jax.jit
        def same(a, b):
            sa = jax.lax.sort(tuple(x.reshape(-1) for x in a), num_keys=len(a))
            sb = jax.lax.sort(tuple(x.reshape(-1) for x in b), num_keys=len(b))
            ok = jnp.bool_(True)
            for x, y in zip(sa, sb):
                ok &= jnp.array_equal(x, y)
            return ok

        ok = bool(same(step(0, False), step(0, True)))
        assert ok, f"fused != unfused at k={k}"
        print(f"  exactness: OK ({n_w} windows)", flush=True)

        t_u = timed(f"  unfused step x1 (k={k})", lambda: step(0, False))
        t_f = timed(f"  fused   step x1 (k={k})", lambda: step(0, True))
        print(
            f"  -> unfused {t_u/n_w*1e9:.3f} ns/window, "
            f"fused {t_f/n_w*1e9:.3f} ns/window ({t_u/t_f:.2f}x)",
            flush=True,
        )

        def all_fused():
            outs = [step(i, True) for i in range(len(staged))]
            return outs[-1]

        t_all = timed(f"  fused all_queued (k={k})", all_fused)
        print(f"  -> {t_all/(n_w*len(staged))*1e9:.3f} ns/window", flush=True)


if __name__ == "__main__":
    main()
