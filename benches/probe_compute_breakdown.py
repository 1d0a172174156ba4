"""Per-stage breakdown of the engine's on-chip compute phase at k=21.

bench_r4_tpu.json measured compute=1.48 s for 117.76M windows where the
kernel cost table projects ~0.6 s (codec 0.80 ns/window + 2-op sort 3.07
ns/elem + rle 0.52 ns/elem). This probe replays the exact staged-pass
compute loop (device-resident inputs, same `_count_flat_step` +
`EpochTable` path as bench.py's `_staged_pass`) with a blocking sync after
every stage, so the missing time is attributed:

  batch_step   - unpack_flat_blocks + pallas codec + sentinel where (x4)
  concat       - epoch concatenation of the raw parts
  sort_rle     - the flat 2-op sort + fused RLE kernel
  (plus each component of batch_step timed standalone)

Run on a healthy tunnel; each sync pays the ~60 ms RTT once, which is
noted but not subtracted.
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

K = 21


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
    from krust_tpu.io.reader import ParsedStreams
    from krust_tpu.models.engines import _count_flat_step
    from krust_tpu.ops.table import _epoch_sort_rle
    from krust_tpu.utils.config import EngineConfig

    print(f"devices: {jax.devices()}", flush=True)
    cfg = EngineConfig()
    rng = np.random.default_rng(0)
    reads = make_reads(rng, 128_000_000)
    streams = ParsedStreams(
        reads_to_stream(reads), None, reads.shape[0], reads.size
    )
    batches = list(
        flat_batches(streams.codes, None, K, None, cfg.block_windows, cfg.batch_rows)
    )
    print(f"batches: {len(batches)} x {cfg.batch_rows}x{cfg.block_windows}", flush=True)
    staged = []
    for b in batches:
        p2 = jax.device_put(jnp.asarray(b.packed2))
        iv = jax.device_put(jnp.asarray(b.invpos))
        staged.append((p2, iv, b))
    sync(staged[-1][0])

    def one_batch(i):
        p2, iv, b = staged[i]
        return _count_flat_step(
            p2, iv, np.int32(b.covered), K, b.rows, b.block_windows, True, "raw_sent"
        )

    # full batch step, per batch
    t_bs = timed("batch_step_x1 (33.5M windows)", lambda: one_batch(0))
    n_w = cfg.batch_rows * cfg.block_windows
    print(f"  -> {t_bs/n_w*1e9:.3f} ns/window", flush=True)

    # components
    from krust_tpu.ops.codec import unpack_flat_blocks
    from krust_tpu.ops.pallas_codec import encode_blocks_pallas

    p2, iv, b = staged[0]
    unp = jax.jit(
        lambda p2, iv: unpack_flat_blocks(p2, iv, K, b.rows, b.block_windows)
    )
    t_u = timed("  unpack_flat_blocks", lambda: unp(p2, iv))
    blocks = unp(p2, iv)
    sync(blocks)
    enc = jax.jit(lambda bl: encode_blocks_pallas(bl, K, None, None))
    t_e = timed("  encode_blocks_pallas", lambda: enc(blocks))
    print(f"  -> codec {t_e/n_w*1e9:.3f} ns/window", flush=True)

    # all 4 batch steps queued, one sync (as the engine runs them)
    def all_batches():
        outs = [one_batch(i) for i in range(len(staged))]
        return outs[-1]

    t_all = timed("batch_step_all_queued", all_batches)
    print(f"  -> {t_all/(n_w*len(staged))*1e9:.3f} ns/window", flush=True)

    # epoch: concat + sort + rle on the actual raw parts
    outs = [one_batch(i) for i in range(len(staged))]
    his = [o[0] for o in outs]
    los = [o[1] for o in outs]
    cat = jax.jit(lambda hs, ls: (jnp.concatenate(hs), jnp.concatenate(ls)))
    t_c = timed("epoch_concat", lambda: cat(his, los))
    hi, lo = cat(his, los)
    sync((hi, lo))
    n = hi.shape[0]
    print(f"  epoch n = {n/1e6:.1f}M", flush=True)
    t_s = timed("epoch_sort_rle", lambda: _epoch_sort_rle(hi, lo, K, False))
    print(f"  -> {t_s/n*1e9:.3f} ns/elem", flush=True)

    total = t_all + t_c + t_s
    print(f"sum (all batches queued + concat + sort_rle): {total*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
