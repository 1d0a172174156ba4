"""Per-step breakdown of the finalize pull at the bench shape.

bench_r4_tpu.json measured finalize = 1.50 s for a 4M-distinct / k=21
table where the link budget predicts ~0.6 s (16 MB of 3-byte deltas +
u8 counts at the ~28 MB/s measured d2h rate). This probe builds the same
table state synthetically (4M sorted unique 42-bit codes, counts ~30)
and times each finalize step with syncs:

  pull_delta_dev  - the device-side delta/count encode
  d2h_pull        - np.asarray of the 16 MB uint8 buffer (the raw link)
  d2h_raw_ctrl    - np.asarray of an equally-sized fresh uint8 array
  decode_host     - _codes_from_deltas + _resolve_saturated on host
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/krust_jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from krust_tpu.ops.table import (
        _DELTA_EXC,
        _pull_delta,
        _pull_size,
        DeviceTable,
    )

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    n = 4_000_000
    k = 21
    codes = np.sort(
        rng.choice(1 << (2 * k), size=n, replace=False).astype(np.uint64)
    )
    t_hi = jnp.asarray((codes >> 32).astype(np.uint32))
    t_lo = jnp.asarray((codes & 0xFFFFFFFF).astype(np.uint32))
    t_cnt = jnp.asarray(rng.poisson(29.0, n).astype(np.uint32))
    cap = _pull_size(n, n)
    print(f"n={n} cap={cap}", flush=True)

    # device encode (kept on device)
    f = jax.jit(lambda h, l, c: _pull_delta(h, l, c, cap))
    buf = f(t_hi, t_lo, t_cnt)
    buf.block_until_ready()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        f(t_hi, t_lo, t_cnt).block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"pull_delta_dev: {min(ts)*1e3:.0f} ms ({buf.nbytes/1e6:.1f} MB buffer)", flush=True)

    # the d2h pull itself
    ts = []
    for _ in range(3):
        buf = f(t_hi, t_lo, t_cnt)
        buf.block_until_ready()
        t0 = time.perf_counter()
        host = np.asarray(buf)
        ts.append(time.perf_counter() - t0)
        print(f"  d2h_pull: {ts[-1]:.2f} s -> {buf.nbytes/1e6/ts[-1]:.1f} MB/s", flush=True)

    # control: same bytes as a fresh on-device array
    ctrl = jnp.zeros(buf.nbytes, jnp.uint8) + jnp.uint8(7)
    ctrl.block_until_ready()
    for _ in range(2):
        t0 = time.perf_counter()
        _ = np.asarray(ctrl)
        dt = time.perf_counter() - t0
        print(f"  d2h_raw_ctrl: {dt:.2f} s -> {ctrl.nbytes/1e6/dt:.1f} MB/s", flush=True)

    # host decode
    tbl = DeviceTable.__new__(DeviceTable)
    tbl._k = k
    db = host[: 3 * cap].reshape(cap, 3)[:n].astype(np.uint32)
    cnt8 = host[3 * cap : 4 * cap][:n]
    t0 = time.perf_counter()
    deltas = db[:, 0] | (db[:, 1] << 8) | (db[:, 2] << 16)
    out = tbl._codes_from_deltas(deltas, _DELTA_EXC, t_hi, t_lo, n)
    dt = time.perf_counter() - t0
    exact = bool(np.array_equal(out, codes))
    print(f"decode_host: {dt*1e3:.0f} ms (exact={exact})", flush=True)
    t0 = time.perf_counter()
    counts = tbl._resolve_saturated(t_cnt, cnt8, n)
    dt = time.perf_counter() - t0
    print(
        f"resolve_saturated: {dt*1e3:.0f} ms "
        f"(sat={int((cnt8 == 0xFF).sum())}, exact={bool(np.array_equal(counts, np.asarray(t_cnt, np.uint64)))})",
        flush=True,
    )


if __name__ == "__main__":
    main()
