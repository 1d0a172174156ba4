"""Device-resident count table with amortized sort-merge compaction.

Replaces per-batch device->host result pulls (disastrous on tunneled/remote
TPUs and wasteful everywhere) with an on-device accumulator: per-batch
compacted uniques append to a device-side part list; when pending parts
outgrow the compacted table, everything concatenates and re-merges on device
(LSM-style doubling, amortized O(n log n) total). The distinct table leaves
the device exactly once, at finalize.

Count-width: parts carry uint32 counts. A single table epoch therefore must
see < 2^31 windows; :class:`DeviceTable` tracks this and the engine flushes
to the host u64 accumulator before overflow — exactness is preserved for
arbitrarily large inputs (reference saturation contract: src/run.rs:569).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .count import merge_runs

#: windows per epoch bound, with headroom below 2^32 (counts are uint32)
EPOCH_WINDOW_LIMIT = 1 << 31


def _round_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


class DeviceTable:
    """Accumulates (hi, lo, count) uniques on device across batches."""

    def __init__(self, k: int = 32, max_parts: int = 4):
        self._k = k  # enables sentinel-key merges (fewer sort operands)
        self._parts: list[tuple[jax.Array, jax.Array, jax.Array]] = []
        self._pending = 0
        self._table: tuple[jax.Array, jax.Array, jax.Array] | None = None
        self._table_entries = 0  # distinct entries in the compacted table
        self._max_parts = max_parts
        self.windows_this_epoch = 0

    def add(self, u_hi: jax.Array, u_lo: jax.Array, u_cnt: jax.Array, n_windows: int):
        """Append one batch's compacted uniques (zero-count tail = padding)."""
        self._parts.append((u_hi.reshape(-1), u_lo.reshape(-1), u_cnt.reshape(-1)))
        self._pending += u_hi.size
        self.windows_this_epoch += n_windows
        table_size = self._table[0].shape[0] if self._table is not None else 0
        # LSM-style trigger: let pending parts grow to ~2x the compacted table
        # (amortizes re-sorts) but bound the part list for memory
        if len(self._parts) >= self._max_parts or (
            table_size and self._pending >= 2 * table_size
        ):
            self._compact()

    def _concat(self):
        arrays = list(self._parts)
        if self._table is not None:
            arrays.append(self._table)
        hi = jnp.concatenate([a[0] for a in arrays])
        lo = jnp.concatenate([a[1] for a in arrays])
        cnt = jnp.concatenate([a[2] for a in arrays])
        # pad to a 4M-entry bucket: bounds jit recompiles without the up-to-2x
        # work a power-of-two bucket would add to the big final merge
        n = hi.shape[0]
        target = _round_up(n, 1 << 22) if n > (1 << 22) else _round_pow2(n)
        if target != n:
            pad = target - n
            hi = jnp.concatenate([hi, jnp.zeros(pad, jnp.uint32)])
            lo = jnp.concatenate([lo, jnp.zeros(pad, jnp.uint32)])
            cnt = jnp.concatenate([cnt, jnp.zeros(pad, jnp.uint32)])
        return hi, lo, cnt

    def _compact(self):
        if not self._parts and self._table is not None:
            return
        hi, lo, cnt = self._concat()
        m_hi, m_lo, m_cnt, n_m = merge_runs(hi, lo, cnt, self._k)
        n = int(n_m)  # one sync per compaction (amortized ~log(batches))
        keep = min(_round_pow2(max(n, 1)), m_hi.shape[0])
        self._table = (m_hi[:keep], m_lo[:keep], m_cnt[:keep])
        self._table_entries = n
        self._parts = []
        self._pending = 0

    def finalize(self) -> tuple[np.ndarray, np.ndarray]:
        """Compact and pull the distinct table to host: (codes u64, counts u64)."""
        if not self._parts and self._table is None:
            return np.zeros(0, np.uint64), np.zeros(0, np.uint64)
        self._compact()
        hi, lo, cnt = self._table
        n = self._table_entries
        hi_h = np.asarray(hi[:n], dtype=np.uint64)
        lo_h = np.asarray(lo[:n], dtype=np.uint64)
        cnt_h = np.asarray(cnt[:n], dtype=np.uint64)
        self._table = None
        self._table_entries = 0
        self.windows_this_epoch = 0
        return (hi_h << np.uint64(32)) | lo_h, cnt_h
