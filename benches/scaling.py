"""Multi-chip scaling-efficiency harness (BASELINE.md target: >= 85%).

Weak scaling: fixed windows PER DEVICE, meshes of 1/2/4/8 devices, the full
sharded pipeline (data-parallel codec -> per-chip epoch tables -> one
hash-sharded all-to-all -> host gather). Efficiency_n = T_1 / T_n with
per-device work held constant (ideal = 1.0).

On this rig only virtual CPU devices are available (one real TPU chip), so
the numbers characterize the orchestration overhead and collective volume,
not ICI hardware — the harness is the methodology that runs unchanged on a
real pod slice. Run: KRUST_PLATFORM=cpu python benches/scaling.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    from krust_tpu.io.reader import ParsedStreams
    from krust_tpu.kmer import INVALID_CODE
    from krust_tpu.models.engines import NumpyEngine
    from krust_tpu.parallel.mesh import make_mesh
    from krust_tpu.parallel.sharded import count_sharded
    from krust_tpu.utils.config import EngineConfig

    k = 21
    rng = np.random.default_rng(0)
    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8) if n <= n_avail]

    def make_streams(n_bases):
        codes = rng.integers(0, 4, n_bases, np.uint8)
        codes[rng.random(n_bases) < 0.001] = INVALID_CODE
        return ParsedStreams(codes, None, 1, n_bases)

    # CPU meshes: interpret-mode Pallas kernels run in pure Python and
    # would swamp the measurement; the XLA table path exercises the same
    # orchestration/collectives. Real TPU meshes use the production core.
    on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
    per_dev_bases = int(
        os.environ.get("SCALE_BASES_PER_DEV", 2_000_000 if on_tpu else 400_000)
    )
    cfg = EngineConfig(
        block_windows=4096, batch_rows=256, use_epoch_sort=on_tpu
    )
    if not on_tpu:
        print(
            "# NOTE: virtual CPU devices share one physical core — weak\n"
            "# scaling MUST degrade ~1/n here. This run only validates the\n"
            "# harness + exactness; efficiency numbers are meaningful solely\n"
            "# on real multi-chip hardware.",
            flush=True,
        )
    results = {}
    t1 = None
    for n in sizes:
        streams = make_streams(per_dev_bases * n)
        mesh = make_mesh(n)
        count_sharded(streams, k, mesh=mesh, config=cfg)  # warmup/compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = count_sharded(streams, k, mesh=mesh, config=cfg)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        if n == 1:
            t1 = t
            exp = NumpyEngine().count(streams, k)
            assert np.array_equal(res.codes, exp.codes), "exactness"
        eff = t1 / t if t1 else 1.0
        results[n] = (t, eff)
        print(
            f"devices={n} bases={per_dev_bases * n} wall={t:.2f}s "
            f"weak_scaling_efficiency={eff:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
