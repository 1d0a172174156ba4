"""Repro: Mosaic miscompiles the round-4 pair-carry codec at k=25..31.

Round-5 finding (see probe_mosaic_paircarry_r5.txt): the round-4
pack-doubling codec kernel carried a (hi, lo) uint32 pair through its
final shift-or combines; compiled TPU output diverged from interpret mode
(and the jnp oracle) for exactly the k values needing >= 2 pair combines
(k=25..31), while k=24/32 (<= 1 pair combine) were exact.

A distilled bare combine chain does NOT reproduce (measured: 0/4096
mismatches) — the trigger needs the full kernel context (the doubling
partials' shrinking unaligned slices feeding the chain). This script
therefore loads the EXACT pre-fix kernel from git history
(`git show <fix>~1:krust_tpu/ops/pallas_codec.py`) and compares its
compiled vs interpret output at k=25 on an 8x512 tile: nonzero
mismatches on the TPU this was isolated on (v5e, jax 0.8 era); zero once
the underlying Mosaic issue is fixed. Falls back to a SKIP message when
the history file is unavailable (shallow clone).

Run: python benches/repro_mosaic_paircarry.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/krust_jax_cache")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIX_COMMIT_SUBJECT = "Fix Mosaic pair-carry miscompile"


def _old_kernel_source() -> str | None:
    try:
        rev = subprocess.run(
            ["git", "log", "--format=%H", "--grep", FIX_COMMIT_SUBJECT, "-n", "1"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout.strip()
        if not rev:
            return None
        return subprocess.run(
            ["git", "show", f"{rev}~1:krust_tpu/ops/pallas_codec.py"],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout
    except Exception:
        return None


def main() -> int:
    import importlib.util

    import jax
    import numpy as np

    src = _old_kernel_source()
    if src is None:
        print("SKIP: pre-fix kernel not reachable in git history", flush=True)
        return 0
    with tempfile.NamedTemporaryFile(
        "w", suffix="_old_pallas_codec.py", delete=False
    ) as f:
        f.write(src)
        path = f.name
    spec = importlib.util.spec_from_file_location("old_pallas_codec", path)
    old = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(old)

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(3)
    k = 25
    codes = rng.integers(0, 5, size=(8, 512 + k - 1), dtype=np.uint8)
    import jax.numpy as jnp

    c = jnp.asarray(codes)
    hi_c, lo_c, _ = old.encode_blocks_pallas(c, k, None, None, interpret=False)
    hi_i, lo_i, _ = old.encode_blocks_pallas(c, k, None, None, interpret=True)
    bad = (np.asarray(hi_c) != np.asarray(hi_i)) | (
        np.asarray(lo_c) != np.asarray(lo_i)
    )
    nmis = int(bad.sum())
    print(
        f"pre-fix kernel, k={k}: compiled vs interpret mismatches: "
        f"{nmis} / {bad.size}",
        flush=True,
    )
    if nmis:
        i, j = (int(x) for x in np.argwhere(bad)[0])
        print(
            f"first: compiled=({int(np.asarray(hi_c)[i, j]):#x},"
            f"{int(np.asarray(lo_c)[i, j]):#x}) interpret="
            f"({int(np.asarray(hi_i)[i, j]):#x},"
            f"{int(np.asarray(lo_i)[i, j]):#x})",
            flush=True,
        )
    # the SHIPPED kernel must agree with itself compiled-vs-interpret
    from krust_tpu.ops.pallas_codec import encode_blocks_pallas as new_kernel

    nh_c, nl_c, _ = new_kernel(c, k, None, None, interpret=False)
    nh_i, nl_i, _ = new_kernel(c, k, None, None, interpret=True)
    fixed_ok = bool(
        np.array_equal(np.asarray(nh_c), np.asarray(nh_i))
        and np.array_equal(np.asarray(nl_c), np.asarray(nl_i))
    )
    print(f"shipped (independent-plane) kernel exact: {fixed_ok}", flush=True)
    os.unlink(path)
    return 0 if (nmis and fixed_ok) else (0 if fixed_ok else 1)


if __name__ == "__main__":
    sys.exit(main())
