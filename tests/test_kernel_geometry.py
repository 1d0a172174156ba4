"""Cross-geometry kernel stress: chunk sizes change carry/boundary paths.

The rle/merge kernel suites pin KRUST_RLE_CHUNK / KRUST_MERGE_CHUNK to
1024/2048 via conftest; these subprocess sweeps re-run randomized
differentials at other window geometries, where chunk-boundary carries,
lookahead rows, and the dynamic-offset emission land differently.
Slow lane (subprocess per geometry).
"""

import os
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RLE_SNIPPET = textwrap.dedent(
    """
    import numpy as np, jax.numpy as jnp
    from krust_tpu.ops import pallas_rle
    CH = pallas_rle.CH
    rng = np.random.default_rng(CH)
    for trial in range(4):
        n = int(rng.integers(1, 4 * CH))
        lo = np.sort(rng.integers(0, max(n // 3, 2), n).astype(np.uint32))
        pad = int(rng.integers(0, CH))
        lo_p = np.concatenate([lo, np.full(pad, 0xFFFFFFFF, np.uint32)])
        w = rng.integers(1, 50, n).astype(np.uint32)
        w_p = np.concatenate([w, np.zeros(pad, np.uint32)])
        o_hi, o_lo, o_cnt, nu = pallas_rle.rle_compact(
            None, jnp.asarray(lo_p), interpret=True, one_key=True)
        uq, cn = np.unique(lo, return_counts=True)
        assert int(nu) == uq.shape[0]
        assert np.array_equal(np.asarray(o_lo[:int(nu)]), uq)
        assert np.array_equal(np.asarray(o_cnt[:int(nu)]), cn.astype(np.uint32))
        o_hi, o_lo, o_cnt, nu = pallas_rle.rle_compact(
            None, jnp.asarray(lo_p), jnp.asarray(w_p), interpret=True,
            one_key=True)
        exp = np.zeros(uq.shape[0], np.uint32)
        np.add.at(exp, np.searchsorted(uq, lo), w)
        assert np.array_equal(np.asarray(o_cnt[:int(nu)]), exp)
    print("OK")
    """
)

_MERGE_SNIPPET = textwrap.dedent(
    """
    import numpy as np, jax.numpy as jnp
    from krust_tpu.ops import pallas_merge
    MC = pallas_merge.CH
    rng = np.random.default_rng(MC)
    for trial in range(3):
        ma, mb = int(rng.integers(1, 3 * MC)), int(rng.integers(1, 3 * MC))
        al = np.sort(rng.integers(0, 1000, ma).astype(np.uint32))
        bl = np.sort(rng.integers(0, 1000, mb).astype(np.uint32))
        ac = rng.integers(1, 30, ma).astype(np.uint32)
        bc = rng.integers(1, 30, mb).astype(np.uint32)
        ol, oc = pallas_merge.merge_sorted_lv(
            jnp.asarray(al), jnp.asarray(ac), jnp.asarray(bl),
            jnp.asarray(bc), interpret=True)
        ol, oc = np.asarray(ol), np.asarray(oc)
        assert np.array_equal(ol, np.sort(np.concatenate([al, bl])))
        keys = np.concatenate([al, bl]); cnts = np.concatenate([ac, bc])
        uq = np.unique(keys)
        exp = np.zeros(uq.shape[0], np.uint64)
        np.add.at(exp, np.searchsorted(uq, keys), cnts.astype(np.uint64))
        got = np.zeros(uq.shape[0], np.uint64)
        np.add.at(got, np.searchsorted(uq, ol), oc.astype(np.uint64))
        assert np.array_equal(got, exp)
    print("OK")
    """
)


def _run(snippet: str, env_extra: dict) -> None:
    env = dict(os.environ, KRUST_PLATFORM="cpu", **env_extra)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c", snippet],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout


@pytest.mark.parametrize("chunk", ["2048", "4096"])
def test_rle_one_key_other_geometries(chunk):
    _run(_RLE_SNIPPET, {"KRUST_RLE_CHUNK": chunk})


@pytest.mark.parametrize("chunk", ["4096"])
def test_merge_lv_other_geometries(chunk):
    _run(_MERGE_SNIPPET, {"KRUST_MERGE_CHUNK": chunk})
