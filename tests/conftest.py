"""Test harness config: force CPU with an 8-device virtual mesh.

Must run before jax initializes a backend. The container's site config pins
``jax_platforms`` to the TPU tunnel; tests run on a virtual 8-device CPU mesh
instead (fast, and exercises the multi-chip sharding paths per SURVEY.md §4).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["KRUST_PLATFORM"] = "cpu"
# engine selection must come from each test, not the developer's shell
# (CLI tests set KRUST_ENGINE per subprocess; in-process tests construct
# engines explicitly or rely on auto-dispatch)
os.environ.pop("KRUST_ENGINE", None)
# small kernel geometry: interpret-mode tests of the Pallas merge/RLE ops
# run networks in pure Python; the production default (16384) is TPU-sized
os.environ.setdefault("KRUST_MERGE_CHUNK", "2048")
os.environ.setdefault("KRUST_RLE_CHUNK", "1024")

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall-clock is dominated by
# XLA-CPU compiles on this 1-core host, and the per-module clear below
# (crash workaround) forces recompiles of shared executables. With a disk
# cache those recompiles deserialize in milliseconds instead; repeat suite
# runs on the same checkout drop from ~30 to well under 15 minutes.
# Repo-local (not /tmp): per-checkout, no shared-path ownership or
# pre-planted-entry concerns on multi-user machines. KRUST_TEST_JAX_CACHE
# overrides; blank (" ") disables.
_cache_dir = os.environ.get(
    "KRUST_TEST_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                 ".jax_cache"),
)
if _cache_dir.strip():
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


import pytest as _pytest  # noqa: E402


# Modules whose tests compile large numbers of DISTINCT executables
# (interpret-mode Pallas kernels over shape sweeps, all-k differential
# sweeps, hypothesis-generated shapes). Only these push the live-executable
# population toward the XLA-CPU JIT crash threshold; the api/builder/cli
# cluster reuses a handful of count-path executables and benefits from
# keeping them compiled.
_HEAVY_COMPILE_MODULES = {
    "test_pallas",
    "test_pallas_fused",
    "test_pallas_merge",
    "test_pallas_rle",
    "test_flat",
    "test_table",
    "test_epoch_table",
    "test_sharded",
    "test_properties",
    "test_api",
    "test_codec",
}


@_pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module(request):
    """Drop compiled executables after heavy-compile test modules.

    The full suite compiles many hundreds of CPU executables in one
    process; past ~450 tests the XLA CPU JIT segfaults inside a fresh
    compile (observed deterministically at the same test, which passes in
    any smaller run). Clearing after each module in _HEAVY_COMPILE_MODULES
    keeps the live-executable population bounded; light modules keep their
    (shared) executables to avoid the recompilation tax of a blanket
    per-module clear.
    """
    yield
    if request.module.__name__.rpartition(".")[2] in _HEAVY_COMPILE_MODULES:
        jax.clear_caches()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gzip
import shutil

import pytest

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


@pytest.fixture(scope="session")
def fixtures_dir(tmp_path_factory):
    """Fixture dir containing the plain files plus generated .gz twins."""
    d = tmp_path_factory.mktemp("fixtures")
    for name in os.listdir(FIXTURES):
        src = os.path.join(FIXTURES, name)
        shutil.copy(src, d / name)
        if name in ("simple.fa", "simple.fq"):
            with open(src, "rb") as f_in, gzip.open(d / (name + ".gz"), "wb") as f_out:
                f_out.write(f_in.read())
    return d


@pytest.fixture()
def simple_fa(fixtures_dir):
    return str(fixtures_dir / "simple.fa")


@pytest.fixture()
def simple_fq(fixtures_dir):
    return str(fixtures_dir / "simple.fq")
