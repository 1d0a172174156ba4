"""Benchmark: end-to-end canonical k-mer counting throughput at k=21.

Workload (mirrors BASELINE.json config 2's shape): synthetic sequencing reads
at ~32x coverage — by default 512 Mbases of 250 bp reads over a 16 Mbase
genome, ~16M distinct canonical 21-mers — counted end-to-end (pack ->
transfer -> device rolling codec -> epoch-sort counting core -> full table
pull to host), excluding compilation (one warmup pass) and output
formatting, matching the reference's criterion macro-bench scope
(reference: benches/kmer_benchmark.rs:127-188).

Resilience architecture (round 3): this rig's TPU is reached through a
~20-40 MB/s tunnel that degrades under load and can WEDGE entirely (every
transfer blocks forever inside a C call until the backend recovers, tens of
minutes later). A bench that hangs or exits without a number is useless to
the driver, so the work is split across processes:

- The PARENT (default entry) never imports jax. It pre-flights the device
  in subprocess probes with retry/backoff, sizes the workload to the
  measured link health, launches the measuring CHILD, and supervises it via
  an event file with per-stage deadlines. Whatever happens — wedge, crash,
  partial run — the parent prints the final JSON line from the best
  evidence it has, falling back to a smaller workload and finally to a
  clearly-labeled CPU-backend run. It always exits 0 with a parsed value.
- The CHILD (--child) does the measuring and emits one JSON event line per
  milestone (ready / warmup / pass / links / done) the moment it completes,
  so a later hang can't erase earlier measurements. Its first timed pass is
  phase-instrumented: host pack, h2d feed, device compute (the compute-only
  throughput figure), and the finalize pull are separated; later passes are
  clean end-to-end runs.

Baseline (MEASURED, round 2): the reference publishes no numbers
(BASELINE.md) and Rust is not installable in this image, so
`benches/baseline_cpp/kmerust_like.cpp` reproduces the reference's hot-loop
shape faithfully (per-window allocation + validate + pack + canonical +
FxHash map update; reference: src/run.rs:526-571, src/kmer.rs:266-398),
measured single-thread on this host at k=21: 2.26 Mbases/s/thread faithful,
11.9 Mbases/s/thread for a best-case zero-alloc rolling rewrite. The
operative baseline is faithful x 64 threads with IDEAL scaling =
144.6 Mbases/s; rolling x 64 = 760 Mbases/s is the CPU upper bound.

Prints ONE JSON line with {"metric", "value", "unit", "vs_baseline"} plus
the round-3 evidence fields: compute_only_bases_per_s, link_h2d_mbs,
link_d2h_mbs, phases, passes/times, platform, degraded.

Env knobs: KRUST_BENCH_BASES (workload override), KRUST_BENCH_PREFLIGHT_S
(pre-flight retry budget, default 600), KRUST_BENCH_TOTAL_S (overall wall
budget, default 2400), KRUST_BENCH_PASS_BUDGET_S (timed-pass budget in the
child, default 150).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

#: measured: 2.26 Mbases/s/thread (faithful C++ reference-shape proxy,
#: this host) x 64 threads ideal scaling. See module docstring.
BASELINE_BASES_PER_S = 144.6e6
#: best-case CPU bound: rolling zero-alloc variant x 64 ideal
BASELINE_ROLLING_64T = 760.0e6
# KRUST_BENCH_K switches the workload k (secondary artifacts only — the
# driver's headline metric stays k=21; the measured 64-thread reference
# proxy is a k=21 number, so vs_baseline at other k is indicative).
K = int(os.environ.get("KRUST_BENCH_K", "21"))
COVERAGE = 32
READ_LEN = 250
DEFAULT_BASES = 512_000_000


def make_reads(rng: np.random.Generator, n_bases: int) -> np.ndarray:
    """Synthetic reads: COVERAGE x random substrings of one random genome."""
    genome_len = max(n_bases // COVERAGE, READ_LEN + 1)
    genome = rng.integers(0, 4, size=genome_len, dtype=np.uint8)
    n_reads = n_bases // READ_LEN
    starts = rng.integers(0, genome_len - READ_LEN, size=n_reads, dtype=np.int64)
    idx = starts[:, None] + np.arange(READ_LEN, dtype=np.int64)[None, :]
    return genome[idx]  # [n_reads, READ_LEN] of 2-bit codes


def reads_to_stream(reads: np.ndarray) -> np.ndarray:
    """Code rows -> flat separator-delimited stream (reader output format)."""
    from krust_tpu.kmer import INVALID_CODE

    n, length = reads.shape
    out = np.empty((n, length + 1), dtype=np.uint8)
    out[:, :length] = reads
    out[:, length] = INVALID_CODE
    return out.reshape(-1)[:-1]  # one separator between reads, none trailing


def _setup_jax_cache() -> None:
    import jax

    os.makedirs("/tmp/krust_jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/krust_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# --------------------------------------------------------------------------
# probe mode: a tiny device round-trip + link measurement in its own process
# --------------------------------------------------------------------------


def run_probe() -> None:
    import jax

    _setup_jax_cache()
    dev = jax.devices()[0]
    # warm: backend init + first tiny transfer
    w = jax.device_put(np.zeros(1 << 16, np.uint8))
    _ = np.asarray(w[:1])
    t0 = time.perf_counter()
    x = jax.device_put(np.random.randint(0, 255, 4 << 20, np.uint8))
    _ = np.asarray(x[:1])  # block_until_ready is a no-op on this backend
    h2d = 4 / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    _ = np.asarray(x)
    d2h = 4 / (time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "platform": dev.platform,
                "h2d_mbs": round(h2d, 1),
                "d2h_mbs": round(d2h, 1),
            }
        )
    )


# --------------------------------------------------------------------------
# child mode: the measuring process; emits event lines as milestones complete
# --------------------------------------------------------------------------


class _Emitter:
    def __init__(self, path: str):
        self._f = open(path, "a", buffering=1)

    def __call__(self, event: str, **fields) -> None:
        fields["event"] = event
        fields["t"] = round(time.monotonic(), 2)
        self._f.write(json.dumps(fields) + "\n")
        self._f.flush()
        os.fsync(self._f.fileno())


def _staged_pass(engine, streams, emit) -> dict:
    """Phase-instrumented pass: pack / feed / compute / finalize separated.

    All batches pre-stage onto the device (feed), then the compute steps run
    on device-resident inputs with one trailing sync — so ``compute`` is a
    clean on-chip figure for the codec + epoch sort + RLE/merge core,
    uncontaminated by per-batch transfer round-trips. The phase sum is a
    valid end-to-end pass time (same total work as a clean pass).
    """
    import jax

    from krust_tpu.io.packer import flat_batches
    from krust_tpu.models.engines import _count_flat_step
    from krust_tpu.ops.table import EPOCH_WINDOW_LIMIT

    cfg = engine.config
    t0 = time.perf_counter()
    batches = list(
        flat_batches(streams.codes, None, K, None, cfg.block_windows, cfg.batch_rows)
    )
    t_pack = time.perf_counter() - t0

    t0 = time.perf_counter()
    staged = []
    for b in batches:
        p2 = jax.device_put(jax.numpy.asarray(b.packed2))
        iv = jax.device_put(jax.numpy.asarray(b.invpos))
        staged.append((p2, iv, b))
    _ = np.asarray(staged[-1][0].ravel()[:1])  # drain the transfer queue
    t_feed = time.perf_counter() - t0

    mode, table = engine._make_table(K)
    epochs = []
    t0 = time.perf_counter()
    for p2, iv, b in staged:
        bw = b.rows * b.block_windows
        if table.windows_this_epoch + bw >= EPOCH_WINDOW_LIMIT:
            epochs.append(table.finalize())
        on_tpu = _child_on_tpu()
        out = _count_flat_step(
            p2, iv, np.int32(b.covered), K, b.rows, b.block_windows,
            engine.config.use_pallas and on_tpu, mode,
            engine.config.use_fused_codec and on_tpu
            and b.block_windows % 512 == 0,
        )
        if len(out) == 1:  # lo-only sentinel part (k <= 16)
            table.add(None, out[0], None, bw)
        elif len(out) == 2:
            table.add(out[0], out[1], None, bw)
        else:
            table.add(out[0], out[1], out[2], bw)
    # resolve every queued device op so the sort+rle cost lands in compute
    if hasattr(table, "_flush_raw"):
        table._flush_raw()
    if hasattr(table, "_resolve_epoch"):
        table._resolve_epoch()
        if table._compacted:
            _ = np.asarray(table._compacted[-1][0].ravel()[:1])
    elif getattr(table, "_merge", None) is not None or table._parts:
        table._compact()
        table._resolve()
        if table._table is not None:
            _ = np.asarray(table._table[0].ravel()[:1])
    t_compute = time.perf_counter() - t0

    t0 = time.perf_counter()
    epochs.append(table.finalize())
    result = engine._merge_epochs(epochs, K)
    t_final = time.perf_counter() - t0

    phases = {
        "pack": round(t_pack, 3),
        "feed": round(t_feed, 3),
        "compute": round(t_compute, 3),
        "finalize": round(t_final, 3),
    }
    elapsed = t_pack + t_feed + t_compute + t_final
    emit(
        "pass",
        kind="staged",
        elapsed=round(elapsed, 3),
        phases=phases,
        distinct=result.distinct,
        total=result.total,
    )
    return phases


def _child_on_tpu() -> bool:
    import jax

    return jax.devices()[0].platform not in ("cpu", "gpu")


def run_child(bases: int, events_path: str) -> None:
    emit = _Emitter(events_path)
    import jax

    _setup_jax_cache()

    from krust_tpu.io.reader import ParsedStreams
    from krust_tpu.models.engines import BatchEngine
    from krust_tpu.utils.config import EngineConfig

    platform = jax.devices()[0].platform
    emit("ready", platform=platform, bases=bases)

    rng = np.random.default_rng(7)
    reads = make_reads(rng, bases)
    n_bases = int(reads.size)
    stream = reads_to_stream(reads)
    streams = ParsedStreams(stream, None, reads.shape[0], n_bases)
    del reads

    on_tpu = platform not in ("cpu", "gpu")
    if on_tpu:
        engine = BatchEngine(EngineConfig())
    else:
        # CPU fallback: the native host engine (rolling canonical + MSD/LSD
        # hybrid radix sort + RLE in C++) — the framework's real
        # no-accelerator path, ~40-50 Mbases/s at k=21 on this one-core
        # host (~100x the XLA-CPU pipeline); the result is still labeled
        # platform=cpu / degraded by the parent
        from krust_tpu.models.engines import NativeEngine

        engine = NativeEngine(EngineConfig())

    # warmup: one full pass compiles every shape in the pipeline (batch
    # buckets AND table-merge sizes); remote compiles are minutes-slow and
    # must stay out of the timed region. Executables persist in the
    # compilation cache, so subsequent bench runs skip this cost too.
    t0 = time.perf_counter()
    engine.count(streams, K)
    emit("warmup_done", elapsed=round(time.perf_counter() - t0, 1))

    # pass 1: phase-instrumented (emits value + phases + compute-only the
    # moment it completes — a later wedge can't erase it). The host engine
    # has no transfer phases: its whole pass IS compute. Two staged passes
    # when the budget allows: the first pass pays one-time per-executable
    # dispatch costs over the tunnel (measured ~0.9 s of non-kernel time at
    # 128 Mbases — benches/probe_compute_breakdown.py attributes the kernel
    # work at ~0.6 s), so the parent keeps the per-phase MINIMUM across
    # passes as the steady-state figure.
    if on_tpu:
        _staged_pass(engine, streams, emit)
        if float(os.environ.get("KRUST_BENCH_PASS_BUDGET_S", "150")) >= 60:
            _staged_pass(engine, streams, emit)
    else:
        t0 = time.perf_counter()
        result = engine.count(streams, K)
        dt = time.perf_counter() - t0
        emit(
            "pass",
            kind="staged",
            elapsed=round(dt, 3),
            phases={"pack": 0.0, "feed": 0.0, "compute": round(dt, 3),
                    "finalize": 0.0},
            distinct=result.distinct,
            total=result.total,
        )

    # up to 2 clean passes: the tunneled link's throughput varies ~2x
    # run-to-run AND degrades under sustained transfer load, so few passes
    # beat many (criterion likewise reports distribution minima); a time
    # budget stops early so a degraded tunnel can't overrun the parent.
    budget = float(os.environ.get("KRUST_BENCH_PASS_BUDGET_S", "150"))
    for _ in range(2):
        if budget <= 0:
            break
        t0 = time.perf_counter()
        result = engine.count(streams, K)
        dt = time.perf_counter() - t0
        budget -= dt
        emit(
            "pass",
            kind="clean",
            elapsed=round(dt, 3),
            distinct=result.distinct,
            total=result.total,
        )

    # link probe so a tunnel-degraded run is interpretable
    probe = np.random.randint(0, 255, 4 << 20, np.uint8)
    x = jax.device_put(probe)
    _ = np.asarray(x[:1])
    t0 = time.perf_counter()
    x2 = jax.device_put(np.random.randint(0, 255, 4 << 20, np.uint8))
    _ = np.asarray(x2[:1])
    h2d = 4 / (time.perf_counter() - t0)
    r = jax.numpy.asarray(probe) + jax.numpy.uint8(1)
    _ = np.asarray(r[:1])
    t0 = time.perf_counter()
    _ = np.asarray(r)
    d2h = 4 / (time.perf_counter() - t0)
    emit("links", h2d_mbs=round(h2d, 1), d2h_mbs=round(d2h, 1))
    emit("done")


# --------------------------------------------------------------------------
# parent: pre-flight with retries, supervise the child, ALWAYS print JSON
# --------------------------------------------------------------------------

#: seconds the parent allows from the last child event to the next one
_STAGE_DEADLINES = {
    None: 300.0,  # launch -> ready (backend init can renegotiate the tunnel)
    "ready": 1500.0,  # -> warmup_done: cold remote compiles are minutes-slow
    "warmup_done": 900.0,  # -> first pass
    "pass": 600.0,
    "links": 180.0,
}


def _preflight(budget_s: float, log) -> dict | None:
    """Probe subprocesses with backoff until one answers or budget runs out.

    The retry schedule is SPREAD over the whole budget (backoff capped at
    90 s) rather than front-loaded: observed tunnel outages last tens of
    minutes and recover abruptly, so the last attempts matter as much as
    the first (VERDICT r4 #2 — give the driver's end-of-round capture a
    realistic shot).
    """
    deadline = time.monotonic() + budget_s
    delay = 10.0
    attempt = 0
    while time.monotonic() < deadline:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--probe"],
                capture_output=True,
                text=True,
                timeout=min(180.0, max(deadline - time.monotonic(), 30.0)),
            )
            if out.returncode == 0 and out.stdout.strip():
                info = json.loads(out.stdout.strip().splitlines()[-1])
                log(f"pre-flight ok (attempt {attempt}): {info}")
                return info
            log(
                f"pre-flight attempt {attempt} failed rc={out.returncode}: "
                + (out.stderr or "").strip()[-200:]
            )
        except subprocess.TimeoutExpired:
            log(f"pre-flight attempt {attempt} timed out (tunnel wedged?)")
        except Exception as e:  # pragma: no cover - defensive
            log(f"pre-flight attempt {attempt} error: {e}")
        time.sleep(min(delay, max(deadline - time.monotonic(), 0)))
        delay = min(delay * 1.6, 90.0)
    return None


def _supervise_child(bases: int, env: dict, attempt_budget_s: float, log) -> dict:
    """Run one child, harvesting its events; kill it on a stage stall.

    Returns the accumulated state: passes, phases, links, platform.
    """
    import tempfile

    fd, events_path = tempfile.mkstemp(prefix="krust_bench_ev_", suffix=".jsonl")
    os.close(fd)
    state: dict = {"passes": [], "phases": None, "links": None, "platform": None}
    proc = subprocess.Popen(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--child",
            "--bases",
            str(bases),
            "--events",
            events_path,
        ],
        env=env,
        stdout=sys.stderr,
        stderr=sys.stderr,
        start_new_session=True,
    )
    t_start = time.monotonic()
    last_event = None
    last_event_t = t_start
    seen = 0
    try:
        while True:
            time.sleep(2.0)
            with open(events_path) as f:
                lines = f.read().splitlines()
            for line in lines[seen:]:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.pop("event", "?")
                log(f"child event: {kind} {ev}")
                last_event, last_event_t = kind, time.monotonic()
                if kind == "ready":
                    state["platform"] = ev.get("platform")
                elif kind == "pass":
                    state["passes"].append(ev)
                    if ev.get("phases"):
                        # per-phase minimum across staged passes: the first
                        # pass pays one-time per-executable dispatch costs
                        # (see run_child); the min is the steady state
                        prev = state["phases"]
                        cur = ev["phases"]
                        state["phases"] = (
                            {p: min(prev[p], cur[p]) for p in cur}
                            if prev
                            else cur
                        )
                elif kind == "links":
                    state["links"] = ev
            seen = len(lines)
            if proc.poll() is not None:
                if last_event == "done" or proc.returncode == 0:
                    break
                log(f"child exited rc={proc.returncode}")
                break
            now = time.monotonic()
            stage_key = "pass" if last_event == "pass" else last_event
            scale = float(os.environ.get("KRUST_BENCH_STAGE_SCALE", "1"))
            stage_cap = _STAGE_DEADLINES.get(stage_key, 300.0) * scale
            if now - last_event_t > stage_cap or now - t_start > attempt_budget_s:
                why = (
                    f"stage '{last_event}' stalled {now - last_event_t:.0f}s"
                    if now - last_event_t > stage_cap
                    else f"attempt budget {attempt_budget_s:.0f}s exhausted"
                )
                log(f"killing child: {why}")
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                proc.wait()
                break
    finally:
        if proc.poll() is None:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
        try:
            os.unlink(events_path)
        except OSError:
            pass
    return state


def _emit_final(state: dict, bases: int, degraded: bool, note: str | None) -> None:
    passes = state["passes"]
    clean = [p["elapsed"] for p in passes if p.get("kind") == "clean"]
    all_t = [p["elapsed"] for p in passes]
    elapsed = min(clean) if clean else (min(all_t) if all_t else None)
    value = round(bases / elapsed, 1) if elapsed else 0.0
    phases = state["phases"]
    compute_only = None
    overlap_s = None
    if phases and phases.get("compute"):
        compute_only = round(bases / max(phases["compute"], 1e-9), 1)
        if clean:
            # feed/compute overlap evidence (double-buffered feed): how far
            # a clean end-to-end pass beats the serialized phase sum
            overlap_s = round(sum(phases.values()) - min(clean), 3)
    links = state["links"] or {}
    with_result = [p for p in passes if "distinct" in p]
    record = {
        "metric": f"bases_per_second_k{K}",
        "value": value,
        "unit": "bases/s",
        "vs_baseline": round(value / BASELINE_BASES_PER_S, 3),
        "compute_only_bases_per_s": compute_only,
        "vs_baseline_compute_only": (
            round(compute_only / BASELINE_BASES_PER_S, 3) if compute_only else None
        ),
        "link_h2d_mbs": links.get("h2d_mbs"),
        "link_d2h_mbs": links.get("d2h_mbs"),
        "phases": phases,
        "feed_overlap_s": overlap_s,
        "passes": len(passes),
        "times": [round(t, 1) for t in all_t],
        "bases": bases,
        "distinct": with_result[-1]["distinct"] if with_result else None,
        "total": with_result[-1]["total"] if with_result else None,
        "platform": state.get("platform"),
        "degraded": degraded,
    }
    if degraded and state.get("platform") == "cpu":
        # the degraded run is the native host core on this box's core(s);
        # the apples-to-apples ratio against the measured reference shape
        # (2.26 Mbases/s/thread faithful proxy) contextualizes the number:
        # vs_baseline compares 1 core here to 64 ideal-scaled threads there
        n_cores = os.cpu_count() or 1
        record["host_cores"] = n_cores
        record["per_core_vs_reference_per_core"] = round(
            (value / n_cores) / (BASELINE_BASES_PER_S / 64), 2
        )
    if note:
        record["note"] = note
    print(json.dumps(record))
    print(
        f"# baseline: measured faithful 64t={BASELINE_BASES_PER_S / 1e6:.1f} "
        f"Mbases/s (vs_baseline above); best-case CPU rolling 64t="
        f"{BASELINE_ROLLING_64T / 1e6:.0f} Mbases/s -> "
        f"vs_rolling={value / BASELINE_ROLLING_64T:.3f}",
        file=sys.stderr,
    )


def supervise() -> None:
    def log(msg: str) -> None:
        print(f"# bench: {msg}", file=sys.stderr, flush=True)

    t_start = time.monotonic()
    total_budget = float(os.environ.get("KRUST_BENCH_TOTAL_S", "2400"))
    preflight_budget = float(os.environ.get("KRUST_BENCH_PREFLIGHT_S", "900"))
    forced_bases = os.environ.get("KRUST_BENCH_BASES")

    info = _preflight(preflight_budget, log)
    degraded = False
    note = None

    if info is not None and info.get("platform") not in ("cpu", "gpu"):
        h2d = info.get("h2d_mbs") or 0.0
        if forced_bases:
            bases = int(forced_bases)
        elif h2d >= 18:
            bases = DEFAULT_BASES
        elif h2d >= 8:
            bases, degraded = DEFAULT_BASES // 2, True
        elif h2d >= 3:
            bases, degraded = DEFAULT_BASES // 4, True
        else:
            bases, degraded = DEFAULT_BASES // 8, True
        if bases != DEFAULT_BASES and not forced_bases:
            note = f"workload shrunk to {bases} bases (link h2d {h2d} MB/s)"
            log(note)
        attempts = [(bases, dict(os.environ))]
        if bases > 32_000_000:
            attempts.append((max(bases // 4, 32_000_000), dict(os.environ)))
    else:
        if info is None:
            note = (
                "TPU unreachable within pre-flight budget; CPU-backend "
                "fallback result"
            )
            # one small blind device attempt anyway when the budget allows:
            # the child's own stage deadlines (launch->ready 300 s) bound
            # the cost, and tunnels that ignore probes sometimes serve real
            # backends (VERDICT r4 #2)
            remaining = total_budget - (time.monotonic() - t_start)
            attempts = (
                [(32_000_000, dict(os.environ))] if remaining >= 900 else []
            )
        else:
            note = f"no TPU (platform={info.get('platform')}); CPU-backend result"
            attempts = []
        log(note)
        degraded = True

    cpu_env = dict(os.environ)
    cpu_env["KRUST_PLATFORM"] = "cpu"
    cpu_bases = int(forced_bases) if forced_bases else 32_000_000
    attempts.append((cpu_bases, cpu_env))

    for i, (bases, env) in enumerate(attempts):
        remaining = total_budget - (time.monotonic() - t_start)
        if remaining < 120 and i < len(attempts) - 1:
            continue  # save time for the fallback attempt
        is_cpu = env.get("KRUST_PLATFORM") == "cpu"
        log(
            f"attempt {i + 1}/{len(attempts)}: bases={bases} "
            f"({'cpu fallback' if is_cpu else 'device'}) "
            f"budget={remaining:.0f}s"
        )
        attempt_cap = float(os.environ.get("KRUST_BENCH_ATTEMPT_S", "inf"))
        state = _supervise_child(
            bases, env, min(max(remaining, 120.0), attempt_cap), log
        )
        if state["passes"]:
            if i > 0 or is_cpu:
                degraded = True
            if is_cpu and not note:
                note = "device attempts produced no pass; CPU-backend result"
            if state.get("platform") not in (None, "cpu", "gpu") and (
                note or ""
            ).startswith("TPU unreachable"):
                # the blind device attempt landed a real accelerator pass
                note = (
                    "pre-flight probes failed but the blind device attempt "
                    "succeeded (stage-deadline bounded); workload "
                    "conservatively small"
                )
            _emit_final(state, bases, degraded, note)
            return
        log(f"attempt {i + 1} produced no completed pass")
        degraded = True

    # absolute last resort: no pass anywhere — still print a parseable line
    _emit_final(
        {"passes": [], "phases": None, "links": None, "platform": None},
        0,
        True,
        (note or "") + " — no pass completed on any backend",
    )


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", action="store_true")
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--bases", type=int, default=DEFAULT_BASES)
    ap.add_argument("--events", type=str, default="/dev/null")
    args = ap.parse_args()
    if args.probe:
        run_probe()
    elif args.child:
        run_child(args.bases, args.events)
    else:
        supervise()


if __name__ == "__main__":
    main()
