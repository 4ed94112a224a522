"""Benchmark harness: time the headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly one JSON line:
  {"metric": "headline_wall_sec", "value": N, "unit": "sec",
   "queries": {"q1_pricing_summary": sec, ...},
   "registry_sweep": {"<query>": sec, ...}, "registry_total_sec": N,
   "sf": 0.1}

``queries`` holds the 9 headline queries, each warmed then timed
best-of-2. ``registry_sweep`` covers EVERY registered query (the full
capability surface) so round-over-round comparisons can see
regressions outside the headline set; each query runs
SPARK_GRAFT_SWEEP_RUNS times (default 2) and the MIN is recorded —
measured: a first touch pays 3-7x in Python-daemon spin-up, codegen,
and parquet footer reads (scalar_string_suite 7.2s cold vs 1.3s warm),
which is launch overhead, not the plan. Disable the sweep entirely
with SPARK_GRAFT_SWEEP=0 for quick iteration. When the synthetic ~sf1 dir
exists (see tools/make_scaled_testdata.py) and the main run is the
default sf0.1, ``sf1_headline`` repeats the headline set at 10x data
so every recorded bench carries its own scaling data point.

Each query is forced end-to-end with a noop sink write (full execution,
no driver-side collect — the same action profile a cluster job has).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_property_rumah123_spark.plans import load_all  # noqa: E402
from etl_property_rumah123_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SWEEP = os.environ.get("SPARK_GRAFT_SWEEP", "1") != "0"
SWEEP_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_SWEEP_RUNS", "2")))
# Headline timed runs per query (post-warm-up). Same-code rounds have
# shown 15-30% per-query swings on this box, so the recorded number is
# the MIN of N runs — the variance-reduced anchor previous rounds had
# to reconstruct by hand — and the per-query SPREAD (max - min) rides
# along in the compact line so a reader can see how noisy the box was
# without re-running.
BENCH_RUNS = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
# Synthetic ~sf1 dir (tools/make_scaled_testdata.py). When present and
# the main run is the default sf0.1, the headline set is ALSO timed at
# sf1 so every recorded bench carries a 10x-scaling data point.
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1_synth")
# Streaming micro-bench (TWS dedup gate + native session windows over
# the events table): throughput, per-batch latency, state-store size.
STREAMING = os.environ.get("SPARK_GRAFT_STREAMING", "1") != "0"


def sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


# Box-load stamp: same-code rounds have shown 15-30% per-query swings
# (r6 vs r7 on byte-identical trees). Recording 1/5/15-min loadavg in
# the bench JSON lets any reader separate plan regressions from a busy
# box without re-running. When the load is already high BEFORE the
# bench starts, wait (bounded) for it to settle so the recorded
# numbers start from a quiet baseline. Round-13 A/B evidence
# (BASELINE §Round 13): runs whose 1-min load looked quiet but whose
# 5-min load was still decaying read up to +40% — gate on BOTH.
LOAD_QUIET_THRESHOLD = float(os.environ.get("SPARK_GRAFT_LOAD_QUIET", "1.5"))
LOAD_QUIET_5M = float(os.environ.get("SPARK_GRAFT_LOAD_QUIET_5M", "2.5"))
LOAD_WAIT_SEC = int(os.environ.get("SPARK_GRAFT_LOAD_WAIT_SEC", "180"))


def loadavg() -> list[float]:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:  # platforms without getloadavg
        return [-1.0, -1.0, -1.0]


def other_jvms() -> int:
    """JVMs already running when the bench starts — overlapping
    local[32] JVMs inflate timings ~4x (documented measurement trap),
    so the count is stamped into the JSON for post-hoc reading."""
    import subprocess

    try:
        out = subprocess.run(
            ["pgrep", "-c", "java"], capture_output=True, text=True
        )
        return int(out.stdout.strip() or 0)
    except (OSError, ValueError):
        return -1


def wait_for_quiet_box() -> list[float]:
    """Poll until the 1-min AND 5-min loadavg are under their
    thresholds or the wait budget is spent.

    Returns the loadavg observed at bench start (post-wait)."""
    deadline = time.monotonic() + LOAD_WAIT_SEC
    la = loadavg()
    while (
        la[0] >= LOAD_QUIET_THRESHOLD or la[1] >= LOAD_QUIET_5M
    ) and time.monotonic() < deadline:
        print(
            f"bench: load {la[0]}/{la[1]} (1m/5m) >= "
            f"{LOAD_QUIET_THRESHOLD}/{LOAD_QUIET_5M}, "
            "waiting for quiet box...",
            file=sys.stderr,
        )
        time.sleep(10)
        la = loadavg()
    return la


def run_once(spec, spark, sf_dir: str = SF_DIR) -> float:
    t0 = time.perf_counter()
    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def streaming_bench(spark) -> dict:
    """Throughput/latency for the stateful streaming surface at SF_DIR.

    Drives two stateful queries over the events table as a bounded
    file stream (availableNow, maxFilesPerTrigger=4 so the run spans
    multiple micro-batches with real state handoff between them, on
    the RocksDB state store):

    - ``tws_dedup_gate`` — the transformWithStateInPandas admission
      gate (executor-side Python state server, Arrow batches per key
      group);
    - ``session_windows`` — engine-native session_window aggregation
      with watermark eviction.

    Records rows/sec drained end-to-end, batch count, mean/max batch
    latency from the progress feed, and the final state-store footprint
    (rows + bytes) so round-over-round comparisons can see state bloat,
    not just wall time."""
    import shutil
    import tempfile

    from etl_property_rumah123_spark.sources.catalog import table
    from etl_property_rumah123_spark.streaming import pipelines, tws

    events_dir = tempfile.mkdtemp(prefix="bench_events_")
    out: dict[str, dict] = {}
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    try:
        src = table(spark, SF_DIR, "events")
        n_in = src.count()
        src.repartition(16).write.mode("overwrite").parquet(events_dir)
        schema = spark.read.parquet(events_dir).schema
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )

        def run(build, name):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "4")
                .parquet(events_dir)
            )
            t0 = time.perf_counter()
            q = pipelines.run_to_memory_sink(
                build(stream), name, output_mode="append"
            )
            q.awaitTermination()
            wall = time.perf_counter() - t0
            prog = [p.json for p in q.recentProgress]
            prog = [json.loads(p) for p in prog]
            durs = [
                p["batchDuration"]
                for p in prog
                if p.get("numInputRows", 0) > 0
            ]
            state_rows = state_bytes = 0
            for p in reversed(prog):
                ops = p.get("stateOperators") or []
                if ops:
                    state_rows = sum(o.get("numRowsTotal", 0) for o in ops)
                    state_bytes = sum(
                        o.get("memoryUsedBytes", 0) for o in ops
                    )
                    break
            rows_out = spark.table(name).count()
            return {
                "rows_in": n_in,
                "rows_out": rows_out,
                "wall_sec": round(wall, 3),
                "rows_per_sec": round(n_in / wall) if wall > 0 else -1,
                "batches": len(durs),
                "batch_ms_mean": round(sum(durs) / len(durs)) if durs else -1,
                "batch_ms_max": max(durs) if durs else -1,
                "state_rows": state_rows,
                "state_bytes": state_bytes,
            }

        out["tws_dedup_gate"] = run(
            lambda s: tws.streaming_dedup_admission_tws(s, n_recent=1000),
            "bench_tws_gate",
        )
        out["session_windows"] = run(
            pipelines.session_windows, "bench_session_windows"
        )
        # the engine-native alternative to the TWS gate, re-measured
        # every round so the routing guidance (use the native operator
        # when first-arrival-within-watermark semantics suffice; the
        # TWS gate buys recency-window/bootstrap semantics at a
        # group-call cost) stays a live number, not a one-off drill
        out["native_dedup_watermark"] = run(
            pipelines.dedup_within_watermark, "bench_native_dedup"
        )
    finally:
        shutil.rmtree(events_dir, ignore_errors=True)
        if prev_provider:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
    return out


def main() -> None:
    registry = load_all()
    headline = {n: s for n, s in registry.items() if s.headline}
    load_at_start = wait_for_quiet_box()
    jvms_at_start = other_jvms()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm EVERY headline query once (JVM, parquet footers, codegen
    # caches) so the timed runs measure the plan, not first-touch
    # costs; the warm-up run is not recorded.
    for spec in headline.values():
        run_once(spec, spark)

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    for name, spec in headline.items():
        runs = [run_once(spec, spark) for _ in range(BENCH_RUNS)]
        timings[name] = round(min(runs), 3)
        spreads[name] = round(max(runs) - min(runs), 3)
        all_runs[name] = [round(r, 3) for r in runs]

    out = {
        "metric": "headline_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_spread": spreads,
        "queries_runs": all_runs,
        "bench_runs": BENCH_RUNS,
        "sf": sf_of(SF_DIR),
        "loadavg_start": load_at_start,
        "other_jvms_at_start": jvms_at_start,
    }

    if SWEEP:
        sweep: dict[str, float] = {}
        for name, spec in registry.items():
            try:
                sweep[name] = round(
                    min(run_once(spec, spark) for _ in range(SWEEP_RUNS)), 3
                )
            except Exception:
                sweep[name] = -1.0  # failed query: visible, not fatal
        out["registry_sweep"] = sweep
        out["registry_total_sec"] = round(sum(v for v in sweep.values() if v > 0), 3)

    # Drop Python-side refs from the sweep before the sf1 section:
    # localCheckpoint blocks are freed only when their DataFrame is
    # GC'd (ContextCleaner), and 50 queries of accumulated state is
    # exactly the heap pressure that made sf1 LSH numbers swing 2-3x.
    import gc

    gc.collect()

    if os.path.isdir(SF1_DIR) and abs(sf_of(SF_DIR) - 0.1) < 1e-9:
        sf1: dict[str, float] = {}
        for name, spec in headline.items():
            try:
                gc.collect()  # free prior queries' checkpoint blocks
                run_once(spec, spark, SF1_DIR)  # warm
                sf1[name] = round(run_once(spec, spark, SF1_DIR), 3)
            except Exception:
                sf1[name] = -1.0
        out["sf1_headline"] = sf1
        out["sf1_headline_total_sec"] = round(
            sum(v for v in sf1.values() if v > 0), 3
        )

    if STREAMING:
        try:
            out["streaming"] = streaming_bench(spark)
        except Exception as ex:  # visible, not fatal
            out["streaming"] = {"error": f"{type(ex).__name__}: {ex}"[:300]}

    # The driver records a bounded slice of stdout; round 3's artifact
    # truncated the head of the (long) JSON line and lost the headline
    # numbers. Keep stdout to ONE COMPACT line (metric/value/queries/
    # totals) and write the full detail — per-query sweep + sf1 series —
    # to BENCH_DETAILS.json next to this script.
    out["loadavg_end"] = loadavg()

    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAILS.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)

    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": out["queries"],
        "queries_spread": out["queries_spread"],
        "bench_runs": out["bench_runs"],
        "sf": out["sf"],
        "loadavg_start": out["loadavg_start"],
        "loadavg_end": out["loadavg_end"],
        "other_jvms_at_start": out["other_jvms_at_start"],
    }
    if "registry_total_sec" in out:
        compact["registry_total_sec"] = out["registry_total_sec"]
    if "sf1_headline_total_sec" in out:
        compact["sf1_headline_total_sec"] = out["sf1_headline_total_sec"]
    if isinstance(out.get("streaming"), dict) and "error" not in out["streaming"]:
        compact["streaming_rows_per_sec"] = {
            k: v["rows_per_sec"] for k, v in out["streaming"].items()
        }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
