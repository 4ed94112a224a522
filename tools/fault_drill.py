"""Fault-injection drill: exactly-once under REAL mid-write task failures.

Every exactly-once claim in this repo (idempotent ON CONFLICT merge,
full-staging-replace, token-named snapshot commit dirs + atomic
manifest rename) is asserted by design and tested on clean runs. This
drill induces the failures those designs exist for and asserts the
final state is BYTE-EQUAL to a single clean run:

1. ``snapshot_task_retry`` — a data-write task raises AFTER producing
   rows on attempt 0 (``TaskContext.attemptNumber()``) and succeeds on
   retry. Spark's output-commit protocol must publish each partition
   exactly once; the committed snapshot equals a clean commit.
2. ``snapshot_interrupted_commit`` — a writer crashes BETWEEN the data
   write and the manifest rename (orphan commit dir + staged .tmp
   manifest left behind). A retried commit must produce the clean
   state; vacuum must retire the orphans; the read never sees them.
3. ``merge_task_retry`` / ``mor_merge_task_retry`` — the CoW and MoR
   snapshot merges driven by a batch whose evaluation fails its first
   attempt in every job (semi-join, DV write, rewrite write).
4. ``pgwire_staging_retry`` (with ``--pg-sock``) — the reference load
   path (truncate staging -> per-partition wire INSERT -> ON CONFLICT
   merge with xmax accounting, /root/reference/src/load.py:30-43 under
   /root/reference/dags/dags.py:17-24's retry policy) where one
   partition task dies AFTER its staging transaction committed. The
   retried attempt re-inserts the partition, staging holds exact
   duplicates, and the merge's DISTINCT must still land the batch
   exactly once (fresh == batch, replay == 0).

Runs on its own ``local[4,3]`` session (3 = task retries enabled —
the shared test session's ``local[8]`` would fail the job on the
first injected fault), so callers invoke it as a subprocess; prints
one JSON line. ``DRILL_MASTER`` overrides the master (the cluster
smoke reuses these scenarios cross-JVM via ``spark.task.maxFailures``).

Usage:
    python tools/fault_drill.py [--pg-sock /path/to/socketdir]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_fault_map(marker_dir: str, fail_partition: int = 1):
    """A mapInPandas passthrough that raises on the FIRST attempt of
    ``fail_partition`` in every job it participates in, dropping a
    marker file first so callers can assert the fault actually fired
    (a vacuous pass with no injection would prove nothing)."""

    def f(iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if (
            ctx is not None
            and ctx.partitionId() == fail_partition
            and ctx.attemptNumber() == 0
        ):
            with open(
                os.path.join(marker_dir, f"m_{uuid.uuid4().hex}"), "w"
            ) as fh:
                fh.write("snapshot-fault")
            raise RuntimeError("injected task fault (attempt 0)")
        for batch in iterator:
            yield batch

    return f


def make_pg_post_commit_fault(marker_dir: str, fail_partition: int = 0):
    """post_commit_hook for write_staging_wire: die AFTER the staging
    transaction committed, on the first attempt only — the worst
    retry window (the re-run re-inserts the whole partition)."""

    def hook():
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if (
            ctx is not None
            and ctx.partitionId() == fail_partition
            and ctx.attemptNumber() == 0
        ):
            with open(
                os.path.join(marker_dir, f"pg_{uuid.uuid4().hex}"), "w"
            ) as fh:
                fh.write("pg-fault")
            raise RuntimeError("injected post-commit task fault (attempt 0)")

    return hook


def _rows(spark, table_log, path):
    return sorted(
        tuple(r) for r in table_log.read_snapshot(spark, path).collect()
    )


def _markers(marker_dir: str, prefix: str = "") -> int:
    return len(
        [n for n in os.listdir(marker_dir) if n.startswith(prefix or "")]
    )


def scenario_snapshot_task_retry(spark, work: str) -> str:
    from pyspark.sql import functions as F

    from etl_property_rumah123_spark.sinks import table_log

    marker = os.path.join(work, "m_snap")
    os.makedirs(marker)

    def base():
        return (
            spark.range(0, 4000)
            .select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
            .repartition(4, "k")
        )

    poisoned = base().mapInPandas(make_fault_map(marker), "k long, v long")
    t_fault = os.path.join(work, "snap_fault")
    t_clean = os.path.join(work, "snap_clean")
    v = table_log.commit_snapshot(poisoned, t_fault, mode="append")
    table_log.commit_snapshot(
        base().mapInPandas(lambda it: it, "k long, v long"),
        t_clean,
        mode="append",
    )
    if _markers(marker) < 1:
        return "FAIL fault never fired (injection is vacuous)"
    if table_log._list_versions(spark, t_fault) != [v]:
        return "FAIL extra versions committed"
    got, want = _rows(spark, table_log, t_fault), _rows(
        spark, table_log, t_clean
    )
    if got != want:
        return (
            f"FAIL rows differ under retry: got {len(got)} want {len(want)}"
        )
    return f"ok ({len(got)} rows exactly once, {_markers(marker)} faults fired)"


def scenario_snapshot_interrupted_commit(spark, work: str) -> str:
    from pyspark.sql import functions as F

    from etl_property_rumah123_spark.sinks import table_log

    def df():
        return spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )

    t = os.path.join(work, "snap_interrupted")
    t_clean = os.path.join(work, "snap_interrupted_clean")
    # Crash window 1: data fully written, manifest never staged.
    table_log._write_commit_dir(df(), t, "data/cdeadbeef0001")
    # Crash window 2: manifest staged as .tmp, rename never happened.
    table_log._write_file(
        spark,
        f"{t}/_log/.v0-deadbeef.json.tmp",
        json.dumps({"version": 0, "files": []}).encode(),
    )
    if table_log._list_versions(spark, t):
        return "FAIL interrupted commit is visible as a version"
    # The retried commit (fresh token) must land the clean state.
    v = table_log.commit_snapshot(df(), t, mode="append")
    table_log.commit_snapshot(df(), t_clean, mode="append")
    if _rows(spark, table_log, t) != _rows(spark, table_log, t_clean):
        return "FAIL retried commit state differs from clean run"
    deleted = table_log.vacuum(spark, t, keep_last=1, min_age_s=0)
    orphans = [p for p in deleted if "cdeadbeef0001" in p]
    tmps = [p for p in deleted if p.endswith(".json.tmp")]
    if not orphans or not tmps:
        return f"FAIL vacuum kept orphans: {deleted}"
    if _rows(spark, table_log, t) != _rows(spark, table_log, t_clean):
        return "FAIL vacuum of orphans changed the live read"
    return f"ok (version {v} clean, {len(orphans)} orphan dirs vacuumed)"


def _merge_scenario(spark, work: str, mor: bool) -> str:
    from pyspark.sql import functions as F

    from etl_property_rumah123_spark.sinks import table_log

    tag = "mor" if mor else "cow"
    marker = os.path.join(work, f"m_merge_{tag}")
    os.makedirs(marker)

    def base():
        return spark.range(0, 2000).select(
            F.col("id").alias("k"), F.lit(1).cast("long").alias("v")
        ).repartition(4, "k")

    def batch():
        return spark.range(0, 2500, 2).select(
            F.col("id").alias("k"), F.lit(9).cast("long").alias("v")
        ).repartition(4, "k")

    t_fault = os.path.join(work, f"merge_fault_{tag}")
    t_clean = os.path.join(work, f"merge_clean_{tag}")
    for t in (t_fault, t_clean):
        table_log.commit_snapshot(base(), t, mode="append")
    poisoned = batch().mapInPandas(make_fault_map(marker), "k long, v long")
    fn = table_log.merge_snapshot_mor if mor else table_log.merge_snapshot
    fn(poisoned, t_fault, key="k")
    fn(batch(), t_clean, key="k")
    if _markers(marker) < 1:
        return "FAIL fault never fired (injection is vacuous)"
    got, want = _rows(spark, table_log, t_fault), _rows(
        spark, table_log, t_clean
    )
    if got != want:
        return f"FAIL merge state differs: got {len(got)} want {len(want)}"
    if table_log._list_versions(spark, t_fault) != [0, 1]:
        return "FAIL merge committed extra versions"
    return f"ok ({len(got)} rows, {_markers(marker)} faults fired)"


def scenario_pgwire_staging_retry(spark, work: str, sock: str) -> str:
    from pyspark.sql import functions as F

    from etl_property_rumah123_spark.sinks.jdbc_merge import (
        merge_staging_to_main,
    )
    from etl_property_rumah123_spark.sinks.pgwire import (
        PgConnection,
        write_staging_wire,
    )

    n = 1200
    df = spark.range(n).select(
        F.concat(F.lit("https://l/"), F.col("id")).alias("link"),
        F.concat(F.lit("p"), F.col("id")).alias("name"),
        (F.col("id") * 1000).alias("price_rp"),
    ).repartition(4)
    want = sorted(
        (f"https://l/{i}", f"p{i}", i * 1000) for i in range(n)
    )

    def count(conn_sql):
        conn = PgConnection(sock)
        try:
            return int(conn.run(conn_sql)[0][0])
        finally:
            conn.close()

    # Two staging regimes, both under the same post-commit task death:
    #   keyed  — the reference schema (init.sql puts a PK on staging):
    #            the retry's re-insert must be an ON CONFLICT no-op, so
    #            staging holds EXACTLY the batch (a plain INSERT would
    #            die on the PK and fail the job after maxFailures);
    #   unkeyed — bulk staging without constraints: the retry leaves
    #            exact duplicates and the merge's DISTINCT collapses.
    outcomes = []
    for tag, key_sql, expect_dupes in (
        ("keyed", "link VARCHAR PRIMARY KEY", False),
        ("unkeyed", "link VARCHAR", True),
    ):
        stg, main = f"fd_stg_{tag}", f"fd_main_{tag}"
        marker = os.path.join(work, f"m_pg_{tag}")
        os.makedirs(marker)
        conn = PgConnection(sock)
        conn.run(
            f"CREATE TABLE {main} (link VARCHAR PRIMARY KEY, "
            "name VARCHAR, price_rp BIGINT)"
        )
        conn.run(f"CREATE TABLE {stg} ({key_sql}, name VARCHAR, price_rp BIGINT)")
        conn.close()

        # Faulty run: partition 0's task dies AFTER its staging commit.
        write_staging_wire(
            df, sock, stg, batch_size=100,
            post_commit_hook=make_pg_post_commit_fault(marker),
        )
        if _markers(marker) < 1:
            return f"FAIL {tag}: fault never fired (injection is vacuous)"
        stg_n = count(f"SELECT count(*) FROM {stg}")
        if expect_dupes and stg_n <= n:
            return f"FAIL {tag}: no retry duplicates in staging ({stg_n})"
        if not expect_dupes and stg_n != n:
            return f"FAIL {tag}: staging {stg_n} != batch {n}"
        fresh = merge_staging_to_main(
            lambda: PgConnection(sock), df.columns, stg, main,
            "link", distinct=True,
        )
        conn = PgConnection(sock)
        main_rows = sorted(
            conn.run(f"SELECT link, name, price_rp FROM {main}")
        )
        conn.close()
        if fresh != n:
            return f"FAIL {tag}: fresh={fresh} want={n} (xmax accounting)"
        if main_rows != want:
            return f"FAIL {tag}: main table differs from clean expectation"
        # Replay the whole load cleanly: idempotent, 0 fresh inserts.
        write_staging_wire(df, sock, stg, batch_size=100)
        fresh2 = merge_staging_to_main(
            lambda: PgConnection(sock), df.columns, stg, main,
            "link", distinct=True,
        )
        if fresh2 != 0:
            return f"FAIL {tag}: replay fresh={fresh2} want=0"
        outcomes.append(f"{tag}: stg={stg_n}, fresh={fresh}, replay=0")
    return f"ok ({n} rows exactly once; {'; '.join(outcomes)})"


def scenario_ann_index_task_retry(spark, work: str) -> str:
    """Task retry during ``append_ann_index``'s cell write: the
    parquet job committer publishes exactly one attempt's files, so a
    task dying on attempt 0 must leave the persisted ANN index
    byte-equal (row counts and probe results) to a clean build+append
    — no duplicated and no lost vectors. This is the committer-level
    exactly-once the index's append contract leans on (a RETRIED WHOLE
    append is the documented duplicate case that probes collapse and
    compaction removes — different regime, covered in
    test_similarity_recall.py)."""
    import math

    from etl_property_rumah123_spark.operators import similarity

    marker = os.path.join(work, "m_ann")
    os.makedirs(marker)

    def vec(i: int) -> list[float]:
        return [math.sin(i * 17.0 + d) for d in range(8)]

    schema = "vec_id long, embedding array<double>"
    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(200)], schema
    ).repartition(4)
    batch = spark.createDataFrame(
        [(i, vec(i)) for i in range(200, 240)], schema
    ).repartition(4)

    clean = os.path.join(work, "ann_clean")
    faulty = os.path.join(work, "ann_faulty")
    similarity.write_ann_index(corpus, clean, n_lists=4)
    similarity.append_ann_index(batch, clean)
    similarity.write_ann_index(corpus, faulty, n_lists=4)
    poisoned = batch.mapInPandas(make_fault_map(marker), schema)
    similarity.append_ann_index(poisoned, faulty)
    if _markers(marker) < 1:
        return "FAIL ann_index: fault never fired (injection is vacuous)"

    spark.catalog.refreshByPath(f"{clean}/cells")
    spark.catalog.refreshByPath(f"{faulty}/cells")
    n_clean = spark.read.parquet(f"{clean}/cells").count()
    n_faulty = spark.read.parquet(f"{faulty}/cells").count()
    if n_faulty != n_clean:
        return (
            f"FAIL ann_index: cells rows {n_faulty} != clean {n_clean} "
            "(task retry duplicated or lost vectors)"
        )
    q = corpus.filter("vec_id % 50 = 0")

    def probe(path: str):
        return sorted(
            tuple(r)
            for r in similarity.probe_ann_index(
                q, path, k=5, n_probe=2
            ).collect()
        )

    if probe(faulty) != probe(clean):
        return "FAIL ann_index: probe results differ from clean run"
    return (
        f"ok ({n_faulty} index rows exactly once, "
        f"{_markers(marker)} faults fired)"
    )


def scenario_wap_publish_retry(spark, work: str) -> str:
    """Write-audit-publish under the two fault windows it owns: a REAL
    injected task death during the staged write (attempt-0 kill inside
    an executor — the stage must land exactly-once and audit clean),
    and the publish crash window (process dies between the manifest
    rename and the stage-marker delete; the re-run must NOT append the
    batch a second time). Plus the version-race window of the new
    incremental OPTIMIZE: a competing writer occupies the next
    version; optimize must rebase past it with content intact."""
    import json as _json

    from pyspark.sql import functions as F

    from etl_property_rumah123_spark.sinks import table_log

    marker = os.path.join(work, "m_wap")
    os.makedirs(marker)
    t = os.path.join(work, "wap_table")

    def base(lo, hi):
        return (
            spark.range(lo, hi)
            .select(F.col("id").alias("k"), (F.col("id") * 7).alias("v"))
            .repartition(4, "k")
        )

    table_log.commit_snapshot(base(0, 4000), t, bloom_cols=["k"])
    # 1) staged write with an injected attempt-0 task death
    poisoned = base(4000, 6000).mapInPandas(
        make_fault_map(marker), "k long, v long"
    )
    table_log.stage_snapshot(poisoned, t, name="drill")
    if _markers(marker) < 1:
        return "FAIL fault never fired (injection is vacuous)"
    staged_rows = sorted(
        tuple(r)
        for r in table_log.read_staged(spark, t, "drill").collect()
    )
    want_batch = sorted(tuple(r) for r in base(4000, 6000).collect())
    if staged_rows != want_batch:
        return (
            f"FAIL staged rows under retry: got {len(staged_rows)} "
            f"want {len(want_batch)}"
        )
    # 2) publish, then replay the crash window (marker restored)
    staged_json = table_log._read_file(spark, f"{t}/_log/staged/drill.json")
    v = table_log.publish_staged(spark, t, "drill")
    table_log._write_file(spark, f"{t}/_log/staged/drill.json", staged_json)
    v2 = table_log.publish_staged(spark, t, "drill")
    if v2 != v or len(table_log._list_versions(spark, t)) != v + 1:
        return f"FAIL publish replay re-appended (v={v}, replay={v2})"
    if table_log.read_snapshot(spark, t).count() != 6000:
        return "FAIL row count after publish replay"
    # 3) optimize loses a version race: occupy the next version
    next_v = v + 1
    cur = table_log._manifest(spark, t, v)
    table_log._write_file(
        spark,
        f"{t}/_log/v{next_v}.json",
        _json.dumps(
            {
                "version": next_v,
                "operation": "append",
                "files": cur["files"],
                "n_files": cur["n_files"],
                "schema": cur.get("schema"),
                "bloom_cols": cur.get("bloom_cols", {}),
            }
        ).encode(),
    )
    ov = table_log.optimize_snapshot(
        spark, t, target_file_bytes=1 << 30, small_file_bytes=1 << 30
    )
    if ov != next_v + 1:
        return f"FAIL optimize did not rebase past the race (v={ov})"
    got = _rows(spark, table_log, t)
    want = sorted(tuple(r) for r in base(0, 6000).collect())
    if got != want:
        return f"FAIL rows after raced optimize: {len(got)} vs {len(want)}"
    return (
        f"ok ({len(got)} rows exactly once through stage-fault + "
        f"publish-replay + raced optimize, {_markers(marker)} faults fired)"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pg-sock", default=None)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated scenario names to run (default: all)",
    )
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def wanted(name: str) -> bool:
        return only is None or name in only

    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    from pyspark.sql import SparkSession

    master = os.environ.get("DRILL_MASTER", "local[4,3]")
    spark = (
        SparkSession.builder.master(master)
        .appName("fault_drill")
        .config("spark.task.maxFailures", "3")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="fault_drill_")
    results: dict[str, str] = {}
    try:
        if wanted("snapshot_task_retry"):
            results["snapshot_task_retry"] = scenario_snapshot_task_retry(
                spark, work
            )
        if wanted("snapshot_interrupted_commit"):
            results["snapshot_interrupted_commit"] = (
                scenario_snapshot_interrupted_commit(spark, work)
            )
        if wanted("merge_task_retry"):
            results["merge_task_retry"] = _merge_scenario(
                spark, work, mor=False
            )
        if wanted("mor_merge_task_retry"):
            results["mor_merge_task_retry"] = _merge_scenario(
                spark, work, mor=True
            )
        if wanted("ann_index_task_retry"):
            results["ann_index_task_retry"] = scenario_ann_index_task_retry(
                spark, work
            )
        if wanted("wap_publish_retry"):
            results["wap_publish_retry"] = scenario_wap_publish_retry(
                spark, work
            )
        if args.pg_sock and wanted("pgwire_staging_retry"):
            results["pgwire_staging_retry"] = scenario_pgwire_staging_retry(
                spark, work, args.pg_sock
            )
    except Exception as ex:  # noqa: BLE001
        results["exception"] = f"ERROR {type(ex).__name__}: {str(ex)[:300]}"
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    failures = sum(
        1 for v in results.values() if not v.startswith("ok")
    )
    for k, v in results.items():
        print(f"{k}: {v}", flush=True)
    print(json.dumps({"results": results, "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
