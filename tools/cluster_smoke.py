"""Cluster-mode smoke: run the headline + worker-Python queries on a
multi-JVM master and value-diff against the DuckDB oracle.

Every other check in this repo runs on ``local[N]`` — one JVM, where
broadcast, Python-worker imports, and task serialization all share the
driver process. This script re-runs the riskiest registry entries on
``local-cluster[2,8,4096]`` (2 separate executor JVMs, 8 cores and
4 GiB each — Spark's real multi-process scheduler, same code path as
standalone mode) so cross-process assumptions actually cross a process:

- ``addPyFile`` package shipping (__spark_entry__._ensure_workers_can_import):
  the DataSource entry (listing_pipeline_end_to_end) and the pandas-UDF
  entries (multimodal_process_suite, knn/ann) import the package inside
  executor-side Python workers that did NOT inherit the driver's
  sys.path.
- Broadcast joins / broadcast model state actually serialize over the
  block-transfer service instead of staying heap-local.
- Arrow batches for pandas_udf / mapInPandas / applyInPandas move
  through executor Python workers launched by the executor JVMs.

Usage (from /root/repo, must be the only Spark JVM up):

    python tools/cluster_smoke.py                 # sf0.01, 11 queries
    SMOKE_SF=/root/testdata/sf0.001 python tools/cluster_smoke.py
    SMOKE_QUERIES=all python tools/cluster_smoke.py   # full 50-entry registry

Expect ``failures: 0`` and ``executor JVMs: 2 (distinct from driver)``.
Exit code 1 on any failure.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SMOKE_SF", "/root/testdata/sf0.01")
MASTER = os.environ.get("SMOKE_MASTER", "local-cluster[2,8,4096]")
WHICH = os.environ.get("SMOKE_QUERIES", "")

# The named scope from the round-6 verdict: every headline query, the
# Python DataSource entry, and the heaviest pandas-UDF suite.
EXTRA = ["listing_pipeline_end_to_end", "multimodal_process_suite", "ann_suite"]


def _pgwire_stage(spark) -> str:
    """Throwaway Postgres + the full reference load path from the
    cluster: staging truncate, per-partition batched wire INSERTs
    from executor Python workers, ON CONFLICT merge with xmax
    accounting, and an idempotent second run (0 fresh inserts)."""
    import shutil
    import subprocess
    import tempfile
    import time as _time

    if not shutil.which("initdb") or not shutil.which("pg_ctl"):
        return "skipped (no postgres server binaries)"

    def run_as_pg(args):
        if os.geteuid() == 0:
            args = ["runuser", "-u", "postgres", "--", *args]
        return subprocess.run(args, capture_output=True, text=True)

    base = tempfile.mkdtemp(prefix="pgsmoke_", dir="/tmp")
    data, sock = os.path.join(base, "data"), os.path.join(base, "sock")
    os.makedirs(data)
    os.makedirs(sock)
    try:
        if os.geteuid() == 0:
            r = subprocess.run(
                ["chown", "-R", "postgres:postgres", base],
                capture_output=True, text=True,
            )
            if r.returncode != 0:
                return f"skipped (chown: {r.stderr[:120]})"
        r = run_as_pg(
            ["initdb", "-D", data, "--auth=trust",
             "--username=postgres", "-E", "UTF8"]
        )
        if r.returncode != 0:
            return f"skipped (initdb: {r.stderr[-120:]})"
        r = run_as_pg(
            ["pg_ctl", "-D", data, "-w", "-o",
             f"-c listen_addresses='' -c unix_socket_directories={sock}",
             "-l", os.path.join(base, "log"), "start"]
        )
        if r.returncode != 0:
            return f"skipped (pg_ctl: {r.stderr[-120:]})"
        try:
            from pyspark.sql import functions as F

            from etl_property_rumah123_spark.sinks.pgwire import (
                PgConnection,
                load_to_postgres_wire,
            )

            cols = (
                "link VARCHAR PRIMARY KEY, name VARCHAR, price_rp BIGINT"
            )
            conn = PgConnection(sock)
            conn.run(f"CREATE TABLE property_rumah ({cols})")
            conn.run(f"CREATE TABLE stg_property_rumah ({cols})")
            conn.close()

            t0 = _time.time()
            df = spark.range(2000).select(
                F.concat(F.lit("https://l/"), F.col("id")).alias("link"),
                F.concat(F.lit("prop "), F.col("id")).alias("name"),
                (F.col("id") * 1000).alias("price_rp"),
            ).repartition(8)
            fresh1 = load_to_postgres_wire(
                df, sock, "stg_property_rumah", "property_rumah", "link",
                batch_size=250,
            )
            fresh2 = load_to_postgres_wire(
                df, sock, "stg_property_rumah", "property_rumah", "link",
                batch_size=250,
            )
            # Third load with an injected post-commit task death
            # (attempt 0 of partition 0 dies AFTER its staging
            # transaction committed; the retry runs in an executor
            # JVM). Keyed staging + ON CONFLICT DO NOTHING makes the
            # re-insert a no-op: staging holds exactly the batch and
            # the merge stays idempotent.
            import tempfile as _tf

            from etl_property_rumah123_spark.sinks.jdbc_merge import (
                merge_staging_to_main,
            )
            from etl_property_rumah123_spark.sinks.pgwire import (
                write_staging_wire,
            )
            from tools.fault_drill import make_pg_post_commit_fault

            marker = _tf.mkdtemp(prefix="smoke_pgfault_")
            write_staging_wire(
                df, sock, "stg_property_rumah", batch_size=250,
                post_commit_hook=make_pg_post_commit_fault(marker),
            )
            fault_fired = len(os.listdir(marker)) >= 1
            conn = PgConnection(sock)
            stg_n = conn.run(
                "SELECT count(*) FROM stg_property_rumah"
            )[0][0]
            conn.close()
            fresh3 = merge_staging_to_main(
                lambda: PgConnection(sock), df.columns,
                "stg_property_rumah", "property_rumah", "link",
                distinct=True,
            )
            conn = PgConnection(sock)
            n = conn.run("SELECT count(*) FROM property_rumah")[0][0]
            conn.close()
            if (
                fresh1 == 2000 and fresh2 == 0 and int(n) == 2000
                and fault_fired and int(stg_n) == 2000 and fresh3 == 0
            ):
                return (
                    f"ok (2000 rows, xmax replay 0, post-commit task "
                    f"death retried exactly-once, {_time.time()-t0:.1f}s)"
                )
            return (
                f"FAIL fresh1={fresh1} fresh2={fresh2} rows={n} "
                f"fault_fired={fault_fired} stg={stg_n} fresh3={fresh3}"
            )
        finally:
            run_as_pg(["pg_ctl", "-D", data, "-m", "immediate", "stop"])
    except Exception as ex:  # noqa: BLE001
        return f"ERROR {type(ex).__name__}: {str(ex)[:200]}"
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> int:
    # Load the driver contract exactly as the external driver does.
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # Executor JVMs launch their own Python workers; pin them to this
    # interpreter so the smoke is not at the mercy of PATH.
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(MASTER)
        .appName("cluster_smoke")
        # Bare-driver session on purpose: no ansi/legacy/Arrow configs,
        # mirroring the external driver. 3g < the 4096 MiB worker cap.
        .config("spark.executor.memory", "3g")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "4g")
        # task retries ON (cluster default is 4; pinned explicit so the
        # fault_retry stage below genuinely exercises cross-JVM retry)
        .config("spark.task.maxFailures", "3")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Prove we really have >1 executor JVM, all distinct from the driver:
    # collect (pid) per task across enough partitions to hit both workers.
    import operator

    driver_pid = os.getpid()
    pids = set(
        spark.sparkContext.parallelize(range(64), 64)
        .map(lambda _: os.getpid())
        .distinct()
        .collect()
    )
    exec_hosts = (
        spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
    )  # executors + driver: local[N] = 1, standalone 1 worker = 2,
    # local-cluster[2,..] = 3. >= 2 means at least one executor JVM
    # that is not the driver ran the tasks (the python-worker pid
    # check alone cannot distinguish: workers fork off-driver even in
    # local mode).
    multi_jvm = driver_pid not in pids and exec_hosts >= 2
    print(
        f"executor python-worker pids: {sorted(pids)} driver_pid={driver_pid} "
        f"executor-map size={exec_hosts} multi_jvm={multi_jvm}"
    )

    import duckdb

    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    for t in tables:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = mod.queries()
    oracles = mod.oracle_sql()
    from etl_property_rumah123_spark.plans import load_all

    registry = load_all()
    if WHICH == "all":
        names = list(registry)
    elif WHICH:
        names = [n for n in WHICH.split(",") if n]
    else:
        names = [n for n, s in registry.items() if s.headline] + EXTRA

    failures = 0
    results: dict[str, str] = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF)
            cols = sorted(sdf.columns)
            srows = sorted(
                repr(tuple(r[c] for c in cols)) for r in sdf.collect()
            )
            res = con.execute(oracles[name])
            rcols = [d[0] for d in res.description]
            ocols = sorted(rcols)
            idx = [rcols.index(c) for c in ocols]
            orows = sorted(
                repr(tuple(row[i] for i in idx)) for row in res.fetchall()
            )
            if cols != ocols:
                results[name] = f"FAIL schema spark={cols} oracle={ocols}"
                failures += 1
            elif srows != orows:
                n_bad = sum(map(operator.ne, srows, orows)) + abs(
                    len(srows) - len(orows)
                )
                results[name] = (
                    f"FAIL values rows spark={len(srows)} oracle={len(orows)} "
                    f"diff={n_bad}"
                )
                failures += 1
            else:
                results[name] = f"ok ({len(srows)} rows, {time.time()-t0:.1f}s)"
        except Exception as ex:  # noqa: BLE001
            results[name] = f"ERROR {type(ex).__name__}: {str(ex)[:200]}"
            failures += 1
        print(f"{name}: {results[name]}", flush=True)

    # --- streaming stage: the state-server surfaces the batch registry
    # cannot reach. transformWithStateInPandas runs the protolite
    # protocol shim inside EXECUTOR-launched Python workers against
    # executor-local RocksDB state servers — the exact cross-process
    # hop a single local[N] JVM never exercises. Pinned equal to the
    # applyInPandasWithState gate on the same data, same cluster.
    if os.environ.get("SMOKE_STREAMING", "1") != "0":
        t0 = time.time()
        try:
            import shutil
            import tempfile

            from etl_property_rumah123_spark.sources.catalog import table
            from etl_property_rumah123_spark.streaming import pipelines, tws

            events_dir = tempfile.mkdtemp(prefix="smoke_events_")
            try:
                table(spark, SF, "events").limit(20000).write.mode(
                    "overwrite"
                ).parquet(events_dir)
                schema = spark.read.parquet(events_dir).schema

                def stream():
                    return spark.readStream.schema(schema).parquet(events_dir)

                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass",
                    "org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider",
                )

                def drain(df, name):
                    q = pipelines.run_to_memory_sink(
                        df, name, output_mode="append"
                    )
                    q.awaitTermination()
                    return spark.table(name)

                got = drain(
                    tws.streaming_dedup_admission_tws(stream(), n_recent=1000),
                    "smoke_tws",
                )
                want = drain(
                    pipelines.streaming_dedup_admission(
                        stream(), n_recent=1000
                    ),
                    "smoke_gate_ref",
                )
                g = {
                    (r["user_id"], r["event_id"], r["digest"])
                    for r in got.collect()
                }
                w = {
                    (r["user_id"], r["event_id"], r["digest"])
                    for r in want.collect()
                }
                if g and g == w:
                    results["streaming_tws_gate"] = (
                        f"ok ({len(g)} admissions, {time.time()-t0:.1f}s)"
                    )
                else:
                    results["streaming_tws_gate"] = (
                        f"FAIL tws={len(g)} ref={len(w)} equal={g == w}"
                    )
                    failures += 1
            finally:
                shutil.rmtree(events_dir, ignore_errors=True)
        except Exception as ex:  # noqa: BLE001
            results["streaming_tws_gate"] = (
                f"ERROR {type(ex).__name__}: {str(ex)[:200]}"
            )
            failures += 1
        print(f"streaming_tws_gate: {results['streaming_tws_gate']}", flush=True)

    # --- streaming LEFT OUTER join stage (round 11): the last
    # stateful-streaming surface without daemon-mode evidence. The
    # watermark-driven null-emission contract — matched pairs equal
    # the batch left-join, null rows appear exactly for clicks whose
    # join window is PROVABLY closed — runs against executor-local
    # RocksDB join state across real worker daemons.
    if os.environ.get("SMOKE_STREAMING", "1") != "0":
        t0 = time.time()
        try:
            import shutil
            import tempfile

            from pyspark.sql import functions as F

            from etl_property_rumah123_spark.sources.catalog import table
            from etl_property_rumah123_spark.streaming import pipelines

            events_dir = tempfile.mkdtemp(prefix="smoke_outer_")
            try:
                table(spark, SF, "events").limit(20000).write.mode(
                    "overwrite"
                ).parquet(events_dir)
                schema = spark.read.parquet(events_dir).schema

                def stream():
                    return spark.readStream.schema(schema).parquet(
                        events_dir
                    )

                clicks = stream().filter(F.col("event_type") == "click")
                buys = stream().filter(F.col("event_type") == "purchase")
                q = pipelines.run_to_memory_sink(
                    pipelines.click_purchase_outer_join(
                        clicks, buys, max_gap="6 hours", watermark="1 hours"
                    ),
                    "smoke_outer",
                    output_mode="append",
                )
                q.awaitTermination()
                out = spark.table("smoke_outer")
                got_matched = {
                    (r["click_id"], r["purchase_id"])
                    for r in out.filter("purchase_id IS NOT NULL").collect()
                }
                got_nulls = {
                    r["click_id"]
                    for r in out.filter("purchase_id IS NULL").collect()
                }
                batch = spark.read.parquet(events_dir)
                c = batch.filter(F.col("event_type") == "click").select(
                    F.col("event_id").alias("click_id"),
                    "user_id",
                    F.col("ts").alias("cts"),
                )
                p = batch.filter(F.col("event_type") == "purchase").select(
                    F.col("event_id").alias("purchase_id"),
                    F.col("user_id").alias("p_user_id"),
                    F.col("ts").alias("pts"),
                )
                pairs = c.join(
                    p,
                    (F.col("user_id") == F.col("p_user_id"))
                    & (F.col("pts") > F.col("cts"))
                    & (
                        F.col("pts")
                        <= F.col("cts") + F.expr("INTERVAL 6 hours")
                    ),
                    "left_outer",
                )
                want_matched = {
                    (r["click_id"], r["purchase_id"])
                    for r in pairs.filter(
                        "purchase_id IS NOT NULL"
                    ).collect()
                }
                # global watermark = MIN across both inputs
                max_ts = min(
                    batch.filter("event_type = 'click'")
                    .agg(F.max("ts")).collect()[0][0],
                    batch.filter("event_type = 'purchase'")
                    .agg(F.max("ts")).collect()[0][0],
                )
                unmatched = pairs.filter("purchase_id IS NULL")

                def horizon(margin):
                    return {
                        r["click_id"]
                        for r in unmatched.filter(
                            F.col("cts")
                            + F.expr("INTERVAL 7 hours")
                            + F.expr(f"INTERVAL {margin}")
                            <= F.lit(max_ts)
                        ).collect()
                    }

                definite = horizon("1 minutes")
                possible = horizon("-1 minutes")
                ok = (
                    want_matched
                    and got_matched == want_matched
                    and definite <= got_nulls <= possible
                )
                if ok:
                    results["streaming_left_outer"] = (
                        f"ok ({len(got_matched)} matched, "
                        f"{len(got_nulls)} null-extended, "
                        f"{time.time()-t0:.1f}s)"
                    )
                else:
                    results["streaming_left_outer"] = (
                        f"FAIL matched {len(got_matched)} vs "
                        f"{len(want_matched)}; nulls {len(got_nulls)} "
                        f"bracket [{len(definite)}, {len(possible)}]"
                    )
                    failures += 1
            finally:
                shutil.rmtree(events_dir, ignore_errors=True)
        except Exception as ex:  # noqa: BLE001
            results["streaming_left_outer"] = (
                f"ERROR {type(ex).__name__}: {str(ex)[:200]}"
            )
            failures += 1
        print(
            f"streaming_left_outer: {results['streaming_left_outer']}",
            flush=True,
        )

    # --- snapshot-table streaming SOURCE stage (round 11): tail a
    # snapshot-log table across real worker daemons — the Python
    # DataSource's partitions() plan on the driver, file-grain reads
    # in EXECUTOR Python workers (pyarrow), offsets checkpointed, a
    # compaction between runs re-delivering nothing.
    if os.environ.get("SMOKE_STREAMING", "1") != "0":
        t0 = time.time()
        try:
            import shutil
            import tempfile

            from pyspark.sql import functions as F

            from etl_property_rumah123_spark.sinks import table_log
            from etl_property_rumah123_spark.sources.table_stream_source import (
                SnapshotTableDataSource,
            )

            spark.dataSource.register(SnapshotTableDataSource)
            root = tempfile.mkdtemp(prefix="smoke_tbl_src_")
            try:
                t = f"{root}/tbl"
                sink, ck = f"{root}/sink", f"{root}/ck"
                table_log.commit_snapshot(
                    spark.range(0, 5000).select(
                        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
                    ),
                    t,
                )

                def drain():
                    q = (
                        spark.readStream.format("snapshot_table")
                        .option("path", t)
                        .load()
                        .writeStream.format("parquet")
                        .option("path", sink)
                        .option("checkpointLocation", ck)
                        .trigger(availableNow=True)
                        .start()
                    )
                    q.awaitTermination()
                    spark.catalog.refreshByPath(sink)
                    rows = spark.read.parquet(sink).collect()
                    return [r["k"] for r in rows]

                got1 = drain()
                table_log.compact_snapshot(spark, t, target_files=2)
                table_log.commit_snapshot(
                    spark.range(5000, 5100).select(
                        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
                    ),
                    t,
                )
                got2 = drain()
                ok = (
                    sorted(got1) == list(range(5000))
                    and sorted(got2) == list(range(5100))
                    and len(got2) == 5100  # compaction re-delivered 0
                )
                if ok:
                    results["snapshot_table_source"] = (
                        f"ok (5000 initial + 100 tailed, compaction "
                        f"re-delivered 0, {time.time()-t0:.1f}s)"
                    )
                else:
                    results["snapshot_table_source"] = (
                        f"FAIL initial {len(got1)} tail-total {len(got2)}"
                    )
                    failures += 1
            finally:
                shutil.rmtree(root, ignore_errors=True)
        except Exception as ex:  # noqa: BLE001
            results["snapshot_table_source"] = (
                f"ERROR {type(ex).__name__}: {str(ex)[:200]}"
            )
            failures += 1
        print(
            f"snapshot_table_source: {results['snapshot_table_source']}",
            flush=True,
        )

    # --- pgwire stage: the executor-side sink fan-out. write_staging
    # runs per-PARTITION inside executor Python workers, each opening
    # its own wire connection — on local[N] those workers share the
    # driver process tree; here they are children of the executor
    # JVMs. Boots the same throwaway trust-auth Postgres as
    # tests/test_pg_real.py; records "skipped" (not a failure) when
    # the environment cannot run a server.
    if os.environ.get("SMOKE_PGWIRE", "1") != "0":
        results["pgwire_fanout"] = _pgwire_stage(spark)
        if results["pgwire_fanout"].startswith(("FAIL", "ERROR")):
            failures += 1
        print(f"pgwire_fanout: {results['pgwire_fanout']}", flush=True)

    # --- fault-retry stage: exactly-once under a REAL task death in a
    # separate executor JVM. A data-write task raises on attempt 0
    # (TaskContext.attemptNumber()); the scheduler re-runs it in an
    # executor process, and the committed snapshot must equal a clean
    # run — the cross-JVM form of tests/test_fault_injection.py.
    if os.environ.get("SMOKE_FAULT", "1") != "0":
        t0 = time.time()
        try:
            import shutil
            import tempfile

            from tools.fault_drill import scenario_snapshot_task_retry

            work = tempfile.mkdtemp(prefix="smoke_fault_")
            try:
                res = scenario_snapshot_task_retry(spark, work)
            finally:
                shutil.rmtree(work, ignore_errors=True)
            results["fault_retry"] = (
                f"{res} [{time.time()-t0:.1f}s]"
                if res.startswith("ok")
                else res
            )
            if not res.startswith("ok"):
                failures += 1
        except Exception as ex:  # noqa: BLE001
            results["fault_retry"] = (
                f"ERROR {type(ex).__name__}: {str(ex)[:200]}"
            )
            failures += 1
        print(f"fault_retry: {results['fault_retry']}", flush=True)

    if not multi_jvm:
        failures += 1
        print("FAIL: not actually multi-JVM (driver pid ran tasks)")

    print(
        json.dumps(
            {
                "master": MASTER,
                "sf": SF,
                "queries": len(names),
                "failures": failures,
                "multi_jvm": multi_jvm,
            }
        )
    )
    print(f"failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
