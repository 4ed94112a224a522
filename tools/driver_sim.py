"""Driver-harness simulation: run every oracle_sql() query on a bare
ANSI-default Spark session at SF and value-diff against DuckDB.
Run FROM /root/repo. Expect `failures: 0`."""
import importlib.util
import os
import sys
import time

SF = os.environ.get("SIM_SF", "/root/testdata/sf0.01")
SKIP = set(os.environ.get("SIM_SKIP", "").split(",")) - {""}
# SIM_ONLY=a,b,c restricts the run to those queries (fast iteration on
# a touched operator; the full run remains the pre-commit bar).
ONLY = set(os.environ.get("SIM_ONLY", "").split(",")) - {""}

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import duckdb  # noqa: E402

con = duckdb.connect()
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
for t in TABLES:
    p = os.path.join(SF, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

queries = mod.queries()
oracles = mod.oracle_sql()
failures = 0
for name, sql in oracles.items():
    if name in SKIP or (ONLY and name not in ONLY):
        print(f"{name}: SKIPPED")
        continue
    t0 = time.time()
    try:
        sdf = queries[name](spark, SF)
        cols = sorted(sdf.columns)
        srows = sorted(repr(tuple(r[c] for c in cols)) for r in sdf.collect())
        res = con.execute(sql)
        rcols = [d[0] for d in res.description]
        ocols = sorted(rcols)
        if cols != ocols:
            print(f"{name}: FAIL schema spark={cols} oracle={ocols}")
            failures += 1
            continue
        idx = [rcols.index(c) for c in ocols]
        orows = sorted(
            repr(tuple(row[i] for i in idx)) for row in res.fetchall()
        )
        if len(srows) != len(orows):
            print(f"{name}: FAIL rows spark={len(srows)} oracle={len(orows)}")
            failures += 1
        elif srows != orows:
            bad = next(
                (a, b) for a, b in zip(srows, orows) if a != b
            )
            print(f"{name}: FAIL values e.g. spark={bad[0][:120]} oracle={bad[1][:120]}")
            failures += 1
        else:
            print(f"{name}: ok ({len(srows)} rows, {time.time()-t0:.1f}s)")
    except Exception as ex:  # noqa: BLE001
        print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:200]}")
        failures += 1
rows_only = sorted(set(queries) - set(oracles))
for name in rows_only:
    try:
        n = queries[name](spark, SF).count()
        print(f"{name}: rows-only ({n} rows)")
        if n < 0:
            failures += 1
    except Exception as ex:  # noqa: BLE001
        print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:200]}")
        failures += 1
print(f"failures: {failures}")
sys.exit(1 if failures else 0)
