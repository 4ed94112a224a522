"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query (smoke, sf0.001)
queries()     -> name -> (spark, sf_dir) -> DataFrame, one per operator
                 from SURVEY.md §2 + the LLM-pipeline extension layer
oracle_sql()  -> matching DuckDB-runnable ANSI SQL (omitted for
                 non-SQL-expressible ops -> rows-only check)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)

from etl_property_rumah123_spark.plans import load_all  # noqa: E402

_REGISTRY = load_all()

_SHIPPED_TO: set[str] = set()


def _ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship the package to Python workers via ``addPyFile``.

    The driver owns the SparkSession and may run from any cwd; local-mode
    Python workers resolve cloudpickled references to
    ``etl_property_rumah123_spark`` through their own sys.path (driver
    cwd + PYTHONPATH), neither of which we control. ``addPyFile`` is the
    runtime-safe channel: the zip lands in every worker's sys.path at
    task deserialization, so the DataSource / pandas-UDF queries work
    no matter where the driver process started.
    """
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _SHIPPED_TO:
        return
    import tempfile
    import zipfile

    # Rebuilt once per session (not cached on disk: a stale zip would
    # shadow edited sources). Built in a fresh private tempdir — a
    # fixed world-writable path could be pre-created/symlinked by
    # another local user, and two concurrent drivers with different
    # source trees would race on it. addPyFile copies the file into
    # Spark's own staging dir, so the private path needs no sharing.
    zip_dir = tempfile.mkdtemp(prefix="etl_property_rumah123_spark_pyfiles_")
    pkg_zip = os.path.join(zip_dir, "etl_property_rumah123_spark.zip")
    pkg_dir = os.path.join(_REPO_DIR, "etl_property_rumah123_spark")
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, _REPO_DIR))
    sc.addPyFile(pkg_zip)
    # Executors fetch the file from the driver's file server LAZILY (in
    # local mode straight from this path), so the zip must outlive the
    # session — clean it at process exit instead of leaking one tempdir
    # per driver run on /tmp.
    import atexit
    import shutil

    atexit.register(shutil.rmtree, zip_dir, ignore_errors=True)
    _SHIPPED_TO.add(app_id)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 3-way join -> agg ->
    top-k shipping-priority revenue (driver checks rows > 0)."""
    _ensure_workers_can_import(spark)
    return _REGISTRY["q3_shipping_priority"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + extensions)."""

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_workers_can_import(spark)
            return spec.fn(spark, sf_dir)

        run.__name__ = spec.name
        run.__doc__ = spec.doc
        return run

    return {name: wrap(spec) for name, spec in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {
        name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle
    }
