"""Exactly-once DEMONSTRATED under failure, not just asserted by design.

These tests run tools/fault_drill.py as a subprocess: the drill needs
its own SparkSession on ``local[4,3]`` (task retries enabled), and a
second SparkContext cannot share the test session's JVM. Each scenario
injects a real mid-write failure — a task raising on attempt 0 via
``TaskContext.attemptNumber()``, a writer crashing between the data
write and the manifest rename, a staging task dying after its
transaction committed — and asserts the final state is byte-equal to
a single clean run. The drill refuses to pass vacuously: every
injection drops a marker file and the scenario FAILs if no fault
actually fired.

Reference semantics matched: /root/reference/src/load.py:30-43 (full-
row ON CONFLICT merge) under /root/reference/dags/dags.py:17-24's
task-retry policy.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

# Reuse the throwaway-Postgres fixture (skips where no server can run).
from tests.test_pg_real import pg_sock  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRILL = os.path.join(REPO, "tools", "fault_drill.py")


def _run_drill(*argv: str, timeout: int = 420) -> dict:
    proc = subprocess.run(
        [sys.executable, DRILL, *argv],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=timeout,
    )
    lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    assert lines, (
        f"drill produced no JSON (exit {proc.returncode}):\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )
    out = json.loads(lines[-1])
    assert proc.returncode == (1 if out["failures"] else 0)
    return out


@pytest.mark.slow
def test_fault_drill_snapshot_exactly_once():
    """Task retry during the snapshot data write, a crash between data
    write and manifest rename, and retried CoW/MoR merges all converge
    to the clean-run state with no duplicate or lost rows."""
    out = _run_drill(
        "--only",
        "snapshot_task_retry,snapshot_interrupted_commit,"
        "merge_task_retry,mor_merge_task_retry",
    )
    assert out["failures"] == 0, out["results"]
    assert set(out["results"]) == {
        "snapshot_task_retry",
        "snapshot_interrupted_commit",
        "merge_task_retry",
        "mor_merge_task_retry",
    }
    for name, res in out["results"].items():
        assert res.startswith("ok"), f"{name}: {res}"
    # the injections really fired (non-vacuous)
    assert "faults fired" in out["results"]["snapshot_task_retry"]


@pytest.mark.slow
def test_fault_drill_ann_index_append_exactly_once():
    """A task dying on attempt 0 during append_ann_index's cell write
    must leave the persisted index identical (row count and probe
    results) to a clean build+append — the parquet committer publishes
    exactly one attempt's files."""
    out = _run_drill("--only", "ann_index_task_retry")
    assert out["failures"] == 0, out["results"]
    res = out["results"]["ann_index_task_retry"]
    assert res.startswith("ok") and "faults fired" in res, res


@pytest.mark.slow
def test_fault_drill_pgwire_staging_retry(pg_sock):  # noqa: F811
    """The reference load path with a staging task dying AFTER its
    transaction committed: the retried attempt re-inserts the whole
    partition (duplicates observed in staging), the DISTINCT merge
    still lands the batch exactly once with xmax fresh-insert
    accounting intact, and a full replay inserts 0 rows."""
    out = _run_drill("--pg-sock", pg_sock, "--only", "pgwire_staging_retry")
    assert out["failures"] == 0, out["results"]
    res = out["results"]["pgwire_staging_retry"]
    assert res.startswith("ok"), res
    # keyed staging (reference schema): retry re-insert was a no-op
    assert "keyed: stg=1200" in res
    # unkeyed staging: duplicates landed and the DISTINCT merge held
    assert "unkeyed: stg=" in res and "replay=0" in res


@pytest.mark.slow
def test_fault_drill_wap_publish_retry():
    """Write-audit-publish under its two fault windows (injected task
    death during the staged write; a publish replay of the
    rename-to-marker-delete crash window) plus the incremental
    OPTIMIZE losing a version race — all converge to the clean state
    with no duplicate or lost rows."""
    out = _run_drill("--only", "wap_publish_retry")
    assert out["failures"] == 0, out["results"]
    res = out["results"]["wap_publish_retry"]
    assert res.startswith("ok") and "faults fired" in res, res
