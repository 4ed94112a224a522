"""Shared-plan materialization for diamond-shaped pipelines.

Several operators build a subtree that TWO downstream branches read (an
LSH bucket table self-joined, a signature table joined across
rotations, an exploded bigram table feeding both a frequency aggregate
and a scoring join). Spark does not deduplicate common subtrees across
branches, so without materialization the upstream pipeline executes
once per branch.

Two strategies, selected by ``SPARK_GRAFT_MATERIALIZE``:

- ``localcheckpoint`` (default): fastest — blocks live in executor
  storage and the plan above them is truncated. Executors holding the
  blocks are pinned (dynamic allocation will not reclaim an executor
  with cached blocks), but the blocks are NOT recoverable if an
  executor is LOST (preemption, spot reclaim, hardware) — the job
  fails and retries from the start.
- ``persist``: ``MEMORY_AND_DISK`` caching that keeps lineage, so a
  lost partition recomputes instead of failing the job. Slightly
  slower and keeps the upstream plan alive. Use this on
  preemptible/spot clusters (set it alongside configs/cluster.yaml).

``connected_components`` intentionally does NOT route through this
helper: its per-round checkpoint exists to CUT LINEAGE GROWTH of an
iterative plan, which persist() does not do.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def materialize(df: DataFrame, eager: bool = False) -> DataFrame:
    mode = os.environ.get("SPARK_GRAFT_MATERIALIZE", "localcheckpoint").lower()
    if mode == "persist":
        from pyspark import StorageLevel

        return df.persist(StorageLevel.MEMORY_AND_DISK)
    if mode != "localcheckpoint":
        raise ValueError(
            f"SPARK_GRAFT_MATERIALIZE={mode!r}: expected "
            "'localcheckpoint' or 'persist'"
        )
    return df.localCheckpoint(eager=eager)


def scratch_base() -> str:
    """Base directory for EPHEMERAL part-local tables (the snapshot
    lifecycle and matview parts rebuild a throwaway table_log table
    per run). Prefers a tmpfs (/dev/shm) when one exists — the data
    is by definition disposable, and the parts' cost is commit I/O,
    not compute, so skipping the disk round-trip is a pure win on
    the local bench — with /tmp as the portable fallback.
    ``SPARK_GRAFT_SCRATCH`` overrides both (point it at real disk if
    the box's shm is tight)."""
    env = os.environ.get("SPARK_GRAFT_SCRATCH")
    if env:
        return env
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        return "/dev/shm/spark_graft_scratch"
    return "/tmp/spark_graft_scratch"
