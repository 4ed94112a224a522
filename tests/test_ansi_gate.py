"""ANSI-default execution gate over the FULL query registry.

The driver harness runs ``queries()`` on its OWN bare SparkSession,
where Spark 4's ANSI mode is default-ON — while this repo's session
factory pins ``spark.sql.ansi.enabled=false`` for reference-quirk
parity (coerce-to-null casts) and the test session inherits that. In
round 5 that config split let an ANSI-only failure ship: 286 local
tests were green while the driver gate threw ``ARITHMETIC_OVERFLOW``
(a ``sum(xxhash64)`` convergence fingerprint in
``connected_components_star``; fixed to ``bit_xor``).

This module closes the gap: it flips the session to ANSI and EXECUTES
every registered query at sf0.001, materializing every expression via
the noop sink. Execution-only is sufficient — the class of bug this
catches is "expression throws under ANSI", not a value mismatch (the
oracle-parity tests own values). ``spark.sql.ansi.enabled`` is a
runtime conf, so flipping it on the shared session is safe as long as
it is ALWAYS restored, including on failure.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402

SF = "/root/testdata/sf0.001"

_QUERIES = entry_mod.queries()


@pytest.fixture()
def ansi_spark(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_executes_under_ansi(ansi_spark, name):
    df = _QUERIES[name](ansi_spark, SF)
    # noop sink: full row materialization (every expression evaluated,
    # like the driver's collect) without driver-side row transfer
    df.write.format("noop").mode("overwrite").save()
