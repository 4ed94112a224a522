"""Dataset profiling: per-column statistics in ONE scan per table.

The data-quality gate every training-data pipeline runs before/after
ingest: row counts, null counts, distinct cardinalities, ranges. The
implementation computes ALL columns' aggregates in a single groupless
aggregation (one scan, map-side partial combine) and then reshapes the
one-row result to long format with ``stack`` — no per-column re-scan,
which is the difference between one pass and #columns passes at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, table_name: str, columns: dict[str, str]
) -> DataFrame:
    """Profile ``columns`` (name -> 'numeric' | 'string') of ``df``.

    Output (one row per column):
      col, n_rows, n_null, n_distinct (nulls excluded),
      min_s/max_s (string columns), min_v/max_v (numeric, rounded 6).
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in columns.items():
        aggs.append(F.count(c).alias(f"__c_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__d_{c}"))
        if kind == "string":
            aggs.append(F.min(c).alias(f"__mn_{c}"))
            aggs.append(F.max(c).alias(f"__mx_{c}"))
        else:
            aggs.append(F.round(F.min(F.col(c).cast("double")), 6).alias(f"__mn_{c}"))
            aggs.append(F.round(F.max(F.col(c).cast("double")), 6).alias(f"__mx_{c}"))
    one = df.agg(*aggs)

    groups = []
    for c, kind in columns.items():
        vals = [
            f"'{table_name}.{c}'",
            "CAST(n_rows AS BIGINT)",
            f"CAST(n_rows - __c_{c} AS BIGINT)",
            f"CAST(__d_{c} AS BIGINT)",
        ]
        if kind == "string":
            vals += [f"__mn_{c}", f"__mx_{c}",
                     "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"]
        else:
            vals += ["CAST(NULL AS STRING)", "CAST(NULL AS STRING)",
                     f"__mn_{c}", f"__mx_{c}"]
        groups.append(", ".join(vals))
    stack = (
        f"stack({len(columns)}, {', '.join(groups)}) AS "
        "(col, n_rows, n_null, n_distinct, min_s, max_s, min_v, max_v)"
    )
    return one.select(F.expr(stack))


def check_expectations(df: DataFrame, rules: dict[str, "F.Column"]) -> DataFrame:
    """Declarative data-quality gate: ``rules`` maps a rule name to a
    boolean Column every row SHOULD satisfy (not-null, range, enum,
    regex, cross-column). ALL rules evaluate in ONE groupless
    aggregation pass (map-side combine, no per-rule re-scan — at
    100 TB that is the difference between one job and #rules jobs),
    reshaped long via ``stack``.

    Output, one row per rule: rule, n_rows, n_violations, pass_rate
    (rounded 6). Rows where the predicate is NULL count as violations
    (unknown is not a pass — same stance as SQL CHECK constraints
    would take with NOT ENFORCED semantics reversed). An empty input
    yields pass_rate 1.0 (vacuously satisfied), not NULL.

    Rule names are interpolated into generated SQL (`stack`) and
    column aliases, so they must be plain identifiers — validated
    here rather than escaped, because a rule name is an API-level
    label, not data.
    """
    import re as _re

    if not rules:
        raise ValueError("rules must not be empty")
    for name in rules:
        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise ValueError(
                f"rule name {name!r} is not a valid identifier "
                "([A-Za-z_][A-Za-z0-9_]*); quotes/spaces/punctuation "
                "would break the generated stack() SQL"
            )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in rules.items():
        aggs.append(
            F.count_if(~F.coalesce(pred, F.lit(False))).alias(f"__v_{name}")
        )
    one = df.agg(*aggs)
    # CAST ... AS DOUBLE: bare 1.0 literals are DECIMAL in Spark SQL,
    # and the oracle comparison (and callers) expect double.
    groups = [
        f"'{name}', CAST(__n AS BIGINT), CAST(__v_{name} AS BIGINT), "
        f"CASE WHEN __n = 0 THEN CAST(1.0 AS DOUBLE) ELSE "
        f"ROUND(CAST(1.0 AS DOUBLE) - __v_{name} * CAST(1.0 AS DOUBLE) / __n, 6) END"
        for name in rules
    ]
    stack = (
        f"stack({len(rules)}, {', '.join(groups)}) AS "
        "(rule, n_rows, n_violations, pass_rate)"
    )
    return one.select(F.expr(stack))


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key-uniqueness check — the engine counterpart of the reference
    schema's PRIMARY KEY (init.sql:2), which was its last-line dedup
    guarantee. Returns the violating keys with their multiplicities
    (empty = unique). One shuffle on the key columns; ``limit(1)``
    the result to use it as a cheap boolean gate.
    """
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def plan_report(df: DataFrame) -> dict:
    """Programmatic plan-quality audit — the checks this repo's CI
    runs over every registered query (tests/test_plan_quality.py),
    exposed so users can gate THEIR queries the same way before
    shipping them to a cluster:

      scans            number of parquet scans
      pushed_filters   every non-empty PushedFilters list, verbatim
      exchanges        shuffle exchange count (each is a full
                       network/disk cycle of its input)
      broadcasts       broadcast exchange count
      adaptive         AQE wraps the plan (runtime re-planning active)
      cartesian / bnlj    scale-killer join nodes present
      python_evals     row-at-a-time Python UDF nodes (BatchEvalPython
                       — Arrow mapInPandas/applyInPandas do NOT count)

    Reads the FORMATTED physical plan (post-optimization, pre-AQE
    re-planning; AQE may further coalesce at runtime, so counts are
    upper bounds. WholeStageCodegen spans are not reported — under
    AQE they only exist per-stage at execution time; the
    python_evals=0 check is the anti-interpretation gate instead).
    """
    qe = df._jdf.queryExecution()
    plan = df._sc._jvm.PythonSQLUtils.explainString(qe, "formatted")
    import re

    pushed = [
        m.group(1)
        for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan)
        if m.group(1).strip()
    ]
    return {
        "scans": len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)),
        "pushed_filters": pushed,
        "exchanges": len(re.findall(r"^\(\d+\) Exchange", plan, re.M)),
        "broadcasts": len(re.findall(r"^\(\d+\) BroadcastExchange", plan, re.M)),
        "adaptive": "AdaptiveSparkPlan" in plan,
        "cartesian": "CartesianProduct" in plan,
        "bnlj": "BroadcastNestedLoopJoin" in plan,
        "python_evals": len(re.findall(r"BatchEvalPython", plan)),
    }
