"""Physical-plan quality gates: these tests pin the properties that
make the plans scale — predicate pushdown into parquet, column
pruning, broadcast of bounded dims, no Python UDFs in expression-only
paths — so a refactor that silently loses one fails CI, not the
100 TB run.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_property_rumah123_spark.plans import PARTS, load_all
from tests.conftest import SF_SMOKE

# Plan-quality pins apply to part-level queries too (suite members keep
# their builders in PARTS after the registry consolidation). load_all()
# must run FIRST — importing the plan modules is what populates PARTS.
REGISTRY = dict(load_all())
REGISTRY.update(PARTS)


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_parquet(spark):
    df = REGISTRY["filter_project_pushdown"].fn(spark, SF_SMOKE)
    plan = plan_of(df)
    assert "PushedFilters: [" in plan
    # at least one real (non-IsNotNull) predicate pushed
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line
    ]
    assert any(
        any(tok in line for tok in ("GreaterThan", "LessThan", "EqualTo"))
        for line in pushed
    ), pushed


def test_column_pruning_on_documents(spark):
    """A metadata-only query over documents must not read the text
    payload column."""
    df = REGISTRY["corpus_split_deterministic"].fn(spark, SF_SMOKE)
    plan = plan_of(df)
    reads = [line for line in plan.splitlines() if "ReadSchema" in line]
    assert reads and all("text" not in line for line in reads), reads


def test_bounded_dims_are_broadcast_in_q5(spark):
    plan = plan_of(REGISTRY["q5_region_volume"].fn(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastExchange" in plan


def test_q5_single_fact_shuffle_join_order(spark):
    """ROUND 12 (VERDICT #3): the regression guard for the round-11
    sf100 find (182 s -> 33 s). q5 must keep its SMALL-SIDE-FIRST join
    order: lineitem enters its ONE hash shuffle straight from the scan
    (pure l_* columns — never a join intermediate), and no exchange
    keyed on custkey ever carries l_* columns (the bug shape joined
    lineitem first and reshuffled the fact-sized intermediate by
    o_custkey). Pinned with broadcasts DISABLED so the at-scale
    exchange structure is visible at smoke SF — at real scale the
    hinted dims broadcast and these are exactly the shuffles that
    remain."""
    import re

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(REGISTRY["q5_region_volume"].fn(spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # parse the formatted detail blocks: node header -> its lines
    blocks = re.split(r"^\((\d+)\) ", plan, flags=re.M)[1:]
    exchanges = []  # (partition_keys, input_cols) per hash Exchange
    for header, body in zip(blocks[0::2], blocks[1::2]):
        name, _, rest = body.partition("\n")
        if not name.strip().startswith("Exchange"):
            continue
        keys = re.search(r"hashpartitioning\(([^)]*)\)", rest)
        cols = re.search(r"Input \[\d+\]: \[([^\]]*)\]", rest)
        if keys and cols:
            exchanges.append((keys.group(1), cols.group(1)))
    assert exchanges, plan  # broadcasts disabled: shuffles must exist

    fact_scan_shuffles = [
        (k, cols)
        for k, cols in exchanges
        if all(c.strip().startswith("l_") for c in cols.split(","))
    ]
    # lineitem is shuffled exactly once, straight from its scan
    assert len(fact_scan_shuffles) == 1, exchanges
    assert "l_orderkey" in fact_scan_shuffles[0][0], exchanges
    # and no custkey-keyed exchange moves fact rows: the custkey
    # shuffle happens BEFORE the fact join, on orders/customer only
    for keys, cols in exchanges:
        if "custkey" in keys:
            assert "l_" not in cols, (keys, cols)
    # the explicit dim hints survive even with the threshold off
    assert "BroadcastExchange" in plan


def test_no_python_udf_in_expression_paths(spark):
    """Cleaning, parsing, hashing, windowing paths are pure Column
    expressions — a Python UDF sneaking in would show up as
    BatchEvalPython / ArrowEvalPython in the plan."""
    for name in (
        "clean_price_parse",
        "listing_parse_cards",
        "dedup_minhash_lsh",
        "asof_join_last_click",
        "text_tfidf_top_term",
        "knn_bruteforce",
    ):
        plan = plan_of(REGISTRY[name].fn(spark, SF_SMOKE))
        assert "EvalPython" not in plan, f"{name} has a Python UDF in its plan"


def test_arrow_not_rowwise_python_in_multimodal(spark):
    """The multimodal decode path MUST be Arrow-batched (mapInPandas),
    never row-at-a-time pickled Python."""
    plan = plan_of(REGISTRY["multimodal_decode"].fn(spark, SF_SMOKE))
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan  # the pickled row-wise path


def test_keep_first_dedup_single_shuffle(spark):
    """transform_data's only exchange is the dedup window's hash
    partitioning — the P1-P9 expression pipeline adds none."""
    from etl_property_rumah123_spark.operators.cleaning import transform_data
    from etl_property_rumah123_spark.schemas import RAW_LISTING_SCHEMA

    row = {f.name: None for f in RAW_LISTING_SCHEMA.fields}
    row.update(link="rumah123.com/p/1", additional_features=[], ingest_seq=1)
    df = spark.createDataFrame([row], RAW_LISTING_SCHEMA).repartition(4)
    plan = plan_of(transform_data(df))
    # one hash exchange for the dedup window; the round-robin one is the
    # test scaffold's repartition, not the operator's
    hash_exchanges = [
        line
        for line in plan.splitlines()
        if line.startswith("Arguments: hashpartitioning")
    ]
    assert len(hash_exchanges) == 1, plan


def test_profile_table_one_scan_per_table(spark):
    """The profiler must compute ALL column stats in one aggregation
    scan per table (2 tables -> 2 parquet scans), never a re-scan per
    profiled column."""
    import re

    plan = plan_of(REGISTRY["profile_table"].fn(spark, SF_SMOKE))
    # formatted plans list each node twice (tree + details); count the
    # numbered detail headers only
    scans = [l for l in plan.splitlines() if re.match(r"^\(\d+\) Scan parquet", l)]
    assert len(scans) == 2, plan


def test_pq_pipeline_is_arrow_batched(spark):
    """PQ encode + ADC scoring run as mapInPandas (Arrow batches),
    never row-at-a-time pickled Python."""
    from etl_property_rumah123_spark.operators import similarity
    from etl_property_rumah123_spark.sources.catalog import table

    e = table(spark, SF_SMOKE, "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    plan = plan_of(similarity.pq_topk(q, e, k=3, m=8, nbits=4))
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_no_unexpected_cartesian_or_bnlj_in_any_registered_plan(spark):
    """Global scale-killer gate over EVERY registered query plan:
    no CartesianProduct anywhere; BroadcastNestedLoopJoin only in the
    documented broadcast-small-side ground-truth paths; BatchEvalPython
    only in the Python-UDTF demo (inherent to UDTFs)."""
    BNLJ_BY_DESIGN = {
        "knn_bruteforce",        # broadcast 10-query side, != condition
        "dedup_embedding_cosine",  # block-pair join over tiny packed table
        "ann_suite",             # contains the same broadcast query side
        "text_term_stats",       # 1-row corpus-total broadcast (lm member)
        "sketch_suite",          # 1-row exact x 1-row unioned-estimate
    }
    # Python UDTF node type — the part and the suite that carries it
    PICKLED_BY_DESIGN = {"udtf_sentence_split", "analytics_patterns_suite"}
    for name, spec in load_all().items():
        plan = plan_of(spec.fn(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name
        if name not in BNLJ_BY_DESIGN:
            assert "BroadcastNestedLoopJoin" not in plan, name
        if name not in PICKLED_BY_DESIGN:
            assert "BatchEvalPython" not in plan, name


def test_new_corpus_parts_stay_jvm_side_and_join_hashed(spark):
    """The round-2 corpus additions (shuffle/shard order, semantic
    dedup, repeated spans) must stay pure Column expressions — no
    Python eval — and their self/candidate joins must be hash
    equi-joins, never cartesian/broadcast-nested-loop."""
    for name in (
        "corpus_shuffle_shards",
        "corpus_semantic_dedup",
        "corpus_repeated_spans",
    ):
        plan = plan_of(REGISTRY[name].fn(spark, SF_SMOKE))
        assert "EvalPython" not in plan, f"{name} has a Python UDF"
        assert "CartesianProduct" not in plan, f"{name} has a cross join"
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} degenerated to a nested-loop join"
        )


def test_new_tpch_shapes_plan_pins(spark):
    """The optimizer-shape guarantees of the round-2 TPC-H parts:
    Q13's join-condition predicate must keep the join LeftOuter (a
    refactor moving it to WHERE silently drops zero-order customers),
    Q16's NOT IN must decorrelate to LeftAnti, Q2's equality-to-
    correlated-MAX must decorrelate fully (joins, no per-row
    subquery)."""
    p13 = plan_of(PARTS["q13_order_distribution"].fn(spark, SF_SMOKE))
    assert "LeftOuter" in p13, "q13 outer join collapsed"
    p16 = plan_of(PARTS["q16_supplier_variety"].fn(spark, SF_SMOKE))
    assert "LeftAnti" in p16, "q16 NOT IN did not become an anti join"
    p2 = plan_of(PARTS["q2_max_bal_supplier"].fn(spark, SF_SMOKE))
    assert "Subquery" not in p2, "q2 scalar subquery not decorrelated"
    assert "Join" in p2


def test_round4_tpch_decorrelation_plan_pins(spark):
    """The round-4 decorrelation stress shapes: Q17's correlated
    scalar AVG must become a per-part aggregate joined back on the
    part key (no per-row subquery execution), Q20's nested IN chain
    must become stacked LeftSemi joins, Q22's NOT EXISTS must become
    LeftAnti with its scalar-AVG floor decorrelated, and Q7's
    cross-side pair disjunction must not degrade the nation joins to
    nested loops."""
    p17 = plan_of(PARTS["q17_small_quantity_revenue"].fn(spark, SF_SMOKE))
    assert "Subquery" not in p17, "q17 correlated AVG not decorrelated"
    assert "Join" in p17
    # the decorrelated form aggregates lineitem per part key
    assert "l_partkey" in p17 and "avg(" in p17.lower()

    p20 = plan_of(PARTS["q20_part_promotion_suppliers"].fn(spark, SF_SMOKE))
    assert "LeftSemi" in p20, "q20 IN chain did not become semi joins"
    assert "CartesianProduct" not in p20

    p22 = plan_of(PARTS["q22_global_sales_opportunity"].fn(spark, SF_SMOKE))
    assert "LeftAnti" in p22, "q22 NOT EXISTS did not become anti join"

    p7 = plan_of(PARTS["q7_nation_volume"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in p7
    assert "BroadcastNestedLoopJoin" not in p7
