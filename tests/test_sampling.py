"""Deterministic sampling + sequence packing (operators/sampling.py)
and the Gopher-style repetition features (operators/text_analysis.py).

The packing tests pin the property the distributed prefix sum must
have: the result is a pure function of (order_col, weight_col) and
never of the physical partitioning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_property_rumah123_spark.operators import sampling, text_analysis


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tok long")


def _naive_bins(rows, budget):
    out = {}
    running = 0
    for _id, tok in sorted(rows):
        b = running // budget
        n, t = out.get(b, (0, 0))
        out[b] = (n + 1, t + tok)
        running += tok
    return {b: v for b, v in out.items()}


@pytest.mark.parametrize("num_partitions", [1, 3, 8])
def test_pack_token_bins_matches_naive_any_partitioning(spark, num_partitions):
    rows = [(i, (i * 37) % 113) for i in range(200)]
    df = _docs(spark, rows).repartition(num_partitions)
    got = {
        r["bin"]: (r["n_docs"], r["n_tokens"])
        for r in sampling.pack_token_bins(df, budget=500).collect()
    }
    assert got == _naive_bins(rows, 500)


def test_global_running_sum_matches_cumsum(spark):
    rows = [(i, i % 7) for i in range(100)]
    df = _docs(spark, rows).repartition(5)
    got = {
        r["doc_id"]: r["running"]
        for r in sampling.global_running_sum(df, "doc_id", "n_tok").collect()
    }
    acc = 0
    for i, w in rows:
        acc += w
        assert got[i] == acc


def test_hash_gate_is_partition_invariant_and_near_rate(spark):
    df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    kept1 = {
        r["doc_id"]
        for r in sampling.hash_gate(
            df, F.lit(0.25), F.col("doc_id"), "|t"
        ).collect()
    }
    kept2 = {
        r["doc_id"]
        for r in sampling.hash_gate(
            df.repartition(13), F.lit(0.25), F.col("doc_id"), "|t"
        ).collect()
    }
    assert kept1 == kept2  # layout never changes the sample
    assert 0.22 < len(kept1) / 4000 < 0.28  # md5 uniformity at n=4000


def test_repetition_features_planted(spark):
    df = spark.createDataFrame(
        [
            # 4 lines, 'dup dup' twice; 'a b' bigram dominates
            (1, "a b a b a b\ndup dup\ndup dup\nc d"),
            (2, "all unique words here"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text_analysis.repetition_features(df).collect()}
    r1 = got[1]
    assert r1["n_lines"] == 4 and r1["dup_line_frac"] == 0.25
    # words: a b a b a b dup dup dup dup c d -> 12 tokens, 5 distinct
    assert r1["dup_word_frac"] == round(7 / 12, 6)
    # bigrams within the full token array: 'a b' occurs 3 times of 11
    assert r1["top_bigram_frac"] == round(3 / 11, 6)
    r2 = got[2]
    assert r2["dup_word_frac"] == 0.0 and r2["top_bigram_frac"] == round(1 / 3, 6)
    for empty_id in (3, 4):
        r = got[empty_id]
        assert r["n_lines"] == 0
        assert r["dup_line_frac"] is None
        assert r["dup_word_frac"] is None
        assert r["top_bigram_frac"] is None


def test_chunk_spans_matches_naive(spark):
    rows = [(1, 0), (2, 1), (3, 256), (4, 257), (5, 256 + 192), (6, 1000)]
    df = _docs(spark, rows)
    got = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_tokens"]
        for r in sampling.chunk_spans(df, size=256, stride=192).collect()
    }
    expect = {}
    for doc, n in rows:
        i = 0
        while n > 0 and i * 192 < n or (n > 0 and i == 0):
            start = i * 192
            expect[(doc, i)] = min(start + 256, n) - start
            if start + 256 >= n:
                break
            i += 1
    assert got == expect
    assert (1, 0) not in got  # zero-token doc yields no chunks
    assert got[(4, 1)] == 65  # 257 tokens: second window is the tail


def test_pii_counts_and_redaction_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.com or 192.168.0.1 ring +62 812-3456-7890"),
            (2, "no pii here"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    counts = text_analysis.pii_counts(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            counts["email"].alias("e"),
            counts["ip"].alias("i"),
            counts["phone"].alias("p"),
            text_analysis.redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert (out[1]["e"], out[1]["i"], out[1]["p"]) == (1, 1, 1)
    assert out[1]["red"] == "mail <EMAIL> or <IP> ring <PHONE>"
    assert (out[2]["e"], out[2]["i"], out[2]["p"]) == (0, 0, 0)
    assert out[3]["red"] == ""  # null text redacts to the empty doc


def test_lm_surprisal_ranks_rare_bigrams_higher(spark):
    """A doc made of the corpus's dominant bigram scores lower than a
    doc of one-off bigrams, and the integer-bucket formula is exact."""
    from etl_property_rumah123_spark.plans import PARTS, load_all

    load_all()
    common = " ".join(["alpha beta"] * 20)  # 'alpha beta' dominates
    rows = [(i, common) for i in range(5)]
    rows.append((100, "zeta eta theta iota kappa lam mu nu xi omicron"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    import duckdb

    con = duckdb.connect()
    con.register("documents_v", df.toPandas())
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_v")
    oracle = {
        r[0]: r[1]
        for r in con.execute(PARTS["text_lm_surprisal"].oracle).fetchall()
    }

    # same builder the registered suite uses, against the same tiny df
    # (llm_queries binds `table` at import, so patch it there)
    from etl_property_rumah123_spark.plans import llm_queries

    orig = llm_queries.table
    llm_queries.table = lambda s, d, n: df  # noqa: E731
    try:
        got = {
            r["doc_id"]: r["lm_surprisal"]
            for r in PARTS["text_lm_surprisal"].fn(spark, "unused").collect()
        }
    finally:
        llm_queries.table = orig
    assert got == oracle
    assert got[100] > got[0]  # rare bigrams -> higher surprisal


def test_boilerplate_strip_planted(spark):
    """Segments in >= 3 docs are removed, survivors keep order, a
    fully-boiler doc collapses to '', null text drops out — and the
    Spark result exactly matches the DuckDB oracle on the fixture."""
    from etl_property_rumah123_spark.plans import PARTS, load_all

    load_all()
    rows = [
        (1, "Buy now. unique alpha text. Visit our site."),
        (2, "Buy now. other beta words. Visit our site."),
        (3, "Buy now. third gamma thing. Visit our site."),
        (4, "totally unique document here"),
        (5, None),
        (6, "Buy now. Visit our site."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    import duckdb

    con = duckdb.connect()
    con.register("documents_v", df.toPandas())
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_v")
    oracle = {
        r[0]: r[1:]
        for r in con.execute(PARTS["text_boilerplate_strip"].oracle).fetchall()
    }

    from etl_property_rumah123_spark.plans import llm_queries

    orig = llm_queries.table
    llm_queries.table = lambda s, d, n: df  # noqa: E731
    try:
        got = {
            r["doc_id"]: (r["n_segments"], r["n_removed"], r["clean_text"])
            for r in PARTS["text_boilerplate_strip"].fn(spark, "unused").collect()
        }
    finally:
        llm_queries.table = orig
    assert got == oracle
    assert got[1] == (3, 2, "unique alpha text")  # order + removal
    assert got[6] == (2, 2, "")  # fully-boiler doc -> empty, not null
    assert 5 not in got  # null text has no segments


def test_quality_classifier_gate_separates_text_quality(spark):
    """The frozen linear scorer passes natural-looking text and fails
    empty/punctuation-soup docs; the milli-logit is floor-exact."""
    from etl_property_rumah123_spark.plans import load_all

    load_all()
    rows = [
        (1, "the cat sat on the mat and the dog is a friend of the cat"),
        (2, ""),
        (3, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( ))) @@@ ~~~ !!! ???"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # the suite imports catalog.table inside the function body, so
    # patch it at the catalog module
    import etl_property_rumah123_spark.sources.catalog as catalog

    orig = catalog.table
    catalog.table = lambda s, d, n: df  # noqa: E731
    try:
        out = {
            r["doc_id"]: r
            for r in load_all()["text_quality_suite"].fn(spark, "x").collect()
        }
    finally:
        catalog.table = orig
    assert out[1]["clf_pass"] == 1
    assert out[2]["clf_pass"] == 0  # empty: logit = -1.0 -> -1000
    assert out[2]["quality_logit_milli"] == -1000
    assert out[3]["clf_pass"] == 0  # punctuation soup: heavy penalty


def test_contamination_counts_repeated_shared_shingle_once(spark):
    """A corpus doc repeating a contaminated 8-gram three times still
    reports n_shared=1 — the post-join distinct must dedupe per
    (doc, shingle), and an uncontaminated doc must not appear."""
    from etl_property_rumah123_spark.operators.dedup import ngram_contamination

    leak = "a b c d e f g h"
    corpus = spark.createDataFrame(
        [
            (1, f"{leak} x {leak} y {leak}"),  # 3 occurrences, 1 distinct
            (2, "p q r s t u v w entirely clean text here"),
            (3, f"start {leak} end plus q r s t u v w x"),  # 2 shared grams
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, f"{leak} and also q r s t u v w x")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_shared"]
        for r in ngram_contamination(corpus, eval_df, shingle_n=8).collect()
    }
    # doc 1: grams of "a..h x a..h y a..h" that hit the eval set: the
    # exact window "a b c d e f g h" occurs 3 times -> counted once;
    # no other 8-gram of doc 1 appears in the eval text.
    assert got[1] == 1
    assert 2 not in got
    assert got[3] >= 2  # "a..h" plus "q r s t u v w x"


def test_pack_plan_has_no_global_single_partition_window(spark):
    """The data-sized window must be partitioned by __pid; only the
    offsets window (one row per partition, post-aggregation) may run
    single-partition; offsets come back via broadcast join."""
    df = _docs(spark, [(i, 1) for i in range(50)])
    plan = (
        sampling.global_running_sum(df, "doc_id", "n_tok")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    data_windows = [
        ln for ln in plan.splitlines() if "Window" in ln and "__local" in ln
    ]
    assert data_windows and all("], [__pid#" in ln for ln in data_windows)
    assert "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# Deterministic shard order (shard_order)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("num_partitions", [1, 7])
def test_shard_order_is_partitioning_invariant(spark, num_partitions):
    df = spark.createDataFrame(
        [(i,) for i in range(300)], "doc_id long"
    ).repartition(num_partitions)
    out = sampling.shard_order(df, n_shards=8).collect()
    assert len(out) == 300
    by_doc = {r["doc_id"]: (r["__h"], r["shard"]) for r in out}
    # pure function of doc_id: independent of physical layout
    single = {
        r["doc_id"]: (r["__h"], r["shard"])
        for r in sampling.shard_order(
            spark.createDataFrame([(i,) for i in range(300)], "doc_id long"),
            n_shards=8,
        ).collect()
    }
    assert by_doc == single
    assert all(0 <= s < 8 and h >= 0 for h, s in by_doc.values())
    # every shard populated at n=300 (sanity on the mod distribution)
    assert len({s for _, s in by_doc.values()}) == 8


def test_shard_order_salt_reshuffles(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    a = {r["doc_id"]: r["__h"] for r in sampling.shard_order(df).collect()}
    b = {
        r["doc_id"]: r["__h"]
        for r in sampling.shard_order(df, salt="|epoch2").collect()
    }
    assert a != b  # different salt, different epoch order


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup accounting (dedup.semantic_dedup)
# ---------------------------------------------------------------------------


def _unit(vec):
    n = sum(x * x for x in vec) ** 0.5
    return [x / n for x in vec]


def _vecs_df(spark, rows, dim):
    return spark.createDataFrame(
        rows, f"vec_id long, embedding array<float>"
    )


def test_semantic_dedup_drops_planted_near_dups(spark):
    from etl_property_rumah123_spark.operators import dedup

    dim = 8
    base = _unit([1.0] * dim)
    near = _unit([1.0] * (dim - 1) + [1.2])          # cosine ~0.999 with base
    far = _unit([1.0, -1.0] * (dim // 2))            # cosine 0 with base
    df = _vecs_df(spark, [(1, base), (2, near), (3, far)], dim)
    out = dedup.semantic_dedup(df, dim=dim, num_planes=2, threshold=0.9)
    rows = {r["bucket"]: r for r in out.collect()}
    assert sum(r["n_vecs"] for r in rows.values()) == 3
    # exactly one vector dropped: the higher-id near-dup of vec 1
    assert sum(r["n_dropped"] for r in rows.values()) == 1


def test_semantic_dedup_hot_bucket_guard(spark):
    from etl_property_rumah123_spark.operators import dedup

    dim = 8
    v = _unit([1.0] * dim)
    # 10 identical vectors: one all-in-one bucket
    df = _vecs_df(spark, [(i, v) for i in range(10)], dim)
    guarded = dedup.semantic_dedup(
        df, dim=dim, num_planes=2, threshold=0.9, max_bucket_size=5
    ).collect()
    # oversize bucket excluded from the pair join but still counted
    assert sum(r["n_vecs"] for r in guarded) == 10
    assert sum(r["n_dropped"] for r in guarded) == 0
    unguarded = dedup.semantic_dedup(
        df, dim=dim, num_planes=2, threshold=0.9
    ).collect()
    assert sum(r["n_dropped"] for r in unguarded) == 9


# ---------------------------------------------------------------------------
# Span-level exact-substring dedup (dedup.repeated_spans)
# ---------------------------------------------------------------------------


def test_repeated_spans_flags_planted_passage(spark):
    from etl_property_rumah123_spark.operators import dedup

    passage = " ".join(f"tok{i}" for i in range(16))  # one exact 16-gram
    rows = [
        (1, passage + " tail one two three"),        # 16-gram at pos 0
        (2, "lead in words " + passage),             # same 16-gram later
        (3, "a completely different document " + " ".join(f"x{i}" for i in range(20))),
        (4, "short doc"),                            # < 16 tokens: 0 windows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup.repeated_spans(df).collect()}
    assert set(got) == {1, 2, 3, 4}
    # doc 1: 20 tokens -> 5 windows; only the exact planted one repeats
    assert got[1]["n_windows"] == 5 and got[1]["n_repeated"] == 1
    # doc 2: 19 tokens -> 4 windows; only the final window matches
    assert got[2]["n_windows"] == 4 and got[2]["n_repeated"] == 1
    assert got[3]["n_repeated"] == 0
    assert got[4]["n_windows"] == 0 and got[4]["n_repeated"] == 0


def test_repeated_spans_within_doc_repeat_not_counted(spark):
    from etl_property_rumah123_spark.operators import dedup

    span = " ".join(f"w{i}" for i in range(16))
    # the same 16-gram twice in ONE doc, nowhere else in the corpus
    rows = [(1, span + " gap " + span), (2, "unrelated " + " ".join(f"y{i}" for i in range(20)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup.repeated_spans(df).collect()}
    assert got[1]["n_repeated"] == 0  # cross-doc criterion only


def test_cap_per_group_deterministic_under_repartition(spark):
    """The kept set must be a pure function of (key, salt) — identical
    under any physical partitioning, and exactly k per full group."""
    from etl_property_rumah123_spark.operators import sampling

    rows = [(i, f"src{i % 4}") for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    def kept(d):
        out = sampling.cap_per_group(d, "source", "doc_id", k=5)
        return {
            (r["source"], r["doc_id"])
            for r in out.filter(out["__keep"] == 1).collect()
        }

    a = kept(df)
    b = kept(df.repartition(13))
    c = kept(df.repartition(1).sortWithinPartitions("doc_id"))
    assert a == b == c
    per_group = {}
    for s, _ in a:
        per_group[s] = per_group.get(s, 0) + 1
    assert per_group == {f"src{i}": 5 for i in range(4)}


# ---------------------------------------------------------------------------
# Span striking (dedup.strike_repeated_spans) and BM25 retrieval
# ---------------------------------------------------------------------------


def test_strike_repeated_spans_covers_planted_passage(spark):
    from etl_property_rumah123_spark.operators import dedup

    passage = " ".join(f"tok{i}" for i in range(8))  # one exact 8-gram
    rows = [
        (1, passage + " tail one two three"),  # 8-gram covers pos 0-7
        (2, "lead in " + passage),             # same 8-gram at pos 2-9
        (3, "a different doc " + " ".join(f"x{i}" for i in range(10))),
        (4, "short doc"),                      # < 8 tokens: 0 windows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in dedup.strike_repeated_spans(df, span_n=8).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    # doc 1: 12 tokens, exactly the 8 passage tokens covered
    assert got[1]["n_tokens"] == 12 and got[1]["n_covered"] == 8
    assert got[1]["n_retained"] == 4
    # doc 2: 10 tokens, the trailing 8 covered
    assert got[2]["n_covered"] == 8 and got[2]["n_retained"] == 2
    assert got[3]["n_covered"] == 0
    assert got[4]["n_tokens"] == 2 and got[4]["n_covered"] == 0


def test_strike_repeated_spans_overlaps_merge(spark):
    """Two overlapping repeated windows cover the union of their
    positions, not the sum — coverage is a distinct-position count."""
    from etl_property_rumah123_spark.operators import dedup

    nine = " ".join(f"t{i}" for i in range(9))  # two overlapping 8-grams
    rows = [
        (1, nine + " aa bb"),
        (2, nine + " cc dd"),  # both 8-grams repeat cross-doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in dedup.strike_repeated_spans(df, span_n=8).collect()
    }
    # 9 distinct covered positions per doc (union, not 16)
    assert got[1]["n_covered"] == 9 and got[2]["n_covered"] == 9


def test_bm25_ranks_relevant_doc_first(spark):
    rows = [
        (1, "hash hash hash join filler filler filler"),
        (2, "hash filler filler filler filler filler filler"),
        (3, "filler words only nothing relevant here at all"),
        (4, "join join vector stream hash extra extra"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = text_analysis.bm25_topk(
        df, ("hash", "join", "vector", "stream"), k=3
    ).collect()
    # doc 3 matches nothing -> absent; doc 4 hits all 4 terms
    ids = [r["doc_id"] for r in got]
    assert 3 not in ids and len(ids) == 3
    by_id = {r["doc_id"]: r for r in got}
    assert by_id[4]["n_terms_hit"] == 4
    assert got[0]["doc_id"] == 4  # idf-weighted: 4 rarer terms beat tf
    # scores strictly ordered, ties impossible here
    scores = [r["score_micro"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_bm25_requires_query_terms(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="query term"):
        text_analysis.bm25_topk(df, ())
