"""Distributed training-side analytics (operators/ml.py): gradient
descent actually learns, the bloom filter honors its no-false-negative
contract, the gram matrix matches numpy — and the PLANS carry the
scale properties the docstrings claim (map-side partial aggregation,
broadcast bitmap probe, no row shuffle in the GD loop)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_property_rumah123_spark.operators import ml


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_logistic_gd_learns_separable_labels(spark):
    """On linearly separable data (y = x1 > 0) the 3-iteration descent
    must move w1 positive and reduce the logistic-style loss; and the
    per-iteration aggregate plan must be a pure partial-agg reduce —
    HashAggregate over the scan, no Exchange of data rows beyond the
    final 1-row merge."""
    rng = np.random.default_rng(5)
    xs = rng.normal(size=2000)
    rows = [(float(x), 0.3 * float(x), 1.0 if x > 0 else 0.0) for x in xs]
    feat = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    hist = ml.logistic_gd_fit(feat, ["x1", "x2"], "y", iterations=3, lr=0.5)
    assert len(hist) == 9
    w1_by_iter = [h["weight"] for h in hist if h["feature"] == "w1"]
    assert w1_by_iter[0] > 0 and w1_by_iter[-1] > w1_by_iter[0]
    # gradient magnitude shrinks as the fit improves
    g1 = [abs(h["grad_micro"]) for h in hist if h["feature"] == "w1"]
    assert g1[-1] < g1[0]

    # plan shape of one iteration's aggregate: partial_count/sum
    # present (map-side combine), single-row final agg
    z = F.lit(0.0) + F.lit(0.0) * F.col("x1")
    p = F.lit(0.5) + F.lit(0.5) * z / (F.lit(1.0) + F.abs(z))
    agg = feat.agg(
        F.sum(F.floor((p - F.col("y")) * F.lit(1e6)).cast("long")).alias("g")
    )
    plan = _plan(agg)
    assert "partial_sum" in plan
    assert "Window" not in plan


def test_logistic_gd_bounded_driver_traffic(spark):
    """Driver sees d+2 numbers per iteration regardless of row count —
    the bounded-collect contract: history length is 3 x (d+1) and every
    grad is an exact integer (micro-quantized sums)."""
    feat = spark.range(0, 10000).select(
        (F.col("id") % 7).cast("double").alias("x1"),
        (F.col("id") % 2).cast("double").alias("y"),
    )
    hist = ml.logistic_gd_fit(feat, ["x1"], "y", iterations=2)
    assert len(hist) == 4
    assert all(isinstance(h["grad_micro"], int) for h in hist)


def test_gram_matrix_matches_numpy(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(scale=0.2, size=(300, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    out = {
        (r["i"], r["j"]): r["value"]
        for r in ml.gram_matrix_micro(df, "embedding", dims=4).collect()
    }
    assert out[(-1, -1)] == 300
    v64 = vecs.astype(np.float64)
    for i in range(1, 5):
        for j in range(i, 5):
            want = int(
                np.sum(np.floor(v64[:, i - 1] * v64[:, j - 1] * 1e6))
            )
            assert out[(i, j)] == want, (i, j)
    # single-aggregate plan: map-side partials, no shuffle of rows
    plan = _plan(ml.gram_matrix_micro(df, "embedding", dims=4))
    assert "partial_sum" in plan or "partial_count" in plan


def test_bloom_no_false_negatives_and_bounded_false_positives(spark):
    """Every admitted key must probe maybe_present=1 (the structural
    bloom guarantee); unseen keys mostly miss (1024 bits, k=3, 300
    keys -> false-positive rate well under 50%); the probe joins a
    BROADCAST bitmap (the runtime-filter shape)."""
    admitted = spark.range(0, 300).select(
        F.concat(F.lit("key-"), F.col("id")).alias("key")
    )
    bitmap = ml.bloom_build(admitted, "key")
    words = bitmap.collect()
    assert len(words) <= 32 and all(0 <= r["word_idx"] < 32 for r in words)

    # members: all present
    probe_in = spark.range(0, 300).select(
        F.col("id").alias("pid"),
        F.concat(F.lit("key-"), F.col("id")).alias("key"),
    )
    got = ml.bloom_probe(probe_in, bitmap, "key", "pid").collect()
    assert all(r["maybe_present"] == 1 for r in got) and len(got) == 300

    # non-members: mostly absent
    probe_out = spark.range(100000, 100500).select(
        F.col("id").alias("pid"),
        F.concat(F.lit("other-"), F.col("id")).alias("key"),
    )
    fp = (
        ml.bloom_probe(probe_out, bitmap, "key", "pid")
        .agg(F.sum("maybe_present"))
        .first()[0]
    )
    assert fp < 250  # theoretical fp ~ (1 - e^{-900/1024})^3 ~ 20%

    plan = _plan(ml.bloom_probe(probe_in, bitmap, "key", "pid"))
    assert "BroadcastHashJoin" in plan


def test_bloom_probe_rejects_missing_word_rows(spark):
    """A probe position whose word never got any bits must read as a
    miss through the left join (coalesce(bits, 0)), not a null/error."""
    admitted = spark.createDataFrame([("only-one",)], "key string")
    bitmap = ml.bloom_build(admitted, "key")
    assert bitmap.count() <= 3
    probe = spark.createDataFrame(
        [(1, "definitely-not-in-set-xyzzy")], "pid long, key string"
    )
    rows = ml.bloom_probe(probe, bitmap, "key", "pid").collect()
    assert len(rows) == 1 and rows[0]["maybe_present"] in (0, 1)


def test_pagerank_quantized_star_graph(spark):
    """On a 1-hub star (hub 0 <-> leaves 1..10, both directions) the
    quantized PageRank must (a) conserve the expected fixed-point
    structure — every leaf identical, hub far above leaves — and (b)
    match the hand-computed first iteration: hub gets teleport +
    0.85 * 10 * (1e6 div 1) = 150000 + 8500000; a leaf gets teleport
    + 0.85 * (1e6 div 10) = 150000 + 85000."""
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 11)] + [(i, 0) for i in range(1, 11)],
        "src long, dst long",
    )
    one = {
        r["node"]: r["rank_micro"]
        for r in ml.pagerank_micro(edges, iterations=1).collect()
    }
    assert one[0] == 150000 + 8500000
    assert all(one[i] == 150000 + 85000 for i in range(1, 11))
    three = {
        r["node"]: (r["rank_micro"], r["degree"])
        for r in ml.pagerank_micro(edges, iterations=3).collect()
    }
    leaf_ranks = {three[i][0] for i in range(1, 11)}
    assert len(leaf_ranks) == 1  # symmetry preserved exactly
    assert three[0][0] > 10 * three[1][0]  # hub dominates
    assert three[0][1] == 10 and three[1][1] == 1  # degrees ride along


def test_kmeans_lloyd_separates_planted_clusters(spark):
    """Two well-separated planted blobs (ids 0/1 land one in each, so
    init picks one centroid per blob; k=2) must be recovered exactly:
    every member assigned to its blob's cluster, counts exact, and
    inertia far below the cross-blob distance scale."""
    rng = np.random.default_rng(7)
    a = rng.normal(loc=0.0, scale=0.05, size=(80, 8))
    b = rng.normal(loc=1.0, scale=0.05, size=(80, 8))
    rows = []
    for i in range(80):  # interleave so ids 0,1 hit different blobs
        rows.append((2 * i, a[i].astype(np.float32).tolist()))
        rows.append((2 * i + 1, b[i].astype(np.float32).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        (r["cluster"], r["dim"]): r["value"]
        for r in ml.kmeans_lloyd_micro(
            df, "embedding", "vec_id", dims=8, k=2, iterations=2
        ).collect()
    }
    counts = {c: out[(c, -1)] for c in (1, 2)}
    assert counts == {1: 80, 2: 80}
    # component micro-sums recover the blob means (~0 vs ~1e6 * 80)
    for d in range(1, 9):
        assert abs(out[(1, d)]) < 80 * 200000
        assert abs(out[(2, d)] - 80 * 1000000) < 80 * 200000
    # tight blobs: per-cluster inertia ~ 80 * 8 * (0.05)^2 * 1e6 << 1e9
    assert out[(1, 0)] < 10**8 and out[(2, 0)] < 10**8


def test_ml_parts_stable_under_ansi(spark):
    """The micro-quantized sums must not overflow and the rational
    sigmoid has no undefined regions — execute the three registered
    parts under an ANSI session (the driver's default)."""
    from etl_property_rumah123_spark.plans import PARTS, load_all

    load_all()
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        for name in (
            "logreg_train_gd",
            "embedding_gram_matrix",
            "bloom_membership_prune",
            "pagerank_bipartite",
            "kmeans_lloyd",
        ):
            PARTS[name].fn(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_cached_embed_probe_then_extend(spark, tmp_path):
    """The content-addressed embedding cache: first run embeds every
    distinct digest, an identical second run embeds NOTHING (pure
    cache hits), an incremental third run embeds only the new
    content, and embeddings are identical across runs (the cache IS
    the determinism boundary). In-batch duplicate texts embed once."""
    from pyspark.sql import functions as F

    from etl_property_rumah123_spark.operators.ml import cached_embed

    cache = str(tmp_path / "emb_cache")

    def embed(miss_docs):
        # deterministic stand-in for a GPU embedder: 4 dims from the
        # digest hex — pure JVM expressions, no UDF
        return miss_docs.select(
            "digest",
            F.array(
                *[
                    F.conv(F.substring("digest", 2 * i + 1, 2), 16, 10)
                    .cast("double")
                    for i in range(4)
                ]
            ).alias("embedding"),
        )

    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")],  # 3 != distinct 2
        "doc_id long, text string",
    )
    out1, s1 = cached_embed(docs, cache, embed)
    assert s1 == {"n_docs": 3, "n_embedded": 2, "n_cache_hits": 0}
    e1 = {r["doc_id"]: tuple(r["embedding"]) for r in out1.collect()}
    assert e1[1] == e1[3] != e1[2]  # same content, same vector

    out2, s2 = cached_embed(docs, cache, embed)
    assert s2 == {"n_docs": 3, "n_embedded": 0, "n_cache_hits": 3}
    assert {r["doc_id"]: tuple(r["embedding"]) for r in out2.collect()} == e1

    docs3 = spark.createDataFrame(
        [(1, "alpha"), (4, "gamma")], "doc_id long, text string"
    )
    out3, s3 = cached_embed(docs3, cache, embed)
    assert s3 == {"n_docs": 2, "n_embedded": 1, "n_cache_hits": 1}
    e3 = {r["doc_id"]: tuple(r["embedding"]) for r in out3.collect()}
    assert e3[1] == e1[1]
