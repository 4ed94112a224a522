"""Round-14 optimization pins: every optimization must be
VALUE-IDENTICAL to the shape it replaced.

- _pq_encode_codes arrow kernel: codes equal the round-13 literal
  shape AND the legacy crossJoin+window shape row for row (dim-ordered
  accumulation == the SQL left fold; first-occurrence argmin ==
  (d2 asc, c asc)).
- _double_array_literal: one-expr array equals the per-element F.lit
  form bit for bit; non-finite falls back.
- plain-dir rebalance overlays carry cells_schema (ADVICE r13): after
  a rebalance the resolved meta's recorded schema matches a fresh
  inference of the new generation dir.
- catalog._path_sig is directory-aware: rewriting a part file inside
  a parquet DIRECTORY table changes the signature even when the dir
  inode stats do not.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from etl_property_rumah123_spark.operators import similarity
from etl_property_rumah123_spark.sources import catalog


def _pq_fixture(spark, sf_dir):
    from etl_property_rumah123_spark.operators.similarity import (
        _hash_sample_rows,
    )
    from etl_property_rumah123_spark.sources.catalog import table

    corpus = table(spark, sf_dir, "embeddings")
    m, nbits = 8, 4
    ksub = 2 ** nbits
    samples = _hash_sample_rows(corpus, ksub, "pq|", "embedding", "vec_id")
    dim = len(samples[0][2])
    dsub = dim // m
    cb_rows = [
        (j, c, v[j * dsub : (j + 1) * dsub])
        for j in range(m)
        for c, _sid, v in samples
    ]
    cb = F.broadcast(
        spark.createDataFrame(cb_rows, "j int, c int, w array<double>")
    )
    c_side = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )

    def sub_fold(vec_col_name, mul):
        sub = F.slice(F.col(vec_col_name), F.col("j") * dsub + 1, dsub)
        if mul:
            prods = F.zip_with(
                sub, F.col("w"), lambda a, b: a.cast("double") * b
            )
        else:
            prods = F.zip_with(
                sub,
                F.col("w"),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            )
        return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)

    return c_side, cb, cb_rows, m, dsub, sub_fold


def _encode_with_shape(shape, spark, sf_dir):
    c_side, cb, cb_rows, m, dsub, sub_fold = _pq_fixture(spark, sf_dir)
    prev = os.environ.get("SPARK_GRAFT_PQ_ENCODE_SHAPE")
    os.environ["SPARK_GRAFT_PQ_ENCODE_SHAPE"] = shape
    try:
        return similarity._pq_encode_codes(
            c_side, cb, cb_rows, m, dsub, sub_fold
        )
    finally:
        if prev is None:
            del os.environ["SPARK_GRAFT_PQ_ENCODE_SHAPE"]
        else:
            os.environ["SPARK_GRAFT_PQ_ENCODE_SHAPE"] = prev


def test_pq_arrow_encode_matches_literal_and_legacy(spark, sf_dir):
    arrow = _encode_with_shape("arrow", spark, sf_dir)
    literal = _encode_with_shape("literal", spark, sf_dir)
    legacy = _encode_with_shape("crossjoin", spark, sf_dir)
    d1 = arrow.exceptAll(literal).union(literal.exceptAll(arrow))
    assert d1.count() == 0
    d2 = arrow.exceptAll(legacy).union(legacy.exceptAll(arrow))
    assert d2.count() == 0


def test_pq_arrow_encode_is_the_default_plan(spark, sf_dir):
    """auto must select the Arrow kernel (MapInPandas in the plan, no
    crossjoin, no Window exchange) for finite codebooks."""
    codes = _encode_with_shape("auto", spark, sf_dir)
    plan = codes._sc._jvm.PythonSQLUtils.explainString(
        codes._jdf.queryExecution(), "formatted"
    )
    assert "MapInPandas" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_double_array_literal_equals_per_element_form(spark):
    vals = [0.1 * j + 1e-7 for j in range(8)]
    vals[3] = 1.0000000000000002  # repr round-trip knife edge
    got = spark.range(1).select(
        similarity._double_array_literal(vals).alias("a"),
        F.array(*[F.lit(float(x)) for x in vals]).alias("b"),
    ).first()
    assert got["a"] == got["b"]
    assert list(got["a"]) == vals  # exact doubles

    nf = similarity._double_array_literal([1.0, math.inf])
    got_nf = spark.range(1).select(nf.alias("a")).first()["a"]
    assert got_nf[1] == math.inf


def test_rebalance_overlay_carries_cells_schema(spark, sf_dir, tmp_path):
    """ADVICE r13 (medium): after a plain-dir rebalance the resolved
    sidecar's cells_schema must describe the NEW generation dir —
    byte-equal to a fresh inference of it."""
    from etl_property_rumah123_spark.sources.catalog import table

    idx = str(tmp_path / "ann_idx")
    corpus = table(spark, sf_dir, "embeddings")
    similarity.write_ann_index(corpus, idx, n_lists=4)
    similarity.append_ann_index(corpus.limit(20), idx)
    similarity.rebalance_ann_index(spark, idx)
    meta = similarity.read_ann_meta(spark, idx)
    rel = similarity._cells_rel(meta)
    assert rel != "cells"  # the rebalance moved the live cells
    assert meta.get("cells_schema") == (
        spark.read.parquet(f"{idx}/{rel}").schema.json()
    )
    # and a pre-r14 overlay (no cells_schema field) must NOT leave the
    # stale base schema in force. Rewrite through the Hadoop-FS writer
    # (a plain open() rewrite leaves a stale .crc sidecar and the
    # resolver rightly skips the overlay as corrupt).
    gen = int(meta["rebalance_gen"])
    pre_r14 = {
        k: meta[k]
        for k in (
            "centroids_rel", "cells_rel", "rebalance_gen", "drift_baseline",
        )
    }
    similarity._write_ann_gen_overlay(spark, idx, gen, pre_r14)
    meta2 = similarity.read_ann_meta(spark, idx)
    assert meta2["cells_rel"] == rel  # the overlay still resolves
    assert "cells_schema" not in meta2


def _probe_env(val):
    import contextlib

    @contextlib.contextmanager
    def cm():
        prev = os.environ.get("SPARK_GRAFT_ANN_PROBE_DIRS")
        os.environ["SPARK_GRAFT_ANN_PROBE_DIRS"] = val
        try:
            yield
        finally:
            if prev is None:
                del os.environ["SPARK_GRAFT_ANN_PROBE_DIRS"]
            else:
                os.environ["SPARK_GRAFT_ANN_PROBE_DIRS"] = prev

    return cm()


def test_probed_dirs_read_matches_full_listing(spark, sf_dir, tmp_path):
    """Round-14 probe optimization: reading only the probed cell=
    directories (basePath + recorded schema) must return exactly the
    full-listing + isin read's answers — on the RP index, the IVF
    index, and a post-rebalance IVF generation dir."""
    from etl_property_rumah123_spark.sources.catalog import table

    corpus = table(spark, sf_dir, "embeddings")
    q = corpus.filter(F.col("vec_id") < 8)

    rp = str(tmp_path / "rp_idx")
    dim = len(corpus.select("embedding").first()[0])
    similarity.write_rp_index(corpus, rp, dim=dim, num_planes=6)
    ivf = str(tmp_path / "ivf_idx")
    similarity.write_ann_index(corpus, ivf, n_lists=8)
    similarity.rebalance_ann_index(spark, ivf)  # probe hits cells_g1

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    with _probe_env("1"):
        rp_new = rows(similarity.probe_rp_index(q, rp, k=3))
        ivf_new = rows(similarity.probe_ann_index(q, ivf, k=3, n_probe=2))
    with _probe_env("0"):
        rp_old = rows(similarity.probe_rp_index(q, rp, k=3))
        ivf_old = rows(similarity.probe_ann_index(q, ivf, k=3, n_probe=2))
    assert rp_new == rp_old and len(rp_new) > 0
    assert ivf_new == ivf_old and len(ivf_new) > 0

    # empty probed-dir intersection (query maps to buckets that were
    # never populated) returns an empty, correctly-typed frame
    meta = similarity.read_ann_meta(spark, rp)
    empty = similarity._probed_cells_df(
        spark, meta, f"{rp}/cells", [10**9]
    )
    assert empty.count() == 0
    assert "cell" in empty.columns


def test_path_sig_detects_in_place_dir_rewrite(spark, tmp_path):
    """ADVICE r13 (low): rewriting a part file inside a parquet
    directory must change the memo signature."""
    d = str(tmp_path / "t.parquet")
    spark.range(10).coalesce(1).write.parquet(d)
    sig1 = catalog._path_sig(d)
    part = next(
        p for p in os.listdir(d) if p.endswith(".parquet")
    )
    full = os.path.join(d, part)
    with open(full, "ab") as fh:
        fh.write(b"x")
    # stamp "now" — the part file's original mtime predates _SUCCESS
    # (the committer writes it last), so a tiny relative bump could
    # still lose the newest-child comparison
    os.utime(full)
    sig2 = catalog._path_sig(d)
    assert sig1 != sig2


def test_schema_memo_is_bounded():
    assert catalog._SCHEMA_MEMO_MAX >= 16
    catalog._SCHEMA_MEMO.clear()
    for i in range(catalog._SCHEMA_MEMO_MAX + 8):
        catalog._memo_put(("p", i), object())
    assert len(catalog._SCHEMA_MEMO) == catalog._SCHEMA_MEMO_MAX
    catalog._SCHEMA_MEMO.clear()
