"""ANN quality tests on CLUSTERED synthetic vectors (the testdata
embeddings are uniform random, where no sublinear ANN can beat chance
— cluster structure is what LSH/IVF exploit in real corpora), plus
the bucketed co-located join plan check.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from etl_property_rumah123_spark.operators import similarity

import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
from etl_property_rumah123_spark.sinks.writers import save_bucketed_table

DIM = 16
N_CLUSTERS = 8
PER_CLUSTER = 40


@pytest.fixture(scope="module")
def clustered(spark):
    rng = random.Random(42)
    centers = [
        [rng.gauss(0, 1) for _ in range(DIM)] for _ in range(N_CLUSTERS)
    ]
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for _ in range(PER_CLUSTER):
            v = [x + rng.gauss(0, 0.12) for x in c]
            norm = math.sqrt(sum(x * x for x in v))
            rows.append((vid, [x / norm for x in v], ci))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, true_cluster int"
    )


def recall(ann_df, truth_df):
    truth = {(r["query_id"], r["neighbor_id"]) for r in truth_df.collect()}
    got = {(r["query_id"], r["neighbor_id"]) for r in ann_df.collect()}
    return len(got & truth) / len(truth)


def test_lsh_multiprobe_recall(spark, clustered):
    q = clustered.filter(F.col("vec_id") % 40 == 0)  # one query per cluster
    truth = similarity.brute_force_topk(q, clustered, k=5)
    single = similarity.ann_topk(q, clustered, dim=DIM, k=5, num_planes=6)
    multi = similarity.ann_topk(
        q, clustered, dim=DIM, k=5, num_planes=6, hamming_probes=1
    )
    r1, rm = recall(single, truth), recall(multi, truth)
    assert rm >= r1  # multi-probe can only add candidates
    assert rm >= 0.8  # clustered data: near-neighbors share sign bits


def test_ivf_recall_beats_chance(spark, clustered):
    q = clustered.filter(F.col("vec_id") % 40 == 0)
    truth = similarity.brute_force_topk(q, clustered, k=5)
    ivf = similarity.ivf_topk(q, clustered, k=5, n_lists=8, n_probe=2)
    # probing 2/8 cells scans ~25% of the corpus; clustered structure
    # should put nearly all true neighbors in the query's own cell
    assert recall(ivf, truth) >= 0.8


def test_pq_adc_recall_with_refine(spark, clustered):
    """PQ-ADC + exact re-rank: recall >= 0.8 on clustered vectors
    (dim 16, 4 subspaces x 16 centroids); the ADC approximation alone
    ranks candidates, the refine step restores exact ordering."""
    q = clustered.filter(F.col("vec_id") % 40 == 0)
    truth = similarity.brute_force_topk(q, clustered, k=5)
    pq = similarity.pq_topk(q, clustered, k=5, m=4, nbits=4, refine_factor=8)
    assert recall(pq, truth) >= 0.8


def test_seeded_ivf_and_pq_recall(spark, clustered):
    """The zero-fitted-state (hash-seeded) IVF and PQ variants that the
    ann_suite oracle reproduces in DuckDB: same serving structure as
    the KMeans-fitted paths, recall still >= 0.8 on clustered vectors
    (seeds are corpus points, so a query's own cluster dominates its
    nearest cells/codewords)."""
    q = clustered.filter(F.col("vec_id") % 40 == 0)
    truth = similarity.brute_force_topk(q, clustered, k=5)
    ivf = similarity.ivf_topk_seeded(q, clustered, k=5, n_lists=8, n_probe=2)
    assert recall(ivf, truth) >= 0.8
    pq = similarity.pq_topk_seeded(
        q, clustered, k=5, m=4, nbits=4, refine_factor=8
    )
    assert recall(pq, truth) >= 0.8


def test_pq_topk_max_queries_guard(spark, clustered):
    """pq_topk collects the query side to build the ADC lookup tables;
    the collect is bounded — a batch past max_queries raises loudly
    (limit applied before the collect) instead of flooding the
    driver, and an in-bound batch is unaffected by the guard."""
    import pytest

    q = clustered.filter(F.col("vec_id") % 40 == 0)  # 8 queries
    with pytest.raises(ValueError, match="max_queries"):
        similarity.pq_topk(q, clustered, k=5, m=4, nbits=4, max_queries=3)
    ok = similarity.pq_topk(
        q, clustered, k=5, m=4, nbits=4, max_queries=8
    )
    assert ok.count() > 0


def test_pq_encode_shape_and_determinism(spark, clustered):
    books = similarity.train_pq_codebooks(clustered, m=4, nbits=4)
    assert books.shape == (4, 16, 4)
    codes = similarity.pq_encode(clustered, books)
    rows = {r["nid"]: r["codes"] for r in codes.collect()}
    assert len(rows) == clustered.count()
    assert all(len(c) == 4 and all(0 <= x < 16 for x in c) for c in rows.values())
    rows2 = {r["nid"]: r["codes"] for r in similarity.pq_encode(clustered, books).collect()}
    assert rows == rows2  # deterministic artifact


def test_simhash_multi_rotation_recall(spark):
    """Planted near-dups: pairs differing in a few words out of ~40.
    Multi-rotation blocking must recover >= 0.8 of them, and at least
    as many as the single-prefix scheme (a differing bit landing in
    the one prefix kills single-table recall)."""
    from etl_property_rumah123_spark.operators import dedup

    rng = random.Random(7)
    vocab = [f"w{i:03d}" for i in range(500)]
    rows, pair_ids = [], []
    doc_id = 0
    for i in range(60):
        words = [rng.choice(vocab) for _ in range(40)]
        rows.append((doc_id, " ".join(words)))
        near = list(words)
        for _ in range(3):  # ~7.5% token change -> small hamming delta
            near[rng.randrange(len(near))] = rng.choice(vocab)
        rows.append((doc_id + 1, " ".join(near)))
        pair_ids.append((doc_id, doc_id + 1))
        doc_id += 2
    for _ in range(80):  # unrelated filler docs
        rows.append((doc_id, " ".join(rng.choice(vocab) for _ in range(40))))
        doc_id += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def found(rotations):
        out = dedup.simhash_near_dups(
            docs, max_hamming=16, prefix_bits=8, rotations=rotations
        )
        got = {(r["id_a"], r["id_b"]) for r in out.collect()}
        return sum(1 for p in pair_ids if p in got) / len(pair_ids)

    single, multi = found(1), found(4)
    assert multi >= single  # extra rotations only add candidates
    assert multi >= 0.8


def test_bucketed_join_has_no_exchange(spark, clustered):
    """Co-located join: both sides bucketed by the key -> zero Exchange
    nodes in the physical plan (the 100 TB shuffle-elimination story)."""
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_orders_b", "t_items_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)  # stale location

    orders = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a")
    )
    items = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("k"), (F.col("id") % 13).alias("b")
    )
    save_bucketed_table(orders, "t_orders_b", ["k"], 8, sort_cols=["k"])
    save_bucketed_table(items, "t_items_b", ["k"], 8, sort_cols=["k"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_orders_b").join(spark.table("t_items_b"), "k")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.mark.slow
def test_recall_holds_at_sf1_scale():
    """The production-parameterization anchor: at sf1-equivalent scale
    (20 000 corpus vectors, dim 64 — the sf1 embeddings table's shape,
    50x the fixtures above) the registered serving configs still clear
    recall@10 >= 0.8 against brute-force ground truth on clustered
    data: IVF at n_lists=64/n_probe=2 and RP-LSH at planes=8 with
    multi-probe. Uses the same generator as tools/ann_recall_curve.py
    (the recorded BASELINE.md curve); small-fixture recall passing
    while scale recall collapsed would mean the bucket geometry does
    not survive density growth — this pins that it does."""
    import sys

    from etl_property_rumah123_spark.session import get_spark

    sys.path.insert(0, REPO_ROOT)
    from tools import ann_recall_curve as curve

    spark = get_spark(app_name="engine-tests")
    corpus, queries = curve.make_data(spark, n_corpus=20000, n_queries=100)
    try:
        gt = curve.topk_sets(
            similarity.brute_force_topk(queries, corpus, k=10)
        )
        ivf = curve.topk_sets(
            similarity.ivf_topk_seeded(
                queries, corpus, k=10, n_lists=64, n_probe=2
            )
        )
        lsh = curve.topk_sets(
            similarity.ann_topk(
                queries, corpus, dim=64, k=10, num_planes=8,
                hamming_probes=1,
            )
        )
        r_ivf = curve.recall_against(gt, ivf)
        r_lsh = curve.recall_against(gt, lsh)
        assert r_ivf >= 0.8, f"IVF recall at sf1 scale: {r_ivf:.3f}"
        assert r_lsh >= 0.8, f"RP-LSH recall at sf1 scale: {r_lsh:.3f}"
    finally:
        corpus.unpersist()
        queries.unpersist()


def test_ann_index_roundtrip_probe_matches_in_memory(spark, clustered, tmp_path):
    """The persisted IVF index must serve EXACTLY what the in-memory
    seeded IVF serves for the same (corpus, salt, n_lists): build,
    probe, and compare row sets — the artifact adds persistence, never
    different math."""
    idx = str(tmp_path / "annidx")
    info = similarity.write_ann_index(clustered, idx, n_lists=8)
    assert info["n_vectors"] == 320 and info["dim"] == DIM
    q = clustered.filter(F.col("vec_id") % 40 == 0)
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in similarity.probe_ann_index(q, idx, k=5, n_probe=2).collect()
    }
    want = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in similarity.ivf_topk_seeded(
            q, clustered, k=5, n_lists=8, n_probe=2
        ).collect()
    }
    assert got == want
    truth = similarity.brute_force_topk(q, clustered, k=5)
    ann = similarity.probe_ann_index(q, idx, k=5, n_probe=2)
    assert recall(ann, truth) >= 0.8  # recall THROUGH the artifact


def test_rp_index_lifecycle_matches_in_memory_math(
    spark, clustered, tmp_path
):
    """The persisted RP-LSH index (round 11 — the hyperplane twin of
    write_ann_index): build on 3/4 of the corpus, append the rest,
    probe — the result must be BIT-IDENTICAL to the in-memory
    ann_topk over the full corpus at the same planes/probes, because
    the bucket function is pure seed math with no fitted state (the
    append needs no frozen model to stay consistent). Also pins the
    kind guards: IVF probe/append refuse an rp_lsh artifact and vice
    versa."""
    idx = str(tmp_path / "rpidx")
    standing = clustered.filter(F.col("vec_id") % 4 != 0)
    info = similarity.write_rp_index(standing, idx, dim=DIM, num_planes=8)
    assert info["n_vectors"] == 240
    appended = similarity.append_rp_index(
        clustered.filter(F.col("vec_id") % 4 == 0), idx
    )
    assert appended["n_appended"] == 80
    q = clustered.filter(F.col("vec_id") % 40 == 0)
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in similarity.probe_rp_index(
            q, idx, k=5, hamming_probes=1
        ).collect()
    }
    want = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in similarity.ann_topk(
            q, clustered, dim=DIM, k=5, num_planes=8, hamming_probes=1
        ).collect()
    }
    assert got == want and got
    # recall through the artifact: multi-probe beats single-probe and
    # clears the clustered-data floor
    truth = similarity.brute_force_topk(q, clustered, k=5)
    single = similarity.probe_rp_index(q, idx, k=5, hamming_probes=0)
    multi = similarity.probe_rp_index(q, idx, k=5, hamming_probes=1)
    r0, r1 = recall(single, truth), recall(multi, truth)
    assert r1 >= r0 and r1 >= 0.8

    # compaction tooling carries over to this kind (dedups a retried
    # append)
    similarity.append_rp_index(
        clustered.filter(F.col("vec_id") % 4 == 0), idx  # retry dupes
    )
    out = similarity.compact_ann_index(spark, idx)
    assert out["rows_after"] == 320
    got2 = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in similarity.probe_rp_index(
            q, idx, k=5, hamming_probes=1
        ).collect()
    }
    assert got2 == want

    # kind guards, both directions
    with pytest.raises(ValueError, match="rp_lsh"):
        similarity.probe_ann_index(q, idx, k=5)
    with pytest.raises(ValueError, match="rp_lsh"):
        similarity.append_ann_index(standing, idx)
    ivf = str(tmp_path / "ivfidx")
    similarity.write_ann_index(standing, ivf, n_lists=8)
    with pytest.raises(ValueError, match="not rp_lsh"):
        similarity.probe_rp_index(q, ivf, k=5)
    with pytest.raises(ValueError, match="not rp_lsh"):
        similarity.append_rp_index(standing, ivf)
    # probe-bucket driver guard
    with pytest.raises(ValueError, match="max_probe_buckets"):
        similarity.probe_rp_index(q, idx, k=5, max_probe_buckets=2)


def test_ann_index_counts_exact_under_speculation(
    spark, clustered, tmp_path, monkeypatch
):
    """write/append_ann_index count written rows with observe() — an
    accumulator, which a speculative duplicate task attempt
    double-counts (the exact hazard table_log's observed commit
    metrics gate on). With spark.speculation on, the writers must take
    the checkpoint-and-count path so n_vectors/n_appended stay exact.
    spark.speculation is a STATIC core conf, so the gate is exercised
    through its seam, like test_observed_metrics_fall_back_under_
    speculation does."""
    from etl_property_rumah123_spark.operators import similarity as sim
    from etl_property_rumah123_spark.sinks import table_log

    calls = {"n": 0}
    real = table_log._speculation_enabled

    def spy(s):
        calls["n"] += 1
        return True

    monkeypatch.setattr(table_log, "_speculation_enabled", spy)
    try:
        idx = str(tmp_path / "spec_idx")
        info = sim.write_ann_index(
            clustered.filter(F.col("vec_id") % 4 != 0), idx, n_lists=8
        )
        appended = sim.append_ann_index(
            clustered.filter(F.col("vec_id") % 4 == 0), idx
        )
    finally:
        monkeypatch.setattr(table_log, "_speculation_enabled", real)
    assert calls["n"] == 2  # both writers consulted the gate
    assert info["n_vectors"] == 240  # exact, not accumulator-inflated
    assert appended["n_appended"] == 80
    on_disk = spark.read.parquet(f"{idx}/cells").count()
    assert on_disk == 320


def test_ann_index_probe_scans_only_probed_cells(spark, clustered, tmp_path):
    """The scale contract of the artifact: a probe must read only the
    probed cells' partition directories, not the whole index — the
    collected cell set is pushed as a planning-time partition filter."""
    idx = str(tmp_path / "annidx_prune")
    similarity.write_ann_index(clustered, idx, n_lists=8)
    one_q = clustered.filter(F.col("vec_id") == 0)
    cent = spark.read.parquet(f"{idx}/centroids")
    probes = similarity._assign_cells(
        one_q, F.broadcast(cent), "query_id", 2, "embedding", "vec_id"
    )
    probed = {r["cell"] for r in probes.select("cell").collect()}
    assert len(probed) == 2
    pruned = spark.read.parquet(f"{idx}/cells").filter(
        F.col("cell").isin(sorted(probed))
    )
    # inputFiles() lists the relation pre-pruning; what matters is the
    # set of files the EXECUTED scan touches
    touched = {
        r[0] for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    assert touched, "pruned scan saw no files"
    for f in touched:
        assert any(f"cell={c}/" in f for c in probed), f
    all_files = spark.read.parquet(f"{idx}/cells").inputFiles()
    assert len(touched) < len(all_files)
    # and the filter lands as a planning-time partition filter
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "cell" in plan


def test_ann_index_append_no_refit_and_compact(spark, clustered, tmp_path):
    """Appending a batch must (a) validate the sidecar, (b) assign
    against the FROZEN centroids (centroid files byte-identical), and
    (c) make the new vectors visible to the next probe. A retried
    (duplicate) append changes no probe results, and compaction drops
    the duplicate rows while preserving probe results exactly."""
    import pytest

    idx = str(tmp_path / "annidx_app")
    standing = clustered.filter(F.col("vec_id") < 280)
    batch = clustered.filter(F.col("vec_id") >= 280)
    similarity.write_ann_index(standing, idx, n_lists=8)
    cent_before = sorted(spark.read.parquet(f"{idx}/centroids").inputFiles())

    out = similarity.append_ann_index(batch, idx)
    assert out["n_appended"] == 40
    assert sorted(spark.read.parquet(f"{idx}/centroids").inputFiles()) == cent_before

    q = clustered.filter(F.col("vec_id") % 40 == 1)
    res1 = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in similarity.probe_ann_index(q, idx, k=5, n_probe=2).collect()
    }
    # appended ids can now be neighbors
    assert any(n >= 280 for _, n, _ in res1)

    similarity.append_ann_index(batch, idx)  # retried append: dup rows
    res2 = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in similarity.probe_ann_index(q, idx, k=5, n_probe=2).collect()
    }
    assert res2 == res1  # probes collapse duplicates

    acct = similarity.compact_ann_index(spark, idx, files_per_cell=1)
    assert acct["rows_after"] == 320 and acct["rows_before"] == 360
    assert acct["files_after"] < acct["files_before"]
    res3 = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in similarity.probe_ann_index(q, idx, k=5, n_probe=2).collect()
    }
    assert res3 == res1

    # not-an-index path fails loud before any work
    with pytest.raises(ValueError, match="_ann_meta"):
        similarity.append_ann_index(batch, str(tmp_path / "nonsuch"))
    with pytest.raises(ValueError, match="_ann_meta"):
        similarity.probe_ann_index(q, str(tmp_path / "nonsuch"))


def test_ann_index_transactional_variant(spark, clustered, tmp_path):
    """The snapshot-log-backed index: same probe results as the
    plain-dir form, appends are versioned commits, probes can
    TIME-TRAVEL to a pre-append version, compaction is an atomic
    overwrite commit, and the manifest's cell stats prune the probe
    scan. version= on a plain index fails loud."""
    import pytest

    from etl_property_rumah123_spark.sinks import table_log

    plain = str(tmp_path / "plain")
    txn = str(tmp_path / "txn")
    standing = clustered.filter(F.col("vec_id") < 280)
    batch = clustered.filter(F.col("vec_id") >= 280)
    similarity.write_ann_index(standing, plain, n_lists=8)
    info = similarity.write_ann_index(
        standing, txn, n_lists=8, transactional=True
    )
    assert info["n_vectors"] == 280
    q = clustered.filter(F.col("vec_id") % 40 == 1)

    def probe(path, **kw):
        return sorted(
            tuple(r)
            for r in similarity.probe_ann_index(
                q, path, k=5, n_probe=2, **kw
            ).collect()
        )

    base = probe(plain)
    assert probe(txn) == base  # identical serving math

    out = similarity.append_ann_index(batch, txn)
    assert out["n_appended"] == 40 and out["version"] == 1
    after = probe(txn)
    assert any(n >= 280 for _, n, _ in after)
    # time travel: version 0 predates the append
    assert probe(txn, version=0) == base
    with pytest.raises(ValueError, match="transactional"):
        similarity.probe_ann_index(q, plain, version=0)

    # retried (duplicate) append -> compaction drops dupes atomically
    similarity.append_ann_index(batch, txn)
    assert probe(txn) == after
    acct = similarity.compact_ann_index(spark, txn)
    assert acct["rows_before"] == 360 and acct["rows_after"] == 320
    assert probe(txn) == after
    # pre-compaction versions remain probe-able until vacuumed
    assert probe(txn, version=0) == base

    # the probe scan is manifest-pruned: an explicit one-cell read
    # touches fewer files than the table holds
    log = f"{txn}/cells_log"
    total = len(table_log.read_snapshot(spark, log).inputFiles())
    one = len(
        table_log.read_snapshot(
            spark, log, predicates=[("cell", "in", [0])]
        ).inputFiles()
    )
    assert 0 < one < total


def test_ann_probe_joins_broadcast_query_side(spark, clustered, tmp_path):
    """The ANN family's candidate joins must BROADCAST the bounded
    query/probe side (|Q| x n_probe rows) so corpus buckets/cells —
    the 100 TB side — are never shuffled. Pinned with auto-broadcast
    disabled: the hint, not Spark's estimate, must carry it."""
    idx = str(tmp_path / "pinidx")
    similarity.write_ann_index(clustered, idx, n_lists=8)
    q = clustered.filter(F.col("vec_id") % 40 == 1)

    def plan_of(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for df in (
            similarity.probe_ann_index(q, idx, k=5, n_probe=2),
            similarity.ivf_topk_seeded(q, clustered, k=5, n_lists=8, n_probe=2),
            similarity.ann_topk(
                q, clustered, dim=DIM, k=5, num_planes=6, hamming_probes=1
            ),
        ):
            p = plan_of(df)
            assert "BroadcastHashJoin" in p, p
            assert "SortMergeJoin" not in p, p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_ann_index_drift_metric_and_rebalance(spark, tmp_path):
    """ROUND 12 (VERDICT #6): frozen-centroid appends are the right
    batch-cost design, but a drifting ingest distribution degrades the
    index with no signal anywhere. The sidecar now records the mean
    assigned-centroid distance at build and per append;
    ann_index_drift turns that into a ratio a maintenance cadence can
    alert on (in-distribution appends stay ~1, a planted
    distribution shift blows past 2), and rebalance_ann_index — one
    pass over the index's own stored vectors, no source re-read —
    re-fits the quantizer, rebalances the smeared cells, resets the
    baseline, and restores the recall anchor for the drifted region."""
    import math as _math
    import random as _random

    rng = _random.Random(7)

    def cluster_rows(centers, per, vid0):
        rows, vid = [], vid0
        for c in centers:
            for _ in range(per):
                v = [x + rng.gauss(0, 0.1) for x in c]
                n = _math.sqrt(sum(x * x for x in v))
                rows.append((vid, [x / n for x in v]))
                vid += 1
        return rows

    def mk(rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    centers_a = [
        [rng.gauss(0, 1) for _ in range(DIM)] for _ in range(8)
    ]
    # region B: tight clusters far from A's region of the sphere
    centers_b = [
        [rng.gauss(0, 1) * 0.2 + 4.0 for _ in range(DIM)]
        for _ in range(8)
    ]
    a = mk(cluster_rows(centers_a, 40, 0))
    a2 = mk(cluster_rows(centers_a, 10, 20_000))
    b_rows = cluster_rows(centers_b, 40, 10_000)
    b = mk(b_rows)

    idx = str(tmp_path / "driftidx")
    similarity.write_ann_index(a, idx, n_lists=8)
    d0 = similarity.ann_index_drift(spark, idx)
    assert d0["build_mean_d2"] is not None and d0["build_n"] == 320
    assert d0["appended_n"] == 0 and d0["ratio"] is None

    # in-distribution append: the ratio stays near 1
    similarity.append_ann_index(a2, idx)
    d1 = similarity.ann_index_drift(spark, idx)
    assert d1["appended_n"] == 80
    assert d1["ratio"] is not None and d1["ratio"] < 1.5, d1

    # planted drift: region-B vectors land far from every centroid
    similarity.append_ann_index(b, idx)
    d2 = similarity.ann_index_drift(spark, idx)
    assert d2["ratio"] > 2.0, d2

    def max_cell():
        # resolve the LIVE cells dir — a rebalance moves it to a fresh
        # generation dir (cells_g<gen>) instead of overwriting in place
        rel = similarity._cells_rel(similarity.read_ann_meta(spark, idx))
        spark.catalog.refreshByPath(f"{idx}/{rel}")
        return (
            spark.read.parquet(f"{idx}/{rel}")
            .groupBy("cell").count()
            .agg(F.max("count")).first()[0]
        )

    smeared = max_cell()  # B concentrates into few old cells

    out = similarity.rebalance_ann_index(spark, idx)
    assert out["rebalance_gen"] == 1
    assert out["n_vectors"] == 320 + 80 + 320
    assert out["mean_d2_after"] is not None
    d3 = similarity.ann_index_drift(spark, idx)
    assert d3["appended_n"] == 0 and d3["rebalance_gen"] == 1
    assert d3["ratio"] is None  # baseline reset
    assert max_cell() < smeared  # the smeared cells rebalanced

    # recall anchor through the REBALANCED artifact, for the drifted
    # region's queries, against brute force over the full corpus
    full = mk(cluster_rows([], 0, 0)).unionByName(a).unionByName(
        a2
    ).unionByName(b)
    q = b.filter(F.col("vec_id") % 40 == 0)
    truth = similarity.brute_force_topk(q, full, k=5)
    ann = similarity.probe_ann_index(q, idx, k=5, n_probe=2)
    assert recall(ann, truth) >= 0.8

    # appends after a rebalance assign against the NEW centroids and
    # count against the NEW baseline
    similarity.append_ann_index(mk(cluster_rows(centers_b, 5, 30_000)), idx)
    d4 = similarity.ann_index_drift(spark, idx)
    assert d4["appended_n"] == 40 and d4["ratio"] < 1.5, d4

    # kind guard: drift/rebalance are IVF concepts
    rp = str(tmp_path / "rp_drift")
    similarity.write_rp_index(a, rp, dim=DIM, num_planes=6)
    with pytest.raises(ValueError, match="rp_lsh"):
        similarity.ann_index_drift(spark, rp)
    with pytest.raises(ValueError, match="rp_lsh"):
        similarity.rebalance_ann_index(spark, rp)

    # transactional twin: the rebalance swap is an overwrite COMMIT;
    # drift plumbing identical (journal files, not sidecar rewrites)
    tidx = str(tmp_path / "driftidx_tx")
    similarity.write_ann_index(a, tidx, n_lists=8, transactional=True)
    similarity.append_ann_index(b, tidx)
    assert similarity.ann_index_drift(spark, tidx)["ratio"] > 2.0

    # TIME TRAVEL x REBALANCE: a pre-rebalance version must keep
    # answering with ITS OWN quantizer — the manifest names the
    # centroid generation its cells were assigned against, so the
    # rebalance (which flips the live pointer to centroids_g1) cannot
    # silently mis-route probes of old versions.
    from etl_property_rumah123_spark.sinks import table_log

    v_pre = table_log._list_versions(spark, f"{tidx}/cells_log")[-1]
    pre = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in similarity.probe_ann_index(
            q, tidx, k=5, n_probe=2, version=v_pre
        ).collect()
    }
    out_tx = similarity.rebalance_ann_index(spark, tidx)
    assert out_tx["rebalance_gen"] == 1
    post_travel = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in similarity.probe_ann_index(
            q, tidx, k=5, n_probe=2, version=v_pre
        ).collect()
    }
    assert post_travel == pre and pre
    ann_tx = similarity.probe_ann_index(q, tidx, k=5, n_probe=2)
    truth_tx = similarity.brute_force_topk(
        q, a.unionByName(b), k=5
    )
    assert recall(ann_tx, truth_tx) >= 0.8
    # appends after the rebalance assign against the new generation and
    # their journal entries count against the new baseline
    similarity.append_ann_index(
        mk(cluster_rows(centers_b, 3, 40_000)), tidx
    )
    assert similarity.ann_index_drift(spark, tidx)["ratio"] < 1.5

    # GENERATION RETENTION (vacuum_ann_index): while the pre-rebalance
    # manifests survive, their generation is live and nothing drops;
    # after the cells_log's own vacuum prunes them, the old generation
    # is droppable — and current probes still work
    assert similarity.vacuum_ann_index(spark, tidx) == []
    table_log.vacuum(spark, f"{tidx}/cells_log", keep_last=1, min_age_s=0)
    dropped = similarity.vacuum_ann_index(spark, tidx)
    assert dropped == [f"{tidx}/centroids"]
    # probes keep working after the retention pass; ground truth is the
    # index's OWN contents (appends added vectors beyond a/b)
    tx_corpus = table_log.read_snapshot(
        spark, f"{tidx}/cells_log"
    ).select(
        F.col("id").alias("vec_id"), F.col("vec").alias("embedding")
    )
    assert recall(
        similarity.probe_ann_index(q, tidx, k=5, n_probe=2),
        similarity.brute_force_topk(q, tx_corpus, k=5),
    ) >= 0.8
    # plain-dir form: no version history — old generations drop at once
    # (centroid dirs, superseded CELLS generations, stale overlays)
    similarity.rebalance_ann_index(spark, idx)  # gen 2 on the plain index
    dropped_plain = set(similarity.vacuum_ann_index(spark, idx))
    assert f"{idx}/centroids_g1" in dropped_plain
    assert f"{idx}/centroids" in dropped_plain
    assert f"{idx}/cells" in dropped_plain  # superseded by cells_g*
    assert f"{idx}/cells_g1" in dropped_plain
    assert f"{idx}/_ann_gen_1.json" in dropped_plain
    live_rel = similarity._cells_rel(similarity.read_ann_meta(spark, idx))
    assert live_rel == "cells_g2"
    spark.catalog.refreshByPath(f"{idx}/{live_rel}")
    plain_corpus = spark.read.parquet(f"{idx}/{live_rel}").select(
        F.col("id").alias("vec_id"), F.col("vec").alias("embedding")
    )
    assert recall(
        similarity.probe_ann_index(q, idx, k=5, n_probe=2),
        similarity.brute_force_topk(q, plain_corpus, k=5),
    ) >= 0.8


def test_rebalance_crash_safety_fully_old_or_fully_new(
    spark, tmp_path, monkeypatch
):
    """ROUND 13 (VERDICT #1 + ADVICE medium): a crash anywhere inside
    rebalance_ann_index must leave probes answering either FULLY OLD
    (pre-rebalance cells + pre-rebalance quantizer) or FULLY NEW —
    never new cells silently paired with the old quantizer.

    Plain dir: the commit point is the generation overlay file; death
    before it (after both generation dirs are written) leaves the old
    index serving, a partial overlay (crash mid-write) is ignored by
    the resolver, and the retry clears the orphan dirs and completes.

    Transactional: the commit point is the cells_log overwrite commit
    carrying ann_centroids/gen/baseline; death AFTER the commit but
    before the sidecar refresh must still probe with the NEW quantizer
    (the latest manifest is the authority, not the sidecar)."""
    import json as _json
    import math as _math
    import random as _random

    rng = _random.Random(11)

    def rows(center_shift, per, vid0):
        out, vid = [], vid0
        for _ in range(per):
            v = [rng.gauss(center_shift, 1.0) for _ in range(DIM)]
            n = _math.sqrt(sum(x * x for x in v))
            out.append((vid, [x / n for x in v]))
            vid += 1
        return out

    def mk(r):
        return spark.createDataFrame(
            r, "vec_id long, embedding array<double>"
        )

    corpus = mk(rows(0.0, 200, 0))
    drifted = mk(rows(3.0, 200, 10_000))
    q = mk(rows(3.0, 8, 90_000))

    def answers(idx_path, **kw):
        return {
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in similarity.probe_ann_index(
                q, idx_path, k=5, n_probe=2, **kw
            ).collect()
        }

    # ---- plain dir -----------------------------------------------------
    idx = str(tmp_path / "crash_plain")
    similarity.write_ann_index(corpus, idx, n_lists=8)
    similarity.append_ann_index(drifted, idx)
    old = answers(idx)
    old_meta = similarity.read_ann_meta(spark, idx)
    assert similarity._cells_rel(old_meta) == "cells"

    # death between the generation-dir writes and the overlay commit
    real_overlay = similarity._write_ann_gen_overlay

    def die(*a, **kw):
        raise RuntimeError("injected death before overlay commit")

    monkeypatch.setattr(similarity, "_write_ann_gen_overlay", die)
    with pytest.raises(RuntimeError, match="injected death"):
        similarity.rebalance_ann_index(spark, idx)
    monkeypatch.setattr(similarity, "_write_ann_gen_overlay", real_overlay)
    # orphan generation dirs exist, but the index serves FULLY OLD
    _jvm, hp, fs = similarity._ann_fs(spark, idx)
    assert fs.exists(hp(f"{idx}/cells_g1"))
    assert fs.exists(hp(f"{idx}/centroids_g1"))
    m = similarity.read_ann_meta(spark, idx)
    assert similarity._cells_rel(m) == "cells"
    assert m.get("centroids_rel", "centroids") == "centroids"
    assert answers(idx) == old

    # a PARTIAL overlay (death mid-write) is ignored by the resolver
    out = fs.create(hp(f"{idx}/_ann_gen_1.json"), True)
    out.write(b'{"rebalance_gen": 1, "centroi')  # truncated JSON
    out.close()
    m = similarity.read_ann_meta(spark, idx)
    assert similarity._cells_rel(m) == "cells"
    assert answers(idx) == old
    fs.delete(hp(f"{idx}/_ann_gen_1.json"), False)

    # an overlay naming MISSING dirs (dirs deleted out from under it)
    out = fs.create(hp(f"{idx}/_ann_gen_1.json"), True)
    out.write(_json.dumps({
        "rebalance_gen": 1, "centroids_rel": "centroids_gX",
        "cells_rel": "cells_gX",
        "drift_baseline": {"mean_d2": 1.0, "n": 1},
    }).encode())
    out.close()
    m = similarity.read_ann_meta(spark, idx)
    assert similarity._cells_rel(m) == "cells"
    fs.delete(hp(f"{idx}/_ann_gen_1.json"), False)

    # the RETRY clears the orphans and completes; probes flip FULLY NEW
    out1 = similarity.rebalance_ann_index(spark, idx)
    assert out1["rebalance_gen"] == 1
    m = similarity.read_ann_meta(spark, idx)
    assert similarity._cells_rel(m) == "cells_g1"
    assert m["centroids_rel"] == "centroids_g1"
    new = answers(idx)
    # the new quantizer must serve the drifted queries well
    truth = similarity.brute_force_topk(
        q, corpus.unionByName(drifted), k=5
    )
    assert recall(similarity.probe_ann_index(q, idx, k=5, n_probe=2),
                  truth) >= 0.8
    assert new  # non-empty

    # ---- transactional -------------------------------------------------
    tidx = str(tmp_path / "crash_tx")
    similarity.write_ann_index(
        corpus, tidx, n_lists=8, transactional=True
    )
    similarity.append_ann_index(drifted, tidx)

    # death between the overwrite COMMIT and the sidecar refresh
    real_meta_write = similarity._write_ann_meta
    calls = {"n": 0}

    def die_after_commit(spark_, path_, meta_):
        # the rebalance's post-commit sidecar refresh is the only
        # _write_ann_meta call inside rebalance on the tx path
        raise RuntimeError("injected death before sidecar refresh")

    monkeypatch.setattr(similarity, "_write_ann_meta", die_after_commit)
    with pytest.raises(RuntimeError, match="injected death"):
        similarity.rebalance_ann_index(spark, tidx)
    monkeypatch.setattr(similarity, "_write_ann_meta", real_meta_write)

    # sidecar still names gen 0, but resolution reads the manifest:
    # probes run FULLY NEW (cells + quantizer from the commit)
    raw_sidecar = similarity._ann_read_json(
        spark, f"{tidx}/{similarity._ANN_META}"
    )
    assert raw_sidecar.get("rebalance_gen", 0) == 0
    assert raw_sidecar.get("centroids_rel", "centroids") == "centroids"
    m = similarity.read_ann_meta(spark, tidx)
    assert m["rebalance_gen"] == 1
    assert m["centroids_rel"] == "centroids_g1"
    from etl_property_rumah123_spark.sinks import table_log

    latest = table_log._list_versions(spark, f"{tidx}/cells_log")[-1]
    # version=None and version=latest must agree — the definition of
    # "not silently mis-routed by the stale sidecar"
    assert answers(tidx) == answers(tidx, version=latest)
    assert recall(
        similarity.probe_ann_index(q, tidx, k=5, n_probe=2), truth
    ) >= 0.8
    # appends after the crash assign against the NEW generation and
    # carry it forward in their manifests
    similarity.append_ann_index(mk(rows(3.0, 10, 95_000)), tidx)
    latest2 = table_log._list_versions(spark, f"{tidx}/cells_log")[-1]
    m2 = table_log._manifest(spark, f"{tidx}/cells_log", latest2)
    assert m2["ann_centroids"] == "centroids_g1"
    assert m2["ann_rebalance_gen"] == 1
    d = similarity.ann_index_drift(spark, tidx)
    assert d["rebalance_gen"] == 1 and d["ratio"] < 1.5


def _assignment_set(df, keep_dist=False):
    if keep_dist:
        return {
            (r[0], r["cell"], round(r["__d2"], 9)) for r in df.collect()
        }
    return {(r[0], r["cell"]) for r in df.collect()}


def test_assign_cells_arrow_matches_literal(spark, clustered, monkeypatch):
    """The Arrow GEMM shape (the above-literal-ceiling production
    path) must produce the SAME assignments as the plan-literal shape
    on non-degenerate data: same (id, cell) for the corpus pass
    (keep_n=1), same ordered probe cells (keep_n=3), and __d2 within
    float rounding of the sequential fold. Ties are the one documented
    divergence; the clustered fixture has none."""
    cent = F.broadcast(
        spark.createDataFrame(
            [
                (i, [float(x) for x in r["embedding"]])
                for i, r in enumerate(
                    clustered.filter(F.col("vec_id") % 40 == 7)
                    .orderBy("vec_id")
                    .collect()
                )
            ],
            "cell int, centroid array<double>",
        )
    )
    monkeypatch.setenv("SPARK_GRAFT_ASSIGN_SHAPE", "literal")
    lit1 = similarity._assign_cells(
        clustered, cent, "id", 1, "embedding", "vec_id", keep_dist=True
    ).collect()
    lit3 = similarity._assign_cells(
        clustered, cent, "id", 3, "embedding", "vec_id", keep_dist=True
    ).collect()
    monkeypatch.setenv("SPARK_GRAFT_ASSIGN_SHAPE", "arrow")
    arw1 = similarity._assign_cells(
        clustered, cent, "id", 1, "embedding", "vec_id", keep_dist=True
    ).collect()
    arw3 = similarity._assign_cells(
        clustered, cent, "id", 3, "embedding", "vec_id", keep_dist=True
    ).collect()

    def by_id(rows):
        out = {}
        for r in rows:
            out.setdefault(r["id"], []).append((r["__d2"], r["cell"]))
        return {k: sorted(v) for k, v in out.items()}

    l1, a1 = by_id(lit1), by_id(arw1)
    assert set(l1) == set(a1) and len(lit1) == len(arw1)
    for vid in l1:
        for (ld, lc), (ad, ac) in zip(l1[vid], a1[vid]):
            assert lc == ac
            assert abs(ld - ad) <= 1e-9 * max(1.0, abs(ld))
    l3, a3 = by_id(lit3), by_id(arw3)
    assert set(l3) == set(a3)
    for vid in l3:
        assert [c for _, c in l3[vid]] == [c for _, c in a3[vid]]
    # the arrow plan is NARROW: no exchange between scan and output
    plan = similarity._assign_cells(
        clustered, cent, "id", 1, "embedding", "vec_id"
    )._sc._jvm.PythonSQLUtils.explainString(
        similarity._assign_cells(
            clustered, cent, "id", 1, "embedding", "vec_id"
        )._jdf.queryExecution(),
        "formatted",
    )
    assert "Exchange" not in plan


def test_ann_index_lifecycle_on_arrow_shape(
    spark, clustered, tmp_path, monkeypatch
):
    """Build → append → probe → rebalance with the Arrow assignment
    shape forced end-to-end: probe answers must match the
    literal-shape index exactly (no ties in the fixture → identical
    assignments → identical candidates → the shared exact-fold
    rescoring returns identical rows), and recall holds."""
    monkeypatch.setenv("SPARK_GRAFT_ASSIGN_SHAPE", "literal")
    idx_lit = str(tmp_path / "idx_lit")
    similarity.write_ann_index(
        clustered.filter(F.col("vec_id") % 4 != 0), idx_lit, n_lists=8
    )
    similarity.append_ann_index(
        clustered.filter(F.col("vec_id") % 4 == 0), idx_lit
    )
    q = clustered.filter(F.col("vec_id") % 40 == 3)
    res_lit = {
        tuple(r)
        for r in similarity.probe_ann_index(q, idx_lit, k=5, n_probe=2).collect()
    }

    monkeypatch.setenv("SPARK_GRAFT_ASSIGN_SHAPE", "arrow")
    idx_arw = str(tmp_path / "idx_arw")
    info = similarity.write_ann_index(
        clustered.filter(F.col("vec_id") % 4 != 0), idx_arw, n_lists=8
    )
    assert info["n_vectors"] == 240
    out = similarity.append_ann_index(
        clustered.filter(F.col("vec_id") % 4 == 0), idx_arw
    )
    assert out["n_appended"] == 80
    res_arw = {
        tuple(r)
        for r in similarity.probe_ann_index(q, idx_arw, k=5, n_probe=2).collect()
    }
    assert res_arw == res_lit
    truth = similarity.brute_force_topk(q, clustered, k=5)
    assert recall(
        similarity.probe_ann_index(q, idx_arw, k=5, n_probe=2), truth
    ) >= 0.8
    # rebalance runs its one full pass through the arrow shape too
    reb = similarity.rebalance_ann_index(spark, idx_arw)
    assert reb["n_vectors"] == 320
    assert recall(
        similarity.probe_ann_index(q, idx_arw, k=5, n_probe=2), truth
    ) >= 0.8


def test_rebalance_skips_dedup_shuffle_when_accounting_clean(
    spark, clustered, tmp_path, monkeypatch
):
    """The rebalance's (id, vec).distinct() used to shuffle every
    vector byte of the index on every run, guarding against rows only
    a CRASHED append can leave. When the index's own accounting
    (drift_baseline.n + journaled append counts == actual rows) proves
    the index clean, the shuffle must be SKIPPED — and deliberate,
    journaled duplicate appends are preserved (row multiplicity is
    compact_ann_index's business; probes collapse candidates)."""
    # Spark 4: instances are the classic subclass, which defines its
    # own distinct — patch THAT, not the abstract base
    from pyspark.sql.classic.dataframe import DataFrame

    idx = str(tmp_path / "idx_guard")
    similarity.write_ann_index(
        clustered.filter(F.col("vec_id") < 240), idx, n_lists=8
    )
    batch = clustered.filter(F.col("vec_id") >= 240)
    similarity.append_ann_index(batch, idx)
    similarity.append_ann_index(batch, idx)  # journaled duplicate

    calls = {"n": 0}
    real = DataFrame.distinct

    def spy(self):
        calls["n"] += 1
        return real(self)

    monkeypatch.setattr(DataFrame, "distinct", spy)
    reb = similarity.rebalance_ann_index(spark, idx)
    monkeypatch.setattr(DataFrame, "distinct", real)
    assert calls["n"] == 0, "clean accounting must not dedup-shuffle"
    assert reb["n_vectors"] == 240 + 80 + 80
    q = clustered.filter(F.col("vec_id") % 40 == 9)
    truth = similarity.brute_force_topk(q, clustered, k=5)
    assert recall(
        similarity.probe_ann_index(q, idx, k=5, n_probe=2), truth
    ) >= 0.8


def test_rebalance_dedups_when_stray_rows_detected(
    spark, clustered, tmp_path, monkeypatch
):
    """Crashed-append debris (rows on disk with no journal entry —
    planted here as a copied data file) must trip the accounting
    mismatch and fall back to the full distinct: the rebalanced index
    holds exactly the unique rows."""
    import glob
    import shutil

    from pyspark.sql.classic.dataframe import DataFrame

    idx = str(tmp_path / "idx_debris")
    similarity.write_ann_index(clustered, idx, n_lists=8)
    meta = similarity.read_ann_meta(spark, idx)
    cells_dir = f"{idx}/{similarity._cells_rel(meta)}"
    a_file = sorted(glob.glob(f"{cells_dir}/cell=*/*.parquet"))[0]
    shutil.copy(a_file, a_file.replace(".parquet", "-debris.parquet"))
    spark.catalog.refreshByPath(cells_dir)

    calls = {"n": 0}
    real = DataFrame.distinct

    def spy(self):
        calls["n"] += 1
        return real(self)

    monkeypatch.setattr(DataFrame, "distinct", spy)
    reb = similarity.rebalance_ann_index(spark, idx)
    monkeypatch.setattr(DataFrame, "distinct", real)
    assert calls["n"] >= 1, "stray rows must engage the dedup"
    assert reb["n_vectors"] == 320  # debris collapsed, nothing lost
    q = clustered.filter(F.col("vec_id") % 40 == 9)
    truth = similarity.brute_force_topk(q, clustered, k=5)
    assert recall(
        similarity.probe_ann_index(q, idx, k=5, n_probe=2), truth
    ) >= 0.8


def test_txn_meta_resolution_walks_past_plain_commits(
    spark, tmp_path, monkeypatch
):
    """A commit made on the cells_log with the PLAIN table tooling (a
    takedown delete_snapshot, an external compaction) carries no ann_*
    keys. After a rebalance whose sidecar refresh never landed (crash
    window), resolution must walk back to the rebalance COMMIT — not
    treat the newest manifest's silence as 'fall back to the (stale)
    sidecar', which would pair gen-1 cells with the gen-0 quantizer."""
    import math as _math
    import random as _random

    from etl_property_rumah123_spark.sinks import table_log

    rng = _random.Random(23)

    def mk(shift, per, vid0):
        rows, vid = [], vid0
        for _ in range(per):
            v = [rng.gauss(shift, 1.0) for _ in range(DIM)]
            n = _math.sqrt(sum(x * x for x in v))
            rows.append((vid, [x / n for x in v]))
            vid += 1
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    tidx = str(tmp_path / "txn_walkback")
    similarity.write_ann_index(
        mk(0.0, 200, 0), tidx, n_lists=8, transactional=True
    )
    similarity.append_ann_index(mk(3.0, 200, 10_000), tidx)

    # rebalance commits gen 1, dies before the sidecar refresh
    real_meta_write = similarity._write_ann_meta

    def die(*a, **kw):
        raise RuntimeError("injected death before sidecar refresh")

    monkeypatch.setattr(similarity, "_write_ann_meta", die)
    with pytest.raises(RuntimeError, match="injected death"):
        similarity.rebalance_ann_index(spark, tidx)
    monkeypatch.setattr(similarity, "_write_ann_meta", real_meta_write)

    # a takedown lands through the plain table tooling: newest
    # manifest now has NO ann_* keys
    v_del = table_log.delete_snapshot(
        spark, f"{tidx}/cells_log", "id = 3"
    )
    latest = table_log._list_versions(spark, f"{tidx}/cells_log")[-1]
    assert latest == v_del
    m_latest = table_log._manifest(spark, f"{tidx}/cells_log", latest)
    assert "ann_centroids" not in m_latest

    # resolution walks back to the rebalance commit
    m = similarity.read_ann_meta(spark, tidx)
    assert m["rebalance_gen"] == 1
    assert m["centroids_rel"] == "centroids_g1"

    # probes quantize against the NEW generation (gen-1 cells never
    # silently paired with the gen-0 quantizer) and honor the takedown
    q = mk(3.0, 8, 90_000)
    ann = similarity.probe_ann_index(q, tidx, k=5, n_probe=2)
    got_ids = {r["neighbor_id"] for r in ann.collect()}
    assert 3 not in got_ids
    corpus = table_log.read_snapshot(spark, f"{tidx}/cells_log").select(
        F.col("id").alias("vec_id"), F.col("vec").alias("embedding")
    )
    truth = similarity.brute_force_topk(q, corpus, k=5)
    assert recall(ann, truth) >= 0.8


def test_drift_journal_untagged_entries_and_stale_listing(
    spark, clustered, tmp_path
):
    """Two journal seams: (a) entries with NO gen tag were written by
    the pre-tagging code, whose rebalance cleared the journal — a
    surviving untagged entry therefore belongs to the CURRENT
    generation whatever its number, and excluding it (old behavior:
    untagged == gen 0) would blind drift and break the rebalance
    accounting on every upgraded index; (b) the >32-file parallel
    scan must not trust a session-cached dir listing — the journal
    churns (appends add, rebalance deletes) within one session."""
    import json as _json
    import uuid as _uuid

    idx = str(tmp_path / "idx_legacy_journal")
    similarity.write_ann_index(clustered, idx, n_lists=8)
    similarity.rebalance_ann_index(spark, idx)  # gen 1
    similarity.append_ann_index(
        clustered.select(
            (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
        ).limit(40),
        idx,
    )
    _jvm, hp, fs = similarity._ann_fs(spark, idx)

    def strip_gen_tags():
        names = [
            st.getPath().getName()
            for st in fs.listStatus(hp(f"{idx}/_drift"))
        ]
        for n in names:
            e = similarity._ann_read_json(spark, f"{idx}/_drift/{n}")
            e.pop("gen", None)
            out = fs.create(hp(f"{idx}/_drift/{n}"), True)
            out.write(_json.dumps(e).encode())
            out.close()

    tagged = similarity.ann_index_drift(spark, idx)
    assert tagged["appended_n"] == 40 and tagged["rebalance_gen"] == 1
    strip_gen_tags()  # simulate a pre-tagging-era writer
    legacy = similarity.ann_index_drift(spark, idx)
    assert legacy["appended_n"] == 40, (
        "untagged journal entries must count as current-gen"
    )
    assert legacy["ratio"] == tagged["ratio"]

    # (b) force the parallel-scan path by planting > driver-read-max
    # synthetic entries, read once (a scan can leave the dir listing
    # in the session's FileStatusCache), then GROW the journal and
    # read again — the second read must reflect the new files, not a
    # cached listing
    base = similarity._ann_read_json(
        spark,
        f"{idx}/_drift/"
        + fs.listStatus(hp(f"{idx}/_drift"))[0].getPath().getName(),
    )

    def plant(k):
        for _ in range(k):
            e = dict(base, n=1, gen=1)
            out = fs.create(
                hp(f"{idx}/_drift/{_uuid.uuid4().hex[:16]}.json"), True
            )
            out.write(_json.dumps(e).encode())
            out.close()

    plant(similarity._DRIFT_DRIVER_READ_MAX + 4)
    many = similarity.ann_index_drift(spark, idx)
    assert many["appended_n"] == 40 + similarity._DRIFT_DRIVER_READ_MAX + 4
    plant(5)  # the journal grew between two same-session reads
    again = similarity.ann_index_drift(spark, idx)
    assert again["appended_n"] == many["appended_n"] + 5
    similarity.rebalance_ann_index(spark, idx)  # deletes the journal
    clean = similarity.ann_index_drift(spark, idx)
    assert clean["appended_n"] == 0 and clean["rebalance_gen"] == 2


def test_assign_broadcast_memoized_per_centroid_set(spark):
    """The Arrow kernel's centroid broadcast is memoized by content:
    repeated assignments against the SAME frozen generation (hourly
    appends, probe batches) reuse one broadcast instead of leaking one
    ~25 MB copy per call; a different centroid set (a rebalanced
    generation) gets its own entry; the cache stays bounded."""
    import numpy as np

    similarity._ASSIGN_BC_CACHE.clear()
    cells = np.arange(8, dtype=np.int32)
    cent = np.arange(8 * 4, dtype=np.float64).reshape(8, 4)
    norms = np.einsum("ij,ij->i", cent, cent)
    b1 = similarity._assign_broadcast(spark, cells, cent, norms)
    b2 = similarity._assign_broadcast(spark, cells, cent, norms)
    assert b1 is b2
    b3 = similarity._assign_broadcast(spark, cells, cent + 1.0, norms)
    assert b3 is not b1
    for i in range(similarity._ASSIGN_BC_MAX + 2):
        similarity._assign_broadcast(
            spark, cells, cent + float(10 + i), norms
        )
    assert len(similarity._ASSIGN_BC_CACHE) == similarity._ASSIGN_BC_MAX
    similarity._ASSIGN_BC_CACHE.clear()


def test_forced_crossjoin_shape_skips_centroid_collect(
    spark, clustered, monkeypatch
):
    """SPARK_GRAFT_ASSIGN_SHAPE=crossjoin exists to time the legacy
    shape in A/B drills — it must not first pay a driver collect of
    the centroid table the legacy shape never used (at the production
    design point that is ~25 MB per call charged to the wrong side of
    the A/B)."""
    from pyspark.sql.classic.dataframe import DataFrame

    cent = F.broadcast(
        spark.createDataFrame(
            [
                (i, [float(x) for x in r["embedding"]])
                for i, r in enumerate(
                    clustered.filter(F.col("vec_id") % 80 == 7)
                    .orderBy("vec_id")
                    .collect()
                )
            ],
            "cell int, centroid array<double>",
        )
    )
    monkeypatch.setenv("SPARK_GRAFT_ASSIGN_SHAPE", "crossjoin")
    calls = {"n": 0}
    real = DataFrame.collect

    def spy(self):
        calls["n"] += 1
        return real(self)

    monkeypatch.setattr(DataFrame, "collect", spy)
    out = similarity._assign_cells(
        clustered, cent, "id", 1, "embedding", "vec_id", keep_dist=True
    )
    assert calls["n"] == 0, "forced crossjoin must not collect centroids"
    monkeypatch.setattr(DataFrame, "collect", real)
    monkeypatch.setenv("SPARK_GRAFT_ASSIGN_SHAPE", "literal")
    lit = similarity._assign_cells(
        clustered, cent, "id", 1, "embedding", "vec_id", keep_dist=True
    )
    assert _assignment_set(out, keep_dist=True) == _assignment_set(
        lit, keep_dist=True
    )


def test_txn_lifecycle_commits_without_checkpointing_index(
    spark, clustered, tmp_path, monkeypatch
):
    """The transactional build/append/rebalance commits used to
    localCheckpoint the full laid-out index to aggregate count/mean
    before committing — a second materialization of every vector
    (~26 GB of local disk at the 200M-vector decade; it filled /tmp
    in the round-13 drill). The accounting now rides the commit write
    job itself: no localCheckpoint anywhere in the non-speculative
    lifecycle, and the manifest's baseline/count match the committed
    data exactly."""
    from pyspark.sql.classic.dataframe import DataFrame

    from etl_property_rumah123_spark.sinks import table_log

    calls = {"n": 0}
    real = DataFrame.localCheckpoint

    def spy(self, *a, **kw):
        calls["n"] += 1
        return real(self, *a, **kw)

    monkeypatch.setattr(DataFrame, "localCheckpoint", spy)
    idx = str(tmp_path / "txn_nockpt")
    info = similarity.write_ann_index(
        clustered, idx, n_lists=8, transactional=True
    )
    assert info["n_vectors"] == 320
    out = similarity.append_ann_index(
        clustered.select(
            (F.col("vec_id") + 50_000).alias("vec_id"), "embedding"
        ).limit(40),
        idx,
    )
    assert out["n_appended"] == 40
    reb = similarity.rebalance_ann_index(spark, idx)
    assert reb["n_vectors"] == 360
    assert calls["n"] == 0, "lifecycle must not checkpoint the index"

    # the committed manifest's baseline describes the committed data
    latest = table_log._list_versions(spark, f"{idx}/cells_log")[-1]
    m = table_log._manifest(spark, f"{idx}/cells_log", latest)
    assert m["ann_drift_baseline"]["n"] == 360
    assert m["ann_rebalance_gen"] == 1
    n_rows = table_log.read_snapshot(spark, f"{idx}/cells_log").count()
    assert n_rows == 360
    q = clustered.filter(F.col("vec_id") % 40 == 5)
    truth = similarity.brute_force_topk(q, clustered, k=5)
    assert recall(
        similarity.probe_ann_index(q, idx, k=5, n_probe=2), truth
    ) >= 0.8
