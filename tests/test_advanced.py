"""Unit tests for the advanced operators beyond the oracle harness:
as-of join edge semantics and the HLL error envelope."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_property_rumah123_spark.plans.advanced import asof_join
from etl_property_rumah123_spark.sources.catalog import table
from tests.conftest import SF_SMOKE


def make_frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 10, "c")], "k long, t long, row string"
    )
    right = spark.createDataFrame(
        [(1, 10, 100), (1, 15, 101), (2, 99, 200)], "k long, t long, payload long"
    )
    return left, right


def run(spark, strict):
    left, right = make_frames(spark)
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="t", payload="payload",
        strict=strict,
    )
    return {r["row"]: r["__asof"] for r in out.collect()}


def test_asof_strict_excludes_equal_ts(spark):
    got = run(spark, strict=True)
    assert got == {"a": None, "b": 101, "c": None}


def test_asof_inclusive_takes_equal_ts(spark):
    got = run(spark, strict=False)
    assert got == {"a": 100, "b": 101, "c": None}


def test_connected_components_path_and_singleton(spark):
    """A 5-node path (worst-case diameter for label propagation), a
    2-clique, and a singleton — labels must converge to the min id of
    each component."""
    from etl_property_rumah123_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    edges = spark.createDataFrame(
        [(4, 3), (3, 2), (2, 1), (1, 0), (6, 5)], "id_a long, id_b long"
    )
    out = {r["node"]: r["component"] for r in connected_components(nodes, edges).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 5, 6: 5, 7: 7}


def test_canonical_per_component_keep_best_deterministic(spark):
    """Canonical selection within components: highest score wins, ties
    break on LOWEST id (deterministic re-runs), singleton components
    are their own canonical, and every input row survives with an
    is_canonical flag — exactly one canonical per component."""
    from etl_property_rumah123_spark.operators.dedup import (
        canonical_per_component,
    )

    comp = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (5, 5), (6, 5), (7, 7)],
        "doc_id long, component long",
    )
    scores = spark.createDataFrame(
        # comp 0: doc 1 wins on score; comp 5: tie -> lowest id (5);
        # comp 7: singleton
        [(0, 10), (1, 99), (2, 50), (5, 7), (6, 7), (7, 1)],
        "doc_id long, score long",
    )
    rows = {
        r["doc_id"]: (r["canonical_id"], r["is_canonical"])
        for r in canonical_per_component(comp, scores).collect()
    }
    assert rows == {
        0: (1, 0), 1: (1, 1), 2: (1, 0),
        5: (5, 1), 6: (5, 0),
        7: (7, 1),
    }
    # exactly one canonical per component
    canon = [d for d, (c, f) in rows.items() if f == 1]
    assert sorted(canon) == [1, 5, 7]


def test_canonical_per_component_property_vs_reference(spark):
    """Property check against a plain-Python reference on randomized
    component/score tables (seeded): for every component the canonical
    is the max-score member with lowest-id tiebreak, every row is
    preserved exactly once, and the flag column marks exactly the
    canonical rows."""
    import random

    from etl_property_rumah123_spark.operators.dedup import (
        canonical_per_component,
    )

    rng = random.Random(99)
    for trial in range(3):
        n = rng.randint(1, 60)
        comp_of = {i: rng.randint(0, max(1, n // 4)) for i in range(n)}
        score_of = {i: rng.randint(0, 5) for i in range(n)}  # many ties
        comp = spark.createDataFrame(
            [(i, c) for i, c in comp_of.items()], "doc_id long, component long"
        )
        scores = spark.createDataFrame(
            [(i, s) for i, s in score_of.items()], "doc_id long, score long"
        )
        # python reference
        want_canon = {}
        for i, c in comp_of.items():
            cur = want_canon.get(c)
            cand = (-score_of[i], i)
            if cur is None or cand < cur:
                want_canon[c] = cand
        want = {
            i: (want_canon[c][1], int(i == want_canon[c][1]))
            for i, c in comp_of.items()
        }
        got = {
            r["doc_id"]: (r["canonical_id"], r["is_canonical"])
            for r in canonical_per_component(comp, scores).collect()
        }
        assert got == want, f"trial {trial}: mismatch"


def test_canonical_max_component_size_guard(spark):
    """The LOCAL size envelope on canonical selection (a planted giant
    component, the window-skew hazard): on_oversize='error' fails the
    job loudly at execution naming the knob; on_oversize='flag' keeps
    every giant-component member self-canonical (nothing merged,
    nothing lost) with is_oversize=1, while under-cap components keep
    exact keep-best semantics in both modes."""
    import pytest

    from etl_property_rumah123_spark.operators.dedup import (
        canonical_per_component,
    )

    # component 0: planted giant (30 members); component 5: normal pair
    comp = spark.createDataFrame(
        [(i, 0) for i in range(30)] + [(100, 5), (101, 5)],
        "doc_id long, component long",
    )
    scores = spark.createDataFrame(
        [(i, i) for i in range(30)] + [(100, 1), (101, 9)],
        "doc_id long, score long",
    )

    with pytest.raises(Exception, match="max_component_size"):
        canonical_per_component(
            comp, scores, max_component_size=10, on_oversize="error"
        ).collect()

    flagged = canonical_per_component(
        comp, scores, max_component_size=10, on_oversize="flag"
    ).collect()
    rows = {
        r["doc_id"]: (r["canonical_id"], r["is_canonical"], r["is_oversize"])
        for r in flagged
    }
    assert len(rows) == 32  # every input row survives
    # giant component: each member its own canonical, marked oversize
    for i in range(30):
        assert rows[i] == (i, 1, 1), rows[i]
    # normal component untouched: 101 wins on score
    assert rows[100] == (101, 0, 0)
    assert rows[101] == (101, 1, 0)

    # cap not exceeded -> identical to the unguarded run (plus flag col)
    ok = canonical_per_component(
        comp, scores, max_component_size=50, on_oversize="error"
    ).collect()
    assert {r["doc_id"]: r["canonical_id"] for r in ok}[0] == 29

    with pytest.raises(ValueError, match="on_oversize"):
        canonical_per_component(
            comp, scores, max_component_size=10, on_oversize="bogus"
        )


def test_blocked_cosine_matches_pairwise_join_form(spark):
    """The block-nested-loop all-pairs kernel must emit exactly the
    same pair set as the per-pair Column-expression reference."""
    from etl_property_rumah123_spark.operators import dedup

    emb = table(spark, SF_SMOKE, "embeddings")
    ref = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_dups(emb, threshold=0.3).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_dups_blocked(
            emb, threshold=0.3, n_blocks=5
        ).collect()
    }
    assert ref and blocked == ref


def test_aggregate_forms_match_reference_hofs(spark):
    """The optimized aggregate-form MinHash/SimHash in operators/dedup
    must stay bit-identical to the readable HOF reference definitions
    in functions/hashing."""
    from etl_property_rumah123_spark.functions import hashing
    from etl_property_rumah123_spark.operators import dedup

    docs = table(spark, SF_SMOKE, "documents").limit(200)

    hof_min = docs.select(
        "doc_id",
        hashing.minhash_signature(
            hashing.shingles(hashing.word_tokens(F.col("text")), 3), 16
        ).alias("sig"),
    )
    agg_min = dedup.minhash_signatures(docs, shingle_n=3, num_hashes=16)
    diff = (
        hof_min.join(agg_min, "doc_id")
        .filter(F.col("sig") != F.col("signature"))
        .count()
    )
    assert diff == 0

    hof_sim = docs.select(
        "doc_id", hashing.simhash64(hashing.word_tokens(F.col("text"))).alias("s")
    )
    agg_sim = dedup.simhash_signatures(docs)
    diff = (
        hof_sim.join(agg_sim, "doc_id")
        .filter(F.col("s") != F.col("simhash"))
        .count()
    )
    assert diff == 0

    from etl_property_rumah123_spark.operators import text_analysis

    hof_lang = docs.select(
        "doc_id", text_analysis.detect_language(F.col("text")).alias("l1")
    )
    agg_lang = text_analysis.detect_language_agg(docs)
    diff = (
        hof_lang.join(agg_lang, "doc_id")
        .filter(F.col("l1") != F.col("lang"))
        .count()
    )
    assert diff == 0

    hof_fp = docs.select(
        "doc_id", text_analysis.fingerprint(F.col("text"), 5).alias("f1")
    )
    agg_fp = text_analysis.fingerprint_agg(docs, shingle_n=5)
    diff = (
        hof_fp.join(agg_fp, "doc_id")
        .filter(F.col("f1") != F.col("fingerprint"))
        .count()
    )
    assert diff == 0


def test_null_and_empty_text_consistent_across_forms(spark):
    """Null text is canonically '' in BOTH signature families: the
    aggregate forms keep null-text docs (k-null minhash signature) and
    agree bit-for-bit with the HOF reference under the same
    canonicalization."""
    from etl_property_rumah123_spark.functions import hashing
    from etl_property_rumah123_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c d e")], "doc_id long, text string"
    )
    canon = F.coalesce(F.col("text"), F.lit(""))

    agg_min = {
        r["doc_id"]: r["signature"]
        for r in dedup.minhash_signatures(docs, shingle_n=3, num_hashes=4).collect()
    }
    assert set(agg_min) == {1, 2, 3}  # null-text doc no longer vanishes
    assert agg_min[1] == agg_min[2] == [None] * 4
    hof_min = {
        r["doc_id"]: r["sig"]
        for r in docs.select(
            "doc_id",
            hashing.minhash_signature(
                hashing.shingles(hashing.word_tokens(canon), 3), 4
            ).alias("sig"),
        ).collect()
    }
    assert hof_min == agg_min

    agg_sim = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_signatures(docs).collect()
    }
    hof_sim = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", hashing.simhash64(hashing.word_tokens(canon)).alias("s")
        ).collect()
    }
    assert set(agg_sim) == {1, 2, 3}
    assert agg_sim == hof_sim
    assert agg_sim[1] == agg_sim[2]  # null text hashes like '' text


def test_connected_components_nonconvergence_is_loud(spark):
    """A 6-node path needs 5 propagation rounds; with max_iterations=2
    the partial labeling must not be returned silently."""
    import pytest

    from etl_property_rumah123_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    edges = spark.createDataFrame(
        [(i + 1, i) for i in range(5)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iterations=2)
    with pytest.warns(RuntimeWarning, match="did not converge"):
        out = connected_components(
            nodes, edges, max_iterations=2, on_nonconverged="warn"
        )
    assert out.count() == 6  # warn mode still returns the partial labels


def test_jaccard_df_frequency_cut_bounds_hot_shingle(spark):
    """A shingle planted in 30% of docs makes the inverted-index join
    quadratic in that bucket; the max_df_fraction cut must remove it
    while distinctive-shingle pairs survive."""
    from etl_property_rumah123_spark.operators import dedup

    rows = []
    # 60 docs sharing one boilerplate shingle ('common header line'),
    # otherwise distinct
    for i in range(60):
        rows.append((i, f"common header line unique{i} tail{i} end{i}"))
    # 2 genuinely similar docs with no boilerplate
    rows.append((100, "alpha beta gamma delta epsilon"))
    rows.append((101, "alpha beta gamma delta zeta"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncut = dedup.jaccard_pairs(docs, shingle_n=3, threshold=0.01)
    cut = dedup.jaccard_pairs(
        docs, shingle_n=3, threshold=0.01, max_df_fraction=0.2
    )
    n_uncut, n_cut = uncut.count(), cut.count()
    # the hot shingle alone creates 60*59/2 = 1770 candidate pairs
    assert n_uncut >= 1770
    # after the cut only the distinctive overlap survives
    got = {(r["id_a"], r["id_b"]) for r in cut.collect()}
    assert (100, 101) in got
    assert n_cut < 10, n_cut


def test_lsh_max_bucket_size_bounds_hot_bucket(spark):
    """A bucket shared by many identical-signature docs is dropped by
    max_bucket_size; pairs colliding in small buckets survive."""
    from etl_property_rumah123_spark.operators import dedup

    rows = [(i, "the exact same boilerplate text repeated here") for i in range(40)]
    rows.append((100, "rare document alpha beta gamma delta"))
    rows.append((101, "rare document alpha beta gamma zeta"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncut = dedup.lsh_candidate_pairs(docs, shingle_n=3, num_hashes=16, bands=4)
    cut = dedup.lsh_candidate_pairs(
        docs, shingle_n=3, num_hashes=16, bands=4, max_bucket_size=10
    )
    assert uncut.count() >= 40 * 39 // 2
    got = {(r["id_a"], r["id_b"]) for r in cut.collect()}
    assert (100, 101) in got  # small-bucket collision survives
    assert cut.count() < 40  # the 40-doc hot bucket is gone


def test_simhash_max_block_size_bounds_duplicate_family(spark):
    """An exact-duplicate family shares EVERY rotation's block, so an
    unguarded run pays ~rotations x b^2 pair rows for it; max_block_size
    drops those blocks while small-block near-dups keep colliding."""
    from etl_property_rumah123_spark.operators import dedup

    rows = [(i, "the exact same boilerplate text repeated here") for i in range(40)]
    rows.append((100, "rare solitary document alpha beta gamma delta epsilon"))
    rows.append((101, "rare solitary document alpha beta gamma delta zeta"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncut = dedup.simhash_near_dups(docs, max_hamming=12)
    cut = dedup.simhash_near_dups(docs, max_hamming=12, max_block_size=10)
    assert uncut.count() >= 40 * 39 // 2
    got = {(r["id_a"], r["id_b"]) for r in cut.collect()}
    assert (100, 101) in got  # small-block near-dup survives
    assert cut.count() < 40  # the 40-copy family is gone


def test_approx_distinct_error_envelope(spark):
    e = table(spark, SF_SMOKE, "events")
    rows = (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
            F.count_distinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(3, 0.05 * r["exact"])


def test_lsh_index_artifact_probe_and_append(spark, tmp_path):
    """The persisted LSH index: build on history, probe a batch (pairs
    equal the freshly-computed cross pairs), append the batch, and
    verify a later batch now collides with it too — the
    incremental-ingest loop with per-batch cost only."""
    import random

    from etl_property_rumah123_spark.operators import dedup

    rng = random.Random(3)
    vocab = [f"v{i:03d}" for i in range(200)]

    def doc(did, words):
        return (did, " ".join(words))

    hist_rows, b1_rows, b2_rows = [], [], []
    # 45-word docs with a single word changed: shingle Jaccard ~0.87,
    # per-pair LSH hit probability (4 bands x 4 rows) ~0.96 — so the
    # >= 8/10 planted-recall floor tests recall, not hash-family luck
    # (25-word docs sat at J~0.77 -> p~0.82, which the round-4 family
    # swap exposed as a knife-edge).
    for i in range(40):
        words = [rng.choice(vocab) for _ in range(45)]
        hist_rows.append(doc(i, words))
        if i < 10:  # batch1 docs 100+i are near-dups of history docs
            near = list(words)
            near[3] = rng.choice(vocab)
            b1_rows.append(doc(100 + i, near))
    for i in range(5):  # batch2 docs near-dup batch1 docs (not history)
        base = dict(b1_rows)[100 + i].split()
        base[7] = rng.choice(vocab)
        b2_rows.append(doc(200 + i, base))
    hist = spark.createDataFrame(hist_rows, "doc_id long, text string")
    b1 = spark.createDataFrame(b1_rows, "doc_id long, text string")
    b2 = spark.createDataFrame(b2_rows, "doc_id long, text string")

    path = str(tmp_path / "lsh_index")
    dedup.write_lsh_index(hist, path)
    got1 = {
        (r["new_id"], r["indexed_id"])
        for r in dedup.probe_lsh_index(b1, path).collect()
    }
    # identical to probing the in-memory bucket table directly
    fresh = {
        (r["new_id"], r["indexed_id"])
        for r in dedup.probe_lsh_index(b1, dedup.lsh_bucket_table(hist)).collect()
    }
    assert got1 == fresh and got1  # artifact round-trip, non-trivial
    assert sum(1 for n, i in got1 if n == i + 100) >= 8  # planted recall

    dedup.write_lsh_index(b1, path, mode="append")
    got2 = {
        (r["new_id"], r["indexed_id"])
        for r in dedup.probe_lsh_index(b2, path).collect()
    }
    # batch2's planted near-dups are of batch1 docs, visible only
    # because the index was appended
    assert sum(1 for n, i in got2 if n == i + 100) >= 4

    # --- compaction: fewer files, identical probe results ----------
    # a retried batch re-appends its buckets: rows duplicate, probe
    # results don't (distinct), and compaction drops the debris
    dedup.write_lsh_index(b1, path, mode="append")
    spark.catalog.refreshByPath(path)
    files_before = len(spark.read.parquet(path).inputFiles())
    stats = dedup.compact_lsh_index(spark, path, target_files=2)
    assert stats["files_after"] <= 2 < files_before
    assert stats["rows_after"] < stats["rows_before"]  # dup rows dropped
    got2_compacted = {
        (r["new_id"], r["indexed_id"])
        for r in dedup.probe_lsh_index(b2, path).collect()
    }
    assert got2_compacted == got2
    # sidecar survived the swap: params still validate
    dedup.probe_lsh_index(b2, path).limit(1).collect()

    # TTL: retire the original history docs; only batch1 ids remain
    dedup.compact_lsh_index(
        spark, path, target_files=2, retain_condition="doc_id >= 100"
    )
    got_ttl = {
        r["indexed_id"]
        for r in dedup.probe_lsh_index(b2, path).collect()
    }
    assert got_ttl and all(i >= 100 for i in got_ttl)


def test_interval_count_join_subday_matches_bruteforce(spark):
    """The boundary-day decomposition must equal the naive theta-join
    on every edge: same-day window, exact-midnight endpoints, ts == s
    (inclusive), ts == e (exclusive), empty window (e <= s), interval
    with zero probes, multi-interior-day spans."""
    import datetime as dt
    import random

    from etl_property_rumah123_spark.operators.temporal import (
        interval_count_join,
    )

    T = dt.datetime(2024, 3, 1)
    H = dt.timedelta(hours=1)
    intervals = [
        (1, T + 5 * H, T + 9 * H),            # same-day partial
        (2, T, T + 48 * H),                   # exact midnight start+end
        (3, T + 30 * H, T + 30 * H),          # empty (e == s)
        (4, T + 3 * H, T + 99 * H),           # 4 days, 2 interior
        (5, T + 200 * H, T + 210 * H),        # window beyond all probes
        (6, T + 26 * H, T + 27 * H),          # 1-hour sub-day window
        (7, None, T + 9 * H),                 # NULL start -> 0 (SQL)
        (8, T + 5 * H, None),                 # NULL end -> 0 (SQL)
    ]
    rng = random.Random(5)
    probes = [(i, T + dt.timedelta(minutes=rng.randrange(0, 7 * 24 * 60)))
              for i in range(600)]
    # planted edge probes: exactly at starts/ends of interval 1
    probes += [(9001, T + 5 * H), (9002, T + 9 * H)]
    iv = spark.createDataFrame(intervals, "k long, s timestamp, e timestamp")
    p = spark.createDataFrame(probes, "pid long, ts timestamp")

    got = {
        r["k"]: r["n_in_window"]
        for r in interval_count_join(iv, p, "k", "s", "e", "ts").collect()
    }
    expect = {
        k: (
            0
            if s is None or e is None
            else sum(1 for _, ts in probes if s <= ts < e)
        )
        for k, s, e in intervals
    }
    assert got == expect
    # zero-count and NULL-endpoint intervals all kept, all 0
    assert got[3] == got[5] == got[7] == got[8] == 0


def test_minhash_xxhash64_family_matches_md5_candidates(spark):
    """The production xxhash64 MinHash family (native 64-bit mins +
    band keys) must find the same planted near-dup candidate pairs as
    the portable md5 family — same min-over-set semantics, same
    S-curve, only the hash space differs."""
    import random

    from etl_property_rumah123_spark.operators import dedup

    rng = random.Random(11)
    vocab = [f"t{i:03d}" for i in range(300)]
    rows, planted = [], []
    did = 0
    for _ in range(30):
        words = [rng.choice(vocab) for _ in range(30)]
        near = list(words)
        near[5] = rng.choice(vocab)
        rows.append((did, " ".join(words)))
        rows.append((did + 1, " ".join(near)))
        planted.append((did, did + 1))
        did += 2
    for _ in range(40):
        rows.append((did, " ".join(rng.choice(vocab) for _ in range(30))))
        did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def pairs(family):
        out = dedup.lsh_candidate_pairs(
            docs, shingle_n=3, num_hashes=16, bands=4, hash_family=family
        )
        return {(r["id_a"], r["id_b"]) for r in out.collect()}

    md5_pairs, xx_pairs = pairs("md5"), pairs("xxhash64")
    md5_rec = sum(1 for p in planted if p in md5_pairs) / len(planted)
    xx_rec = sum(1 for p in planted if p in xx_pairs) / len(planted)
    # both families are the same MinHash estimator; recall parity on
    # planted pairs (tiny slack: the hash permutations differ)
    assert xx_rec >= md5_rec - 0.1 and xx_rec >= 0.8
    # deterministic across invocations
    assert xx_pairs == pairs("xxhash64")


def test_check_expectations_null_predicate_is_violation(spark):
    """NULL rule outcomes count as violations (unknown is not a pass),
    and all rules evaluate in one pass with exact counts."""
    from pyspark.sql import functions as F

    from etl_property_rumah123_spark.operators.profiling import (
        check_expectations,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "id long, v double"
    )
    out = {
        r["rule"]: (r["n_rows"], r["n_violations"], r["pass_rate"])
        for r in check_expectations(
            df,
            {
                "v_positive": F.col("v") > 0,   # NULL for id=2 -> violation
                "id_nonnull": F.col("id").isNotNull(),
            },
        ).collect()
    }
    assert out["v_positive"] == (3, 2, round(1 - 2 / 3, 6))
    assert out["id_nonnull"] == (3, 0, 1.0)


def test_check_expectations_guards_names_empty_and_zero_rows(spark):
    """Rule names are interpolated into generated stack() SQL, so
    non-identifier names must be rejected (injection surface), empty
    rules must raise, and an empty input yields pass_rate 1.0."""
    import pytest
    from pyspark.sql import functions as F

    from etl_property_rumah123_spark.operators.profiling import (
        check_expectations,
    )

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="empty"):
        check_expectations(df, {})
    for bad in ("a b", "a'b", "a-b", "a,b", 'a"b'):
        with pytest.raises(ValueError, match="identifier"):
            check_expectations(df, {bad: F.col("id").isNotNull()})
    empty = df.filter(F.col("id") < 0)
    rows = check_expectations(empty, {"ok": F.col("id") > 0}).collect()
    assert [(r["rule"], r["n_rows"], r["n_violations"], r["pass_rate"])
            for r in rows] == [("ok", 0, 0, 1.0)]


def test_plan_report_reads_real_plans(spark):
    """plan_report on a known-good query reports pushdown, broadcast,
    codegen, and no scale-killers; on a deliberate cross join it
    flags the cartesian."""
    from pyspark.sql import functions as F

    from etl_property_rumah123_spark.operators.profiling import plan_report
    from etl_property_rumah123_spark.plans import load_all

    REG = load_all()
    r = plan_report(REG["q5_region_volume"].fn(spark, SF_SMOKE))
    assert r["scans"] >= 4 and r["pushed_filters"]
    assert r["broadcasts"] >= 1  # region/nation dims
    assert not r["cartesian"] and not r["bnlj"] and r["python_evals"] == 0
    assert r["adaptive"]

    a = spark.range(3)
    b = spark.range(3).withColumnRenamed("id", "id2")
    bad = plan_report(a.crossJoin(b).filter(F.col("id") + F.col("id2") > 2))
    assert bad["cartesian"] or bad["bnlj"]


def test_star_components_path_clique_and_round_bound(spark):
    """connected_components_star labels a 100-node path — which the
    min-label algorithm REFUSES at its default 20-round budget
    (diameter 99) — within the O(log n) bound (ceil(log2 100) + 4 = 11
    alternations), and is hash-identical to min-label on clique/mixed
    fixtures where both converge."""
    import math

    from etl_property_rumah123_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    # --- 100-node path: 0-1-2-...-99 ---
    n = 100
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    # the O(diameter) algorithm refuses loudly at its default budget
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges).collect()
    # the star algorithm converges inside the logarithmic bound
    bound = math.ceil(math.log2(n)) + 4
    out = {
        r["node"]: r["component"]
        for r in connected_components_star(
            nodes, edges, max_rounds=bound
        ).collect()
    }
    assert out == {i: 0 for i in range(n)}

    # --- cliques + singleton + reversed-id chain: parity with min-label ---
    rows = []
    for base in (0, 10):
        ids = list(range(base, base + 5))
        rows += [(a, b) for a in ids for b in ids if a < b]
    rows += [(25, 24), (24, 23)]  # descending chain
    edges2 = spark.createDataFrame(rows, "id_a long, id_b long")
    nodes2 = spark.createDataFrame(
        [(i,) for i in list(range(15)) + [23, 24, 25, 99]], "doc_id long"
    )
    want = {
        r["node"]: r["component"]
        for r in connected_components(nodes2, edges2).collect()
    }
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(nodes2, edges2).collect()
    }
    assert got == want
    assert got[99] == 99 and got[25] == 23  # singleton + chain spot checks


def test_star_components_nonconvergence_is_loud(spark):
    import pytest

    from etl_property_rumah123_spark.operators.dedup import (
        connected_components_star,
    )

    nodes = spark.createDataFrame([(i,) for i in range(64)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(nodes, edges, max_rounds=1).collect()


def test_star_components_hub_skew_no_single_task_pileup(spark):
    """A 1M-leaf hub star — the shape star contraction itself produces
    for any big component — must finish promptly AND its per-center
    min must come from a partial (map-side) aggregate, not a window:
    ``min().over(partitionBy(u))`` pins every row of the hot key into
    ONE task, which at 100 TB turns a billion-node component into a
    single straggler. The plan assertion pins the groupBy-min + join
    form so the window regression can't silently return."""
    from etl_property_rumah123_spark.operators.dedup import (
        _star_neighborhood_min,
        connected_components_star,
    )

    n = 1_000_000
    nodes = spark.range(0, n + 1).selectExpr("id as doc_id")
    # every leaf 1..n attached to hub 0  → hot key by construction
    edges = spark.range(1, n + 1).selectExpr("0 as id_a", "id as id_b")
    # plan pin on the per-round building block: partial (map-side) min
    # present, no window operator anywhere
    plan = (
        _star_neighborhood_min(
            edges.selectExpr("id_a as u", "id_b as v")
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_min" in plan
    assert "Window" not in plan
    out = connected_components_star(nodes, edges, max_rounds=6)
    agg = out.groupBy("component").count().collect()
    assert len(agg) == 1 and agg[0]["count"] == n + 1


def test_lsh_index_meta_guard_refuses_mismatch(spark, tmp_path):
    """The _lsh_meta.json sidecar: probing or appending with different
    bucket-space parameters (or against a sidecar-less pre-round-4
    artifact) must refuse LOUDLY — mismatched bucket spaces produce
    zero hits, not errors, which silently corrupts a dedup corpus."""
    import pytest

    from etl_property_rumah123_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta token{i}") for i in range(8)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    dedup.write_lsh_index(docs, path, bands=4, num_hashes=16)
    # matching parameters probe fine
    dedup.probe_lsh_index(docs, path, bands=4, num_hashes=16).collect()
    # different band count -> different bucket space -> refuse
    with pytest.raises(ValueError, match="parameter mismatch"):
        dedup.probe_lsh_index(docs, path, bands=8, num_hashes=16)
    with pytest.raises(ValueError, match="parameter mismatch"):
        dedup.write_lsh_index(docs, path, mode="append", bands=8, num_hashes=16)
    # a sidecar-less artifact (pre-round-4 or foreign) is refused too
    bare = str(tmp_path / "bare")
    dedup.lsh_bucket_table(docs).write.parquet(bare)
    with pytest.raises(ValueError, match="no _lsh_meta.json"):
        dedup.probe_lsh_index(docs, bare)


def test_session_window_exact_gap_boundary_ties(spark):
    """The session-window gap-boundary knife-edge, pinned by an
    adversarial tie fixture (real microsecond data never lands on the
    exact boundary): a successor at EXACTLY the gap distance MERGES —
    the window end is inclusive — so the island-rewrite twin (and the
    registry oracle) must break strictly AFTER the gap. This test
    exists because the >= rule passes every real-data parity check
    and only a constructed tie exposes it."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    gap = dt.timedelta(seconds=1800)
    us = dt.timedelta(microseconds=1)
    rows = [
        # user 1: second event at exactly gap -> MERGES (inclusive end)
        (1, base), (1, base + gap),
        # user 2: at gap - 1us -> ONE session
        (2, base), (2, base + gap - us),
        # user 3: at gap + 1us -> TWO sessions
        (3, base), (3, base + gap + us),
        # user 4: chain where each hop < gap but total > gap -> ONE
        (4, base), (4, base + gap - us), (4, base + 2 * gap - 2 * us),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = (
        df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("n").alias("n_events"))
    )
    out = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in got.collect()}
    assert out == {1: (1, 2), 2: (1, 2), 3: (2, 2), 4: (1, 3)}

    # and the strictly-greater island rule reproduces exactly that
    import duckdb

    con = duckdb.connect()
    con.register("e", df.toPandas())
    drows = con.execute("""
      WITH g AS (
        SELECT user_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS ns
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      )
      SELECT user_id, SUM(ns), COUNT(*) FROM g GROUP BY user_id
    """).fetchall()
    assert {int(u): (int(s), int(c)) for u, s, c in drows} == out


def test_asof_join_equal_timestamp_strictness(spark):
    """As-of tie semantics pinned: with left_ts == right_ts, strict=True
    must NOT see the payload (an event at t cannot see a quote stamped
    t), strict=False must; and a right row strictly later is invisible
    either way. The side-ordering trick in asof_join encodes this."""
    from etl_property_rumah123_spark.plans.advanced import asof_join

    left = spark.createDataFrame(
        [(1, 100, "e1"), (1, 200, "e2")], "k long, t long, name string"
    )
    right = spark.createDataFrame(
        [(1, 100, "p@100"), (1, 150, "p@150"), (1, 201, "p@201")],
        "k long, t long, payload string",
    )
    strict = {
        r["name"]: r["__asof"]
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="t",
            payload="payload", strict=True,
        ).collect()
    }
    assert strict == {"e1": None, "e2": "p@150"}
    incl = {
        r["name"]: r["__asof"]
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="t",
            payload="payload", strict=False,
        ).collect()
    }
    assert incl == {"e1": "p@100", "e2": "p@150"}


def test_asof_join_planted_hot_key_bucketed_form(spark):
    """PLANTED SKEW for the as-of join (round 11 — the one headline
    join shape without a skew drill). The union+window form partitions
    the window by the key, and AQE's skew-join split does NOT apply to
    window partitions: a user carrying 30% of the clicks is ONE task
    doing 30% of the work. The honest mitigation is the
    ``time_buckets=N`` two-phase form — per-(key, bucket) running
    last + per-key bucket-final carry — which bounds any task at
    ~hot/N rows. This pins (a) result parity with the single-window
    form on the planted-skew data, including strictness at equal
    timestamps and never-clicked users, and (b) the de-skewed
    structure: the data-sized window partitions by (key, bucket), the
    per-key window sees only N rows per key."""
    import datetime as dt

    from etl_property_rumah123_spark.plans.advanced import asof_join

    n = 60_000
    base = dt.datetime(2024, 1, 1)
    # 30% of all events (and their clicks) land on user 0; timestamps
    # spread uniformly so range-bucketing can split the hot key
    events = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 10 < 3, F.lit(0))
        .otherwise(F.col("id") % 997)
        .alias("user_id"),
        (
            F.lit(base)
            + F.make_interval(secs=(F.col("id") * 7) % 86_400)
        ).alias("ts"),
        F.when(F.col("id") % 5 == 0, F.lit("click"))
        .otherwise(F.lit("view"))
        .alias("event_type"),
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    left = events.select("event_id", "user_id", "ts")

    def run(strict=True, **kw):
        out = asof_join(
            left, clicks, on="user_id", left_ts="ts", right_ts="ts",
            payload="click_id", strict=strict, **kw,
        )
        return sorted(
            (r["event_id"], r["__asof"]) for r in out.collect()
        )

    single = run()
    bucketed = run(time_buckets=16)
    assert bucketed == single and len(single) == n

    # structure pin: the data-sized window partitions by (__k, __b) —
    # never by the bare key — so the hot user's rows split ~16 ways
    df = asof_join(
        left, clicks, on="user_id", left_ts="ts", right_ts="ts",
        payload="click_id", strict=True, time_buckets=16,
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan[:2000]
    data_sized = [s for s in specs if "__b" in s and "__k" in s]
    assert data_sized, f"no (key, bucket) window in plan:\n{plan[:2000]}"

    # inclusive mode survives bucketing too (equal-ts rows share a
    # bucket, so side-ordering still decides visibility)
    assert run(strict=False, time_buckets=16) == run(strict=False)


def test_aqe_skew_join_split_fires_on_planted_hot_key(spark):
    """The q3/q5 join shape under a planted hot key: one key carrying
    ~70% of the fact side must trigger AQE's skew-join split (the
    runtime lever the session factory enables for exactly this), not
    a single straggler partition. Pinned on the EXECUTED adaptive
    plan, with thresholds lowered so the 200k-row fixture exercises
    the same code path a 100 TB hot customer would."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        )
    }
    try:
        # no broadcast (force the shuffle join AQE must repair), and
        # thresholds scaled down to the fixture's byte volume
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB"
        )
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB"
        )
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 7, F.lit(1))
            .otherwise(F.col("id"))
            .alias("k"),
            F.lpad(F.col("id").cast("string"), 100, "x").alias("pad"),
        )
        dim = spark.range(200_001).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("grp"),
        )
        j = fact.join(dim, "k").groupBy("grp").agg(
            F.count("*").alias("n"), F.max("pad").alias("mx")
        )
        rows = j.collect()
        assert sum(r["n"] for r in rows) == 200_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE skew split did not fire:\n{plan[:2000]}"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
