"""Deduplication operators for training-data pipelines.

Five families, per the north star (BASELINE.json:6):

- exact: hash-groupBy on content digest — one shuffle of (digest, id)
- MinHash + LSH: shingle -> signature -> band -> bucket self-join —
  the only pairwise comparisons run inside buckets
- SimHash: 64-bit signature + bucket-by-prefix for near-dup candidates
- n-gram Jaccard: token-set join with exact Jaccard verification
- embedding cosine: near-dup pairs above a cosine threshold

Scale design: every candidate-generation step is a hash shuffle on a
content-derived key (never a cross join); verification joins carry
only (id, small payload) pairs. At 100 TB the band/bucket joins are
the dominant shuffle — bands and rows-per-band tune the candidate
volume (S-curve), and AQE skew handling splits pathological buckets
(e.g. boilerplate-heavy shingles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_property_rumah123_spark.functions import hashing
from etl_property_rumah123_spark.functions.vector import dot
from etl_property_rumah123_spark.operators import common
from etl_property_rumah123_spark.operators.cleaning import dedupe_keep_first


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: keep the smallest id per content digest.

    Digest-first grouping means the shuffle carries md5(text) + id, not
    the document bodies; the kept ids join back to the corpus if full
    rows are needed (map-side join at scale via broadcast of survivors
    or a shuffle join on id).
    """
    digests = df.select(
        F.md5(F.col(text_col)).alias("digest"), F.col(id_col).alias("keep_id")
    )
    return digests.groupBy("digest").agg(
        F.min("keep_id").alias("keep_id"),
        F.count("*").alias("n_copies"),
    )


def exact_dedup_keep_first(
    df: DataFrame, text_col: str = "text", order_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup returning full surviving rows (keep-first semantics
    via the same window pattern as the reference's T2)."""
    with_digest = df.withColumn("__digest", F.md5(F.col(text_col)))
    return dedupe_keep_first(with_digest, key="__digest", order_col=order_col).drop(
        "__digest"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def shingle_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    words_col: str | None = None,
) -> DataFrame:
    """(doc_id, shingle) rows — word n-grams in fully codegen'd,
    SHUFFLE-FREE form.

    Each of the n alignment slices (``slice(tokens, j+1, n_shingles)``)
    is zipped positionally (``arrays_zip``) and exploded — pure narrow
    expressions, no exchange at all. Two predecessors were worse,
    measured: the per-row higher-order ``transform(sequence, slice)``
    form's interpreted inner loop is O(tokens^2) per document (77s ->
    4s at sf0.1 after leaving it), and the posexplode + window-``lead``
    form it was first replaced with still SHUFFLED AND SORTED every
    raw token row on doc_id just to assemble neighbors. With shingles
    narrow, the downstream signature groupBy's map-side partial
    combine runs before anything shuffles, so the only exchange in
    the signature pipeline carries ~16 partial mins per doc per
    partition instead of every raw shingle row (~10x the corpus
    bytes).

    Honest A/B, interleaved same-JVM (signature pipeline, warm/cold):
    sf0.1 old 1.7-2.0 s vs new 2.1-2.2 s; sf1 old 2.0-2.3 s vs new
    2.4-2.5 s warm, but 11.1 s vs 3.8 s COLD (no big sort to warm
    up). Local mode slightly favors the window form warm because its
    'shuffle' is an in-process copy — the zip form's struct
    materialization costs more than a free shuffle saves. The
    zero-exchange form is kept because on a real cluster the avoided
    wide shingle shuffle+sort is network+disk, not memcpy, and the
    cold-path behavior is what one-shot pipeline runs see.

    Docs too short for any shingle keep exactly one NULL-shingle
    marker row (``explode_outer`` of the empty zip), so downstream
    aggregations see every doc without a restore join. NULL text is
    canonically '' (coalesced), aggregating to a k-null signature —
    identical to the per-row HOF reference form instead of silently
    vanishing.

    ``words_col``: use an already-tokenized array column instead of
    re-tokenizing ``text_col`` — the seam the shared tokenized
    documents view (plans/llm_queries.py:tokenized_docs) plugs into so
    a multi-branch corpus pipeline tokenizes the corpus ONCE. The
    only admissible difference from in-place tokenization is blank
    text ([] vs ['']), which both fall below any shingle_n and hit
    the same NULL-marker path.
    """
    if words_col is not None:
        toks = F.col(words_col)
    else:
        toks = hashing.word_tokens(F.coalesce(F.col(text_col), F.lit("")))
    n_sh = F.greatest(F.size(toks) - (shingle_n - 1), F.lit(0))
    # Explicit aliases pin the zip's struct field names; unaliased
    # slices would get analyzer-default names ("0".."n-1"), which is
    # undocumented Catalyst behavior a refactor or Spark upgrade could
    # silently change out from under the getField below.
    slices = [
        F.slice(toks, j + 1, n_sh).alias(f"s{j}") for j in range(shingle_n)
    ]
    rows = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(F.arrays_zip(*slices)).alias("__z"),
    )
    parts = [F.col("__z").getField(f"s{j}") for j in range(shingle_n)]
    shingle = F.when(parts[-1].isNotNull(), F.concat_ws(" ", *parts))
    return rows.select("doc_id", shingle.alias("shingle"))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 16,
    hash_family: str = "md5",
) -> DataFrame:
    """(id, signature) — k min-hashes over word shingles.

    Formulated as shingle rows + k ``min(hash(seed|shingle))``
    **aggregates**: identical definition to a per-row HOF minhash (min
    over a set ignores duplicates and ordering) but the mins run
    inside WholeStageCodegen with map-side partial combine — the
    shuffle carries one partial signature per doc per partition, which
    is also the formulation that survives 100 TB (nothing per-row is
    O(tokens^2), no interpreted expression trees).

    ``hash_family`` (the SimHash md5/xxhash64 duality,
    :func:`md5_hash60`):
    - 'md5'     — 32-hex-char string mins of ``md5('<k>|' ||
      shingle)``; portable, the legacy oracle family (kept as the
      ``minhash_lsh_md5`` suite part).
    - 'xxhash64' — ONE JVM string hash per shingle (``xxhash64(
      shingle)``), then k seeded values derived arithmetically as
      ``xxhash64(base, k)`` = hashLong(k, hashLong(base, 42)) — two
      fixed-width mixes instead of k full UTF-8 hashes, so the
      signature stage does 1 variable-length + 2k fixed-width hashes
      per shingle vs the md5 family's k digest+hex materializations.
      Same min-over-set semantics, same S-curve; deriving the k
      functions from one 64-bit base is the standard one-permutation
      k-mix construction. Since round 4 this family is ALSO
      oracle-checked bit-for-bit: functions/xxh64_sql.py expands
      Spark's XXH64 into pure DuckDB SQL. The production AND headline
      path.

    Short docs: md5 family yields k nulls (NULL marker row -> null
    mins); xxhash64 family yields the constant seed chain (Spark hash
    functions SKIP null children, so the marker hashes to seed 42) —
    all short docs share one signature and pair together, same
    behavior both families (md5's k-null signature also collapses to
    one band key via concat_ws null-skipping).
    """
    if hash_family not in ("md5", "xxhash64"):
        raise ValueError(f"hash_family must be 'md5' or 'xxhash64', got {hash_family!r}")
    rows = shingle_rows(df, text_col, id_col, shingle_n)

    if hash_family == "md5":
        def h(i):
            return F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))
    else:
        rows = rows.withColumn("__hbase", F.xxhash64(F.col("shingle")))

        def h(i):
            return F.xxhash64(F.col("__hbase"), F.lit(i).cast("long"))

    mins = [F.min(h(i)).alias(f"__h{i}") for i in range(num_hashes)]
    return (
        rows.groupBy("doc_id")
        .agg(*mins)
        .select(
            "doc_id",
            F.array(*[F.col(f"__h{i}") for i in range(num_hashes)]).alias(
                "signature"
            ),
        )
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    materialize: bool = True,
    max_bucket_size: int | None = None,
    hash_family: str = "md5",
) -> DataFrame:
    """MinHash-LSH candidate pairs (i < j) sharing >= 1 band bucket.

    shingle -> minhash -> band keys -> explode -> self-join per bucket.
    The self-join is on the band key, so work is proportional to
    sum(bucket^2) not n^2; the distinct() collapses pairs that collide
    in several bands.

    ``materialize`` localCheckpoints the bucket table so the self-join
    reads it once instead of recomputing the whole
    shingle->minhash pipeline for each side — the DataFrame analog of
    persisting the signature table, which is exactly what a 100 TB
    dedup run does (signatures are reused across many band joins and
    incremental runs).

    ``max_bucket_size`` drops band buckets holding more than that many
    docs BEFORE the self-join — the hot-bucket guard. A bucket shared
    by b docs costs b^2 comparisons; one boilerplate-heavy bucket with
    1% of a 100 TB corpus is quadratic death that AQE skew-splitting
    only spreads, not shrinks. Dropping is sound for dedup recall:
    a near-dup cluster that large is better handled by exact dedup of
    its dominant content, and its members still collide in other
    (discriminative) bands.

    ``hash_family``: 'md5' (portable, oracle-checkable) or 'xxhash64'
    (the production fast path — native 64-bit mins and band keys, see
    :func:`minhash_signatures`). Same banding semantics either way.
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(
        df, text_col, id_col, shingle_n, num_hashes, hash_family=hash_family
    )
    buckets = sigs.select(
        "doc_id",
        F.explode(
            hashing.lsh_band_keys(
                F.col("signature"), bands, rows, band_hash=hash_family
            )
        ).alias("bucket"),
    )
    if max_bucket_size is not None:
        sizes = buckets.groupBy("bucket").agg(F.count("*").alias("__bn"))
        keep = sizes.filter(F.col("__bn") <= max_bucket_size).select("bucket")
        buckets = buckets.join(keep, "bucket")
    if materialize:
        buckets = common.materialize(buckets)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def lsh_bucket_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """The (doc_id, bucket) band-bucket table — the REUSABLE index
    artifact of the LSH dedup family. Computed once per corpus (or
    per ingest batch) and persisted; every later near-dup probe is a
    bucket equi-join against it, so per-batch cost is proportional to
    the batch, never the corpus."""
    rows = num_hashes // bands
    sigs = minhash_signatures(
        df, text_col, id_col, shingle_n, num_hashes, hash_family=hash_family
    )
    return sigs.select(
        "doc_id",
        F.explode(
            hashing.lsh_band_keys(
                F.col("signature"), bands, rows, band_hash=hash_family
            )
        ).alias("bucket"),
    )


#: Bucket-key format generation. Bump whenever the key derivation
#: changes incompatibly — round 4 did exactly that (the xxhash64
#: family moved from string-concat band hashes to chained multi-column
#: k-mix), which makes an old index SILENTLY match nothing: every
#: probe misses, every near-dup is admitted, and the corpus corrupts
#: with no error. The sidecar turns that silence into a loud refusal.
LSH_INDEX_FORMAT = 2


def _lsh_meta(**lsh_kwargs) -> dict:
    return {
        "format": LSH_INDEX_FORMAT,
        "shingle_n": lsh_kwargs.get("shingle_n", 3),
        "num_hashes": lsh_kwargs.get("num_hashes", 16),
        "bands": lsh_kwargs.get("bands", 4),
        "hash_family": lsh_kwargs.get("hash_family", "xxhash64"),
    }


def _check_lsh_meta(spark, path: str, **lsh_kwargs) -> None:
    """Refuse to probe/append an index whose recorded bucket-space
    parameters or key format differ from the caller's — mismatches
    produce zero hits, not errors, so they must be caught here. A
    missing sidecar (pre-round-4 artifact) is treated as format 1."""
    import json

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path + "/_lsh_meta.json")
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        raise ValueError(
            f"LSH index at {path} has no _lsh_meta.json sidecar — it "
            "predates the round-4 bucket-key format (or is not a "
            "write_lsh_index artifact). Rebuild it with "
            "write_lsh_index; probing would silently match nothing."
        )
    stream = fs.open(p)
    try:
        raw = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    meta = json.loads(raw.decode("utf-8"))
    want = _lsh_meta(**lsh_kwargs)
    if meta != want:
        raise ValueError(
            f"LSH index parameter mismatch at {path}: index carries "
            f"{meta}, caller expects {want}. Same shingle_n/num_hashes/"
            "bands/hash_family/format are required — differing bucket "
            "spaces silently match nothing."
        )


def write_lsh_index(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    **lsh_kwargs,
) -> str:
    """Persist the LSH bucket table as Parquet plus a
    ``_lsh_meta.json`` sidecar recording the bucket-space parameters
    and key-format generation. ``mode='append'`` is the
    incremental-ingest path: a new crawl batch's buckets are added to
    the standing index after probing (so the NEXT batch dedups
    against this one too); appends VALIDATE the sidecar first — the
    parameters define the bucket space, and a mismatch would not
    error, it would silently never collide."""
    import json

    spark = df.sparkSession
    if mode == "append":
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        root = jvm.org.apache.hadoop.fs.Path(path)
        if root.getFileSystem(conf).exists(root):
            _check_lsh_meta(spark, path, **lsh_kwargs)
    lsh_bucket_table(df, **lsh_kwargs).write.mode(mode).parquet(path)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path + "/_lsh_meta.json")
    out = p.getFileSystem(conf).create(p, True)
    try:
        out.write(
            json.dumps(_lsh_meta(**lsh_kwargs), sort_keys=True).encode()
        )
    finally:
        out.close()
    return path


def compact_lsh_index(
    spark: SparkSession,
    path: str,
    target_files: int = 32,
    retain_condition: str | None = None,
) -> dict:
    """Maintenance for the append-only persisted LSH index: collapse
    the accumulated per-append file debris into ``target_files``
    parquet files, dropping exact-duplicate ``(doc_id, bucket)`` rows
    (a batch re-ingested after a retry appends its buckets twice;
    probes are ``distinct`` so the duplicates never changed results —
    they only inflated the join input). ``retain_condition`` is the
    TTL hook: a SQL predicate over the bucket table's columns selects
    the rows to KEEP (e.g. ``"doc_id >= 20250101000"`` for time-coded
    ids); expired docs stop matching as `indexed_id` from the next
    probe on.

    Probe results over the compacted index are IDENTICAL to the
    uncompacted one (minus retired rows) by construction — same rows,
    same bucket space, sidecar carried verbatim — which the caller
    can assert cheaply because this returns row/file accounting.

    Contract: single maintainer — run in a maintenance window, not
    concurrently with appends (plain parquet dirs have no manifest to
    race on). The swap is rename-aside / rename-in / delete-old, so an
    index exists at ``path`` except during two metadata renames; an
    interrupted swap leaves the original at ``<path>.__old__`` (rename
    back to recover) and the compacted copy at ``<path>.__compact__``. For multi-writer commit semantics store the
    bucket table in a snapshot-log table (sinks/table_log.py) — this
    plain-dir form is the bulk-batch shape.
    """
    import json

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hadoop_path = jvm.org.apache.hadoop.fs.Path
    root = hadoop_path(path)
    fs = root.getFileSystem(conf)
    if not fs.exists(hadoop_path(path + "/_lsh_meta.json")):
        raise ValueError(
            f"{path} has no _lsh_meta.json sidecar — not a "
            "write_lsh_index artifact"
        )
    stream = fs.open(hadoop_path(path + "/_lsh_meta.json"))
    try:
        meta_raw = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()

    spark.catalog.refreshByPath(path)
    idx = spark.read.parquet(path)
    n_files_before = len(idx.inputFiles())
    rows_before = idx.count()
    if retain_condition is not None:
        idx = idx.filter(retain_condition)
    compacted = idx.dropDuplicates().repartition(target_files, "bucket")

    tmp = path + ".__compact__"
    if fs.exists(hadoop_path(tmp)):
        fs.delete(hadoop_path(tmp), True)
    compacted.write.mode("errorifexists").parquet(tmp)
    out = fs.create(hadoop_path(tmp + "/_lsh_meta.json"), True)
    try:
        out.write(meta_raw)
    finally:
        out.close()
    rows_after = spark.read.parquet(tmp).count()

    # Swap order keeps an index present at `path` except during two
    # metadata renames: live -> .__old__, tmp -> live, delete .__old__.
    # A failure between the renames leaves .__old__ as a trivially
    # restorable copy (rename it back) instead of an empty path.
    old = hadoop_path(path + ".__old__")
    if fs.exists(old):
        fs.delete(old, True)
    if not fs.rename(root, old):
        raise RuntimeError(
            f"compaction swap failed moving live index aside: "
            f"compacted index left at {tmp}"
        )
    if not fs.rename(hadoop_path(tmp), root):
        # restore the live index — and CHECK the restore: if it also
        # fails, `path` is empty and the original sits at .__old__;
        # claiming it was restored would send the operator to an
        # empty index instead of the recoverable copy.
        if fs.rename(old, root):
            raise RuntimeError(
                f"compaction swap failed: compacted index left at "
                f"{tmp}, original restored at {path}"
            )
        raise RuntimeError(
            f"compaction swap failed AND the restore rename failed: "
            f"{path} is empty, the original index is intact at "
            f"{path}.__old__ (rename it back to recover), compacted "
            f"copy at {tmp}"
        )
    fs.delete(old, True)
    spark.catalog.refreshByPath(path)
    n_files_after = len(spark.read.parquet(path).inputFiles())
    _ = json.loads(meta_raw.decode("utf-8"))  # sidecar stays parseable
    return {
        "path": path,
        "rows_before": rows_before,
        "rows_after": rows_after,
        "files_before": n_files_before,
        "files_after": n_files_after,
    }


def probe_lsh_index(
    new_docs: DataFrame,
    index: "DataFrame | str",
    max_bucket_size: int | None = None,
    **lsh_kwargs,
) -> DataFrame:
    """Near-dup candidates (new_id, indexed_id) between a new batch
    and a standing LSH index (a bucket DataFrame or a parquet path
    written by :func:`write_lsh_index`).

    Only the BATCH is shingled/hashed; the corpus side is one parquet
    scan + a bucket equi-join. ``max_bucket_size`` drops hot index
    buckets before the join (same guard, and same soundness argument,
    as lsh_candidate_pairs). Self-pairs (a doc probing an index that
    already contains it) are excluded.
    """
    if isinstance(index, str):
        spark = new_docs.sparkSession
        # the sidecar guards against probing an index built with a
        # different bucket space or key format (zero hits, no error)
        _check_lsh_meta(spark, index, **lsh_kwargs)
        # Spark's session-lifetime FileStatusCache serves stale
        # listings for a path read before an append; an appendable
        # index must be re-listed or newly-appended batches are
        # silently invisible to later probes.
        spark.catalog.refreshByPath(index)
        index = spark.read.parquet(index)
    if max_bucket_size is not None:
        sizes = index.groupBy("bucket").agg(F.count("*").alias("__bn"))
        keep = sizes.filter(F.col("__bn") <= max_bucket_size).select("bucket")
        index = index.join(keep, "bucket")
    probe = lsh_bucket_table(new_docs, **lsh_kwargs)
    return (
        probe.alias("p")
        .join(index.alias("i"), "bucket")
        .filter(F.col("p.doc_id") != F.col("i.doc_id"))
        .select(
            F.col("p.doc_id").alias("new_id"),
            F.col("i.doc_id").alias("indexed_id"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


def _pair_gate(id_a, id_b, fraction: float):
    """Deterministic salted-md5 pair gate: True for ~``fraction`` of
    (id_a, id_b) pairs, stable across runs/partitionings — the
    spot-audit sampler shared by the exact pair joins."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    id_a.cast("string"),
                    id_b.cast("string"),
                    F.lit("pair-audit"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    return h < F.lit(int(float(fraction) * (1 << 48)))


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df_fraction: float | None = None,
    pair_sample: float | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join.

    Inverted-index style: explode distinct shingles, self-join on the
    shingle (candidates must share >= 1), count the intersection in one
    aggregation, then Jaccard = inter / (|A| + |B| - inter).

    Only ids + counts shuffle after the index join.

    ``pair_sample`` turns the exact join into a SPOT-AUDIT: a
    deterministic salted-md5 gate keeps ~that fraction of candidate
    PAIRS, applied right after the index join and before the
    intersection aggregation (the expensive stage), so cost scales
    with the fraction. The kept pairs' scores are still exact and the
    sample is unbiased over pairs — dup-rate estimates from a 1%
    audit of a 100 TB corpus extrapolate directly, which is how the
    exact path stays useful where full O(pairs) output is not.

    ``max_df_fraction`` is the 100 TB hot-shingle guard: shingles
    appearing in more than that fraction of documents (boilerplate —
    headers, license blurbs) are dropped from the index BEFORE the
    self-join, capping every inverted-list at df_max and the join work
    at n * df_max instead of the quadratic blow-up one ubiquitous
    shingle causes. Sizes are recomputed AFTER the cut, so the score
    is exact Jaccard over the filtered (discriminative) shingle space
    — document that shift when enabling it; docs whose entire shingle
    set is boilerplate drop out of the index (no candidates), the
    same way stopword-only docs vanish from keyword search.
    """
    tokens = (
        shingle_rows(df, text_col, id_col, shingle_n)
        .filter(F.col("shingle").isNotNull())
        .distinct()
    )
    if max_df_fraction is not None:
        n_docs = df.count()  # one scalar job; the threshold is a literal
        dfreq = tokens.groupBy("shingle").agg(F.count("*").alias("__df"))
        keep = dfreq.filter(
            F.col("__df") <= F.lit(float(max_df_fraction) * n_docs)
        ).select("shingle")
        tokens = tokens.join(keep, "shingle")
    sizes = tokens.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = tokens.alias("a")
    b = tokens.alias("b")
    joined = a.join(
        b,
        (F.col("a.shingle") == F.col("b.shingle"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    if pair_sample is not None:
        joined = joined.filter(
            _pair_gate(F.col("a.doc_id"), F.col("b.doc_id"), pair_sample)
        )
    inter = (
        joined
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_shingles").alias("nb"))
    jacc = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", jacc)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "na", "nb")
    )


def ngram_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 8,
    corpus_words_col: str | None = None,
    eval_words_col: str | None = None,
) -> DataFrame:
    """Training/eval decontamination: corpus documents sharing at least
    one word ``shingle_n``-gram with the eval set (the standard exact
    n-gram collision test run before training-data admission).

    Shape: the eval side collapses to a distinct shingle set — tiny
    relative to the corpus (eval suites are thousands of docs) — and
    broadcasts. The corpus side streams through the broadcast join
    with NO shuffle: the per-doc distinct (a doc repeating a shared
    8-gram must count it once) runs AFTER the join, over only the
    surviving contaminated (doc, shingle) rows, which the broadcast
    filter has already cut to a sliver of the corpus. Distinct-then-
    join and join-then-distinct are equivalent here because the join
    key is a column of the distinct key. Output: (doc_id, n_shared)
    for every contaminated corpus doc; dropping them is a left-anti
    join on this result.
    """
    c = shingle_rows(
        corpus, text_col, id_col, shingle_n, words_col=corpus_words_col
    ).filter(F.col("shingle").isNotNull())
    e = (
        shingle_rows(
            eval_df, text_col, id_col, shingle_n, words_col=eval_words_col
        )
        .filter(F.col("shingle").isNotNull())
        .select("shingle")
        .distinct()
    )
    return (
        c.join(F.broadcast(e), "shingle")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def md5_hash60(col):
    """Portable 60-bit token hash: the first 15 hex chars of md5,
    parsed as an integer. Identical in DuckDB
    (``CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)``), which is what
    makes the SimHash pipeline oracle-checkable; 60 bits keeps the
    value positive in a signed int64 on both engines."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn=F.xxhash64,
    bits: int = 64,
) -> DataFrame:
    """(id, simhash) — 64-bit xxhash64-based SimHash per document.

    Aggregate formulation (same lesson as minhash_signatures): explode
    words, xxhash64 each ONCE (codegen), then 64 per-bit majority
    sums as grouped aggregates with map-side combine — vs the per-row
    HOF fold which interprets 64 zip_with lambdas per token. Produces
    bit-identical signatures to hashing.simhash64 (same per-token
    indicators, same >= n/2 majority rule).

    NULL text is canonically treated as '' (coalesced here, same rule
    as ``shingle_rows``): both forms then see the single-''-token
    array, so signatures agree for null-text docs too.

    ``hash_fn``/``bits`` select the token hash: the default
    ``xxhash64``/64 is the fast JVM production path; pass
    ``md5_hash60``/60 for the engine-portable variant the DuckDB
    oracle can recompute.
    """
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(
            hashing.word_tokens(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("w"),
    ).withColumn("h", hash_fn(F.col("w")))
    bit_sums = [
        F.sum(F.shiftright("h", i).bitwiseAND(F.lit(1))).alias(f"__b{i}")
        for i in range(bits)
    ]
    counts = words.groupBy("doc_id").agg(
        F.count("w").alias("__n"), *bit_sums
    )
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig.bitwiseOR(
            F.when(
                F.col(f"__b{i}") * 2 >= F.col("__n"),
                F.shiftleft(F.lit(1).cast("long"), i),
            ).otherwise(F.lit(0).cast("long"))
        )
    return counts.select("doc_id", sig.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    prefix_bits: int = 16,
    rotations: int = 4,
    hash_fn=F.xxhash64,
    bits: int = 64,
    max_block_size: int | None = None,
    pair_sample: float | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: the standard rotate-and-block scheme.

    ``pair_sample``: deterministic spot-audit gate over candidate
    pairs, applied before the cross-rotation distinct and the popcount
    verify — same contract as ``jaccard_pairs(pair_sample=...)``:
    kept pairs score exactly, the sample is unbiased and stable.

    Each signature is bit-rotated ``rotations`` ways (evenly spaced
    steps); candidates are pairs agreeing on the top ``prefix_bits``
    of ANY rotation, verified by Hamming distance. A single prefix
    table misses near-dups whose differing bits fall inside the
    prefix; unioning rotations restores recall (asserted >= 0.8 on
    planted near-dups in tests/test_similarity_recall.py) while each
    rotation's block join stays a hash equi-join — work is
    sum(block^2) per rotation, never all-pairs.

    Candidate pairs are deduplicated across rotations BEFORE the
    popcount verify, so each pair is scored once.

    The signature table is localCheckpointed (same rationale as
    ``lsh_candidate_pairs``): the rotation union references it
    ``rotations`` times and the self-join twice more — without
    materialization the whole tokenize->hash->64-aggregate pipeline
    would recompute 2x``rotations`` times.

    ``max_block_size`` is the hot-block guard (same contract as
    ``lsh_candidate_pairs(max_bucket_size)``): (rot, block) groups
    holding more than that many docs are dropped BEFORE the self-join.
    A block of b docs costs b² pair rows per rotation; a corpus with
    large exact-duplicate families (every copy shares ALL rotations'
    blocks) or a boilerplate-dominant prefix goes quadratic without
    it. Dropping is recall-sound the same way: families that large
    belong to exact dedup, which precedes near-dup in the pipeline.
    """
    sigs = common.materialize(
        simhash_signatures(df, text_col, id_col, hash_fn=hash_fn, bits=bits)
    )
    if bits < 64:
        mask = F.lit((1 << bits) - 1).cast("long")
    step = bits // rotations
    rot_tables = []
    for r in range(rotations):
        s = r * step
        if s == 0:
            rotated = F.col("simhash")
        else:
            rotated = F.shiftleft("simhash", s).bitwiseOR(
                F.shiftrightunsigned("simhash", bits - s)
            )
            if bits < 64:
                rotated = rotated.bitwiseAND(mask)
        rot_tables.append(
            sigs.select(
                "doc_id",
                "simhash",
                F.lit(r).alias("rot"),
                F.shiftrightunsigned(rotated, bits - prefix_bits).alias("block"),
            )
        )
    blocks = rot_tables[0]
    for t in rot_tables[1:]:
        blocks = blocks.unionByName(t)
    if max_block_size is not None:
        sizes = blocks.groupBy("rot", "block").agg(F.count("*").alias("__bn"))
        keep = sizes.filter(F.col("__bn") <= max_block_size).select("rot", "block")
        blocks = blocks.join(keep, ["rot", "block"])
    a = blocks.alias("a")
    b = blocks.alias("b")
    joined = a.join(
        b,
        (F.col("a.rot") == F.col("b.rot"))
        & (F.col("a.block") == F.col("b.block"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    if pair_sample is not None:
        # gate is a pure function of the pair, so every rotation keeps
        # or drops the same pair and the distinct below stays correct
        joined = joined.filter(
            _pair_gate(F.col("a.doc_id"), F.col("b.doc_id"), pair_sample)
        )
    cand = (
        joined
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("__sa"),
            F.col("b.simhash").alias("__sb"),
        )
        .distinct()
    )
    return (
        cand.select(
            "id_a",
            "id_b",
            hashing.hamming64(F.col("__sa"), F.col("__sb")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Connected components: candidate pairs -> dedup clusters
# ---------------------------------------------------------------------------


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 20,
    on_nonconverged: str = "raise",
) -> DataFrame:
    """Label every node with the MIN node id of its connected component
    — the step that turns near-dup candidate pairs into dedup groups
    (keep min-id per component, drop the rest).

    Iterative min-label propagation: each round every node adopts the
    smallest label among itself and its neighbors; converged when no
    label changes. Rounds needed = graph diameter (dup clusters are
    near-cliques from band collisions, so 2-4 in practice, vs O(n) for
    path graphs — ``max_iterations`` guards the pathological case).

    Scale notes: each round is one join edges x labels + one min-agg —
    both shuffles on node id, no driver-side state but the convergence
    counter. ``localCheckpoint`` cuts the lineage each round so the
    plan does not grow with iterations (the classic iterative-Spark
    trap). This is GraphX/GraphFrames' algorithm expressed in plain
    DataFrame ops, keeping the engine dependency-free.

    If labels are still changing when ``max_iterations`` is exhausted
    (possible for path-shaped chains longer than the round budget),
    the labeling is PARTIAL — ``on_nonconverged`` controls the signal:
    ``"raise"`` (default, loud) or ``"warn"`` (log and return the
    partial labels). Never silent.
    """
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("component")
    )
    changed = 0
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)  # cut lineage growth per round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        msg = (
            f"connected_components did not converge within "
            f"{max_iterations} iterations; component labels are only "
            f"partially propagated"
        )
        if on_nonconverged == "warn":
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        else:
            raise RuntimeError(msg)
    return labels


def _star_neighborhood_min(df: DataFrame) -> DataFrame:
    """Attach ``m = min(N(u) ∪ {u})`` to every ``(u, v)`` edge row.

    Deliberately groupBy-min + join, NOT ``min().over(partitionBy(u))``:
    the groupBy gets map-side partial aggregation (a hub key costs one
    row per map task) and the join back is AQE-skew-split eligible,
    whereas a window pins every row of a hot key into one task — and
    star contraction funnels a component's whole edge set onto its
    min-center, so the hot key is guaranteed at scale.
    ``tests/test_advanced.py`` pins this plan shape (partial_min
    present, no WindowExec) against regression.
    """
    mins = df.groupBy("u").agg(F.min("v").alias("_mn"))
    return (
        df.join(mins, "u")
        .withColumn("m", F.least(F.col("_mn"), F.col("u")))
        .drop("_mn")
    )


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_rounds: int = 30,
    on_nonconverged: str = "raise",
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    edge rewrites (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC'14 — a public algorithm) — O(log n) rounds
    instead of :func:`connected_components`' O(diameter).

    Why both exist: min-label propagation needs diameter rounds, which
    is 2-4 for the near-clique dup groups LSH banding produces but
    O(n) for chain-shaped graphs — and real corpora DO produce chains
    (URL redirect chains, quote-of-a-quote-of-a-quote near-dup
    threads). The star alternation contracts any component toward its
    minimum in logarithmically many rounds:

    - **large-star**: every node connects its strictly-LARGER
      neighbors to the minimum of its neighborhood (incl. itself);
    - **small-star**: every node connects its smaller-or-equal
      neighbors (and itself) to that minimum.

    Both steps preserve connectivity (each replaces edges within one
    star by edges within the same component) and strictly shrink the
    potential; the fixed point is a forest of stars centered at each
    component's min node, read off directly as the labeling.

    Per round, each star phase computes the per-center neighborhood
    minimum with ``groupBy(center).agg(min)`` — which Spark executes
    with MAP-SIDE partial aggregation, so a hub key costs one row per
    map task, not one giant reduce partition — and joins it back onto
    the edge rows. The join is the only place a hot center key
    concentrates rows, and a shuffled join IS what AQE's skew-join
    splitting can cut apart at runtime; a ``min().over(partitionBy)``
    window (the briefly-tried alternative) has neither partial
    aggregation nor skew splitting, and star contraction *by design*
    funnels a component's whole edge set onto its min-center, so the
    window form turns a billion-node component into one billion-row
    task at scale. The two small-star row kinds (leaf→center and
    center→center) are emitted from ONE pass via ``explode`` instead
    of re-reading the output through a union, and the round-final
    ``distinct`` canonicalizes. ``localCheckpoint`` cuts lineage so
    the plan stays round-independent.

    Convergence detection is O(1) per round: the same action that
    materializes the round output computes ``(edge count,
    bit_xor(xxhash64(u, v)))``. XOR is commutative, associative, and
    cannot overflow — unlike a ``sum`` of uniform 64-bit hashes,
    which walks past ``LongType`` almost immediately and THROWS under
    an ANSI-default session (Spark 4's default; the driver gate runs
    one). XOR self-cancels duplicate rows, but both compared sets are
    ``distinct``, so multiset equality is set equality and the
    fingerprint is sound. A matching fingerprint triggers ONE exact
    symmetric-difference probe to CONFIRM the fixed point (so
    correctness never rests on the hash — a collision merely costs an
    extra round). This replaces two exceptAll shuffles per round with
    a near-free aggregate over already-checkpointed partitions.

    Non-convergence within ``max_rounds`` (default 30 covers any
    graph to ~2^25 nodes with slack) raises or warns per
    ``on_nonconverged`` — same loud contract as the min-label form.
    """
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        # LAZY checkpoint: the fingerprint action right below both
        # materializes the checkpoint and computes the aggregate in
        # ONE job — an eager checkpoint would pay a second full pass
        # (and a second job scheduling round trip) per round
        .localCheckpoint(eager=False)
    )

    def _fingerprint(df: DataFrame) -> tuple:
        # bit_xor never overflows; sum(xxhash64) throws under ANSI.
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).first()
        return (row["n"], row["h"])

    fp = _fingerprint(e)
    converged = False
    for _ in range(max_rounds):
        # large-star: m(u) carried onto every symmetric edge row, then
        # each strictly-larger neighbor v is rewired to m. m ≤ u < v,
        # so no self-loop filter is needed on the output.
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        large = (
            _star_neighborhood_min(sym)
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # Every large-star edge already points larger→smaller
        # (u = old v > old u ≥ m = new v), so small-star needs no
        # greatest/least re-orientation: per-center min gives m2 =
        # min of its smaller neighborhood, and one explode emits
        # BOTH row kinds — (leaf y → m2) and (center x → m2) — without
        # re-reading the aggregate output. The center row repeats per
        # edge; the round-final distinct canonicalizes it anyway.
        small = (
            _star_neighborhood_min(large)
            .withColumnRenamed("m", "m2")
            .select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("v").alias("u"), F.col("m2").alias("v")
                        ),
                        F.struct(
                            F.col("u").alias("u"), F.col("m2").alias("v")
                        ),
                    )
                ).alias("edge")
            )
            .select("edge.u", "edge.v")
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)  # materialized by the fingerprint
        )
        new_fp = _fingerprint(small)
        if new_fp == fp:
            # fingerprint says fixed point — confirm EXACTLY, once
            changed = (
                small.exceptAll(e)
                .limit(1)
                .union(e.exceptAll(small).limit(1))
                .count()
            )
            if changed == 0:
                e = small
                converged = True
                break
        # hash collision (fingerprint matched, sets differ) just means
        # one more round — correctness never rests on the hash
        e, fp = small, new_fp
    if not converged:
        msg = (
            f"connected_components_star did not converge within "
            f"{max_rounds} rounds; edge set still changing"
        )
        if on_nonconverged == "warn":
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        else:
            raise RuntimeError(msg)
    # fixed point is (node, center) star edges with center < node;
    # centers + isolated nodes label themselves
    return (
        nodes.select(F.col(node_col).alias("node"))
        .join(e.withColumnRenamed("u", "node"), "node", "left")
        .select(
            "node",
            F.coalesce(F.col("v"), F.col("node")).alias("component"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def canonical_per_component(
    components: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    comp_col: str = "component",
    score_col: str = "score",
    max_component_size: int | None = None,
    on_oversize: str = "error",
) -> DataFrame:
    """CANONICAL-DOCUMENT SELECTION: within each near-dup component,
    keep the best member — the standard last step of a fuzzy-dedup
    pipeline (cluster via LSH + connected components, then retain one
    canonical representative instead of dropping all-but-lowest-id).
    ``components`` is (id, component) from
    :func:`connected_components`/``_star``; ``scores`` is (id, score)
    with HIGHER better — callers pick the policy (char length for
    keep-longest, a quality logit, recency). Ties break on lowest id
    so selection is deterministic.

    Output: one row per input id — (id, component, canonical_id,
    is_canonical). Downstream keeps ``is_canonical = 1`` rows, or
    joins ``canonical_id`` to rewrite references.

    Scale shape: one equi-join on id, one window + one equi-join on
    component — all key-partitioned shuffles, no driver state. A
    pathological giant component makes a hot window partition; the
    upstream candidate-generation guards (``max_bucket_size``,
    ``max_block_size``) bound component size the same way they bound
    pair volume, and AQE skew-split covers the join.

    ``max_component_size`` makes that envelope LOCAL instead of
    inherited: component sizes are counted over the SAME window
    partitioning the rank already shuffles on (zero extra shuffle),
    and an over-cap component either fails the job loudly at
    execution time (``on_oversize='error'`` — the guard rides the
    canonical-id expression via ``assert_true`` so Catalyst cannot
    prune it) or degrades conservatively (``on_oversize='flag'``:
    every member of the over-cap component stays its own canonical —
    nothing merged, nothing lost — and an ``is_oversize`` column
    marks the rows for downstream triage)."""
    if on_oversize not in ("error", "flag"):
        raise ValueError(
            f"on_oversize must be 'error' or 'flag', got {on_oversize!r}"
        )
    joined = components.join(scores, id_col)
    if max_component_size is not None:
        joined = joined.withColumn(
            "__csize", F.count(F.lit(1)).over(Window.partitionBy(comp_col))
        )
    w = Window.partitionBy(comp_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    canon_id = F.col(id_col)
    if max_component_size is not None and on_oversize == "error":
        # assert_true returns NULL when the predicate holds and raises
        # at execution when it does not; riding the canonical-id
        # expression keeps it in the live data path of every component.
        guard = F.assert_true(
            F.col("__csize") <= max_component_size,
            F.concat(
                F.lit("canonical_per_component: component "),
                F.col(comp_col).cast("string"),
                F.lit(
                    f" has more than max_component_size="
                    f"{max_component_size} members — a giant near-dup"
                    " cluster makes a hot window partition; tighten the"
                    " upstream candidate guards (max_bucket_size/"
                    "max_block_size), raise the cap, or pass "
                    "on_oversize='flag' to skip merging it."
                ),
            ),
        )
        canon_id = F.when(guard.isNull(), F.col(id_col))
    canon = (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(comp_col), canon_id.alias("canonical_id"))
    )
    out = joined.join(canon, comp_col)
    if max_component_size is not None and on_oversize == "flag":
        oversize = F.col("__csize") > max_component_size
        out = (
            out.withColumn(
                "canonical_id",
                F.when(oversize, F.col(id_col)).otherwise(
                    F.col("canonical_id")
                ),
            )
            .withColumn("is_oversize", oversize.cast("int"))
        )
    if max_component_size is not None:
        out = out.drop("__csize")
    return out.withColumn(
        "is_canonical",
        (F.col(id_col) == F.col("canonical_id")).cast("int"),
    )


def embedding_near_dups(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Near-dup pairs by embedding dot product (== cosine for
    unit-norm vectors) above a threshold — per-pair Column-expression
    form. The oracle-checkable reference; ``embedding_near_dups_blocked``
    is the production path (identical results, vectorized kernel).
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sim", dot(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b")
    )


def embedding_near_dups_blocked(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs near-dup verify, **block-nested-loop** form.

    Vectors are hashed into ``n_blocks`` blocks; every block PAIR
    (bi <= bj) is scored by one Arrow-batched kernel that computes the
    full block-cross similarity matrix dimension-by-dimension
    (``acc += outer(A[:, i], B[:, i])`` — the same left-to-right
    float64 fold as the Column-expression ``dot``, so results are
    bit-identical and the DuckDB oracle still matches).

    Why this is the scale design: each vector is shuffled/Arrow-shipped
    once per block pair — O(n * n_blocks) transfer — instead of once
    per PAIR (O(n^2)) as in the join form; the O(n^2) arithmetic runs
    as fused numpy loops, not interpreted expressions. 23.7s -> ~3s on
    2k x 64 at sf0.1. Block size bounds executor memory
    (block^2 * 8 bytes for the sim matrix).
    """
    import pandas as pd  # noqa: F401

    blocks = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("block"),
    )
    packed = blocks.groupBy("block").agg(
        F.collect_list(F.struct("vid", "vec")).alias("rows")
    )
    a = packed.select(F.col("block").alias("ba"), F.col("rows").alias("ra"))
    b = packed.select(F.col("block").alias("bb"), F.col("rows").alias("rb"))
    crossed = a.join(b, F.col("ba") <= F.col("bb"))

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_a, out_b = [], []
            for _, row in pdf.iterrows():
                ids_a = np.array([r["vid"] for r in row["ra"]])
                A = np.stack([r["vec"] for r in row["ra"]]).astype("float64")
                ids_b = np.array([r["vid"] for r in row["rb"]])
                B = np.stack([r["vec"] for r in row["rb"]]).astype("float64")
                acc = np.zeros((len(ids_a), len(ids_b)))
                for i in range(A.shape[1]):  # fold order matches dot()
                    acc += np.outer(A[:, i], B[:, i])
                ia, ib = np.nonzero(acc >= threshold)
                pa, pb = ids_a[ia], ids_b[ib]
                if row["ba"] == row["bb"]:
                    keep = pa < pb  # diagonal block: each pair seen twice
                    pa, pb = pa[keep], pb[keep]
                else:
                    # off-diagonal: pair seen once; orient ids as (min, max)
                    pa, pb = np.minimum(pa, pb), np.maximum(pa, pb)
                out_a.extend(pa)
                out_b.extend(pb)
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b})

    return crossed.mapInPandas(kernel, schema="id_a long, id_b long")


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.3,
    dim: int = 64,
    num_planes: int = 6,
    seed: str = "semdedup-42",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic dedup accounting over an embedding column.

    Buckets the corpus by deterministic random-hyperplane sign bits
    (``similarity.rp_lsh_buckets`` — literal +-1 planes, no fitted
    state), then inside each bucket drops every vector that has a
    SMALLER-id neighbor with cosine >= ``threshold`` (unit vectors, so
    dot == cosine). Keep-lowest-id is the deterministic stand-in for
    SemDeDup's keep-one-per-semantic-cluster rule.

    Returns per-bucket accounting ``(bucket, n_vecs, n_dropped)``.

    Scale: ONE equi-join on the bucket key — work is sum(bucket^2),
    never all-pairs; the exact all-pairs ground truth is
    ``embedding_near_dups_blocked``. ``max_bucket_size`` is the same
    hot-bucket guard as the LSH/Jaccard/SimHash families: a degenerate
    embedding space (many near-identical vectors) concentrates mass in
    one bucket and only that bucket goes quadratic — the guard drops
    oversize buckets from the pair join (their vectors stay counted in
    ``n_vecs``). The bucket assignment is 6 codegen dot products per
    row (no shuffle), so re-evaluating it per join side is cheaper
    than a materialization barrier.
    """
    from etl_property_rumah123_spark.operators.similarity import rp_lsh_buckets

    b = rp_lsh_buckets(
        df.select(id_col, vec_col), dim=dim, num_planes=num_planes, seed=seed
    )
    counts = b.groupBy("bucket").agg(F.count("*").alias("n_vecs"))
    joinable = b
    if max_bucket_size is not None:
        ok = counts.filter(F.col("n_vecs") <= max_bucket_size).select("bucket")
        joinable = b.join(F.broadcast(ok), "bucket")
    a = joinable.select(
        F.col("bucket"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    c = joinable.select(
        F.col("bucket"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    dropped = (
        a.join(c, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(dot(F.col("va"), F.col("vb")) >= threshold)
        .groupBy("bucket")
        .agg(F.count_distinct("id_b").alias("n_dropped"))
    )
    return (
        counts.join(dropped, "bucket", "left")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.coalesce(F.col("n_dropped"), F.lit(0)).cast("long").alias("n_dropped"),
        )
    )


def repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_n: int = 16,
    words_col: str | None = None,
) -> DataFrame:
    """Cross-document repeated token-window detection — the span-level
    exact-substring dedup primitive (a verbatim passage shared by two
    docs shows up as a run of shared ``span_n``-token windows, even
    when the docs as wholes are dissimilar and every doc-level
    detector above stays silent).

    A window position counts as repeated when its exact ``span_n``-gram
    occurs in >= 2 DISTINCT documents; within-doc repetition alone is
    the repetition-score family's job, not this one's. Output: one row
    per input doc, ``(doc_id, n_windows, n_repeated)`` — callers cut
    on ``n_repeated / n_windows`` to drop or trim memorization-risk
    docs.

    Scale shape: windows come from the codegen'd ``shingle_rows`` and
    are md5'd BEFORE any shuffle, so every exchange carries 32-char
    digests, never 16-word strings. One aggregate finds the repeated
    span set (map-side combine on the digest), one hash join marks the
    positions, one final groupBy on doc_id folds the accounting —
    nothing is ever all-pairs, and a pathological span shared by p% of
    docs costs p% linear join output, not a quadratic bucket.
    """
    s = shingle_rows(df, text_col, id_col, span_n, words_col=words_col)
    pos = s.select(
        "doc_id",
        F.when(F.col("shingle").isNotNull(), F.md5("shingle")).alias("h"),
    )
    rep = (
        pos.filter(F.col("h").isNotNull())
        .groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h", F.lit(1).alias("__rep"))
    )
    return (
        pos.join(rep, "h", "left")  # null h (marker rows) never matches
        .groupBy("doc_id")
        .agg(
            F.count("h").cast("long").alias("n_windows"),
            F.coalesce(F.sum("__rep"), F.lit(0)).cast("long").alias("n_repeated"),
        )
    )


def strike_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_n: int = 8,
    words_col: str | None = None,
) -> DataFrame:
    """The REMOVAL half of span-level exact-substring dedup (the
    transform of Lee et al.'s dedup study, where
    :func:`repeated_spans` is the detector): count, per document, the
    token positions covered by at least one cross-document repeated
    ``span_n``-token window — the tokens a span-striking pass would
    delete — and the retained remainder.

    A token at position i is covered iff ANY window starting in
    ``[i - span_n + 1, i]`` is repeated (occurs in >= 2 distinct
    docs); overlapping repeated windows merge naturally because
    coverage is a distinct-position count, not a per-window sum.
    Output: one row per input doc,
    ``(doc_id, n_tokens, n_covered, n_retained)``.

    Scale shape: positional windows come from the same shuffle-free
    arrays_zip construction as :func:`shingle_rows` (posexplode of the
    zip — the position IS the window start, no window function, no
    sort) and are md5'd before any exchange. The repeated-span set is
    one digest aggregate with map-side combine; only windows that JOIN
    that set pay the x``span_n`` coverage explode, so the coverage
    shuffle carries span_n x (repeated windows) rows — zero for a
    clean corpus — never span_n x (all windows). Per-doc token counts
    ride a second scan-stage projection (narrow, no shuffle) rather
    than dragging every window row through a groupBy just to recover
    a per-doc constant.
    """
    if words_col is not None:
        toks = F.col(words_col)
    else:
        toks = hashing.word_tokens(F.coalesce(F.col(text_col), F.lit("")))
    n_sh = F.greatest(F.size(toks) - (span_n - 1), F.lit(0))
    slices = [
        F.slice(toks, j + 1, n_sh).alias(f"s{j}") for j in range(span_n)
    ]
    rows = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.arrays_zip(*slices)).alias("pos", "__z"),
    )
    parts = [F.col("__z").getField(f"s{j}") for j in range(span_n)]
    win = rows.select(
        "doc_id",
        "pos",
        F.md5(F.concat_ws(" ", *parts)).alias("h"),
    )
    rep = (
        win.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("h")
    )
    cov = (
        win.join(rep, "h")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(span_n - 1))
            ).alias("cp"),
        )
        .groupBy("doc_id")
        .agg(F.count_distinct("cp").alias("__ncov"))
    )
    counts = df.select(
        F.col(id_col).alias("doc_id"), F.size(toks).cast("long").alias("n_tokens")
    )
    return counts.join(cov, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("__ncov"), F.lit(0)).cast("long").alias("n_covered"),
        (F.col("n_tokens") - F.coalesce(F.col("__ncov"), F.lit(0)))
        .cast("long")
        .alias("n_retained"),
    )
