"""Oracle-checked queries for the LLM-data-pipeline operators: dedup,
similarity search, text analysis, multimodal plumbing, event streams.

Parity notes:
- all hash-dependent ops use md5 (identical hex in Spark and DuckDB);
  the xxhash64-based SimHash and RP-LSH ANN register with oracle=None
  (rows-only check) since DuckDB has no xxhash64.
- dot products fold left-to-right in both engines (F.aggregate vs
  list_reduce), giving bit-identical doubles — thresholds and rankings
  then agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_property_rumah123_spark.functions import hashing, xxh64_sql
from etl_property_rumah123_spark.functions.vector import l2_norm
from etl_property_rumah123_spark.operators import (
    common,
    dedup,
    sampling,
    similarity,
    text_analysis,
)
from etl_property_rumah123_spark.plans import part, register
from etl_property_rumah123_spark.sources.catalog import table

# DuckDB fold-left dot product fragment (bit-identical to F.aggregate)
_DUCK_DOT = (
    "list_reduce([CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) "
    "FOR p IN list_zip({a}, {b})], (x, y) -> x + y)"
)

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS digest,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    doc="Exact dedup via content-digest groupBy: shuffle carries "
    "(digest, id), never document bodies.",
    headline=True,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(table(spark, sf_dir, "documents"))


@register(
    "dedup_minhash_lsh",
    xxh64_sql.minhash_lsh_xxhash64_oracle(shingle_n=3, num_hashes=16, bands=4),
    doc="MinHash(16 xxhash64-derived hashes over 3-word shingles) + "
    "LSH(4 bands x 4 rows) candidate pairs — the PRODUCTION fast "
    "family as the oracled headline (round-4 upgrade: the md5 pin is "
    "gone; functions/xxh64_sql.py expands Spark's XXH64 into DuckDB "
    "SQL so the oracle recomputes every signature and band key "
    "bit-for-bit). Bucket self-join: work ~ sum(bucket^2), not n^2.",
    headline=True,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.lsh_candidate_pairs(
        table(spark, sf_dir, "documents"),
        shingle_n=3,
        num_hashes=16,
        bands=4,
        hash_family="xxhash64",
    )


@part(
    "minhash_lsh_md5",
    """
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN [array_to_string(w[i:i+2], ' ') FOR i IN generate_series(1, len(w) - 2)]
                  ELSE [] END AS sh
      FROM w
    ), sig AS (
      SELECT doc_id,
             [list_min([md5(CAST(k AS VARCHAR) || '|' || s) FOR s IN sh])
              FOR k IN generate_series(0, 15)] AS sig
      FROM sh
    ), bands AS (
      SELECT doc_id, b,
             CAST(b AS VARCHAR) || ':' || md5(array_to_string(sig[b*4+1:b*4+4], '')) AS bucket
      FROM sig, (SELECT unnest(generate_series(0, 3)) AS b)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
    """,
    doc="The legacy md5 MinHash family (round 1-3 headline), kept "
    "oracled as a corpus-suite part so both hash families stay "
    "driver-checked.",
)
def minhash_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.lsh_candidate_pairs(
        table(spark, sf_dir, "documents"),
        shingle_n=3,
        num_hashes=16,
        bands=4,
        hash_family="md5",
    )


@register(
    "dedup_ngram_jaccard",
    """
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(w) >= 3
                  THEN [array_to_string(w[i:i+2], ' ') FOR i IN generate_series(1, len(w) - 2)]
                  ELSE [] END) AS sh
      FROM w
    ), ex AS (
      SELECT doc_id, unnest(sh) AS s FROM sh
    ), sizes AS (
      SELECT doc_id, CAST(len(sh) AS BIGINT) AS n FROM sh
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.id_a AS id_a, i.id_b AS id_b, i.inter AS inter,
           sa.n AS na, sb.n AS nb
    FROM inter i JOIN sizes sa ON i.id_a = sa.doc_id
                 JOIN sizes sb ON i.id_b = sb.doc_id
    WHERE i.inter / (sa.n + sb.n - i.inter) >= 0.02
    """,
    doc="Exact 3-gram Jaccard similarity join via inverted shingle "
    "index; threshold picked to emit a non-trivial pair set on the "
    "synthetic corpus.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.jaccard_pairs(
        table(spark, sf_dir, "documents"), shingle_n=3, threshold=0.02
    )


@register(
    "dedup_simhash",
    """
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(COALESCE(text, '')), '\\s+') AS w
      FROM documents
    ), h AS (
      SELECT doc_id,
             [CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT) FOR x IN w] AS hs
      FROM w
    ), sig AS (
      SELECT doc_id,
             list_reduce(
               [CASE WHEN 2 * list_sum([(h >> i) & 1 FOR h IN hs]) >= len(hs)
                     THEN (CAST(1 AS BIGINT) << i) ELSE 0 END
                FOR i IN generate_series(0, 59)],
               (a, b) -> a | b) AS sig
      FROM h
    ), blocks AS (
      -- 60-bit rotate-left by r*15 without BIGINT overflow: shift only
      -- the low (60 - r*15) bits left, OR the high bits shifted down
      SELECT doc_id, sig, r,
             (((sig & ((CAST(1 AS BIGINT) << (60 - r * 15)) - 1)) << (r * 15))
              | (sig >> (60 - r * 15))) >> 48 AS block
      FROM sig, (SELECT unnest(generate_series(0, 3)) AS r)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                      a.sig AS sa, b.sig AS sb
      FROM blocks a JOIN blocks b
        ON a.r = b.r AND a.block = b.block AND a.doc_id < b.doc_id
    )
    SELECT id_a AS id_a, id_b AS id_b,
           CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 24
    """,
    doc="SimHash near-dup pairs, oracle-checked end-to-end: 60-bit "
    "portable signature (md5-derived token hash — identical in "
    "DuckDB), 4-rotation blocking on 12-bit prefixes (block width must "
    "grow with corpus size — candidate work is >= n^2/2^prefix_bits "
    "regardless of content, so 8 bits stopped being scale-safe at "
    "synthetic sf1), Hamming verify. "
    "The xxhash64/64-bit fast path is the same code with the default "
    "hash (operators/dedup.py:simhash_near_dups), pinned equivalent "
    "in structure; recall of the rotation scheme is asserted on "
    "planted near-dups in tests/test_similarity_recall.py.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = dedup.simhash_near_dups(
        table(spark, sf_dir, "documents"),
        max_hamming=24,
        prefix_bits=12,
        rotations=4,
        hash_fn=dedup.md5_hash60,
        bits=60,
    )
    return out.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


@register(
    "dedup_embedding_cosine",
    f"""
    WITH a AS (SELECT vec_id AS id_a, embedding AS va FROM embeddings),
         b AS (SELECT vec_id AS id_b, embedding AS vb FROM embeddings)
    SELECT id_a, id_b
    FROM a JOIN b ON id_a < id_b
    WHERE {_DUCK_DOT.format(a='va', b='vb')} >= 0.3
    """,
    doc="Embedding near-dup pairs: exact pairwise dot (== cosine, unit "
    "vectors) >= 0.3. The quadratic ground-truth path; ann_topk_lsh is "
    "the scale path.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.embedding_near_dups_blocked(
        table(spark, sf_dir, "embeddings"), threshold=0.3
    )


@register(
    "dedup_incremental",
    """
    WITH RECURSIVE hist AS (
      SELECT * FROM documents WHERE doc_id % 4 <> 0
    ), batch AS (
      SELECT * FROM documents WHERE doc_id % 4 = 0
    ), exact_hits AS (
      SELECT b.doc_id FROM batch b
      JOIN (SELECT DISTINCT md5(text) AS d FROM hist) h ON md5(b.text) = h.d
    ), bsh AS (
      SELECT doc_id, CASE WHEN len(w) >= 3
                  THEN [array_to_string(w[i:i+2], ' ') FOR i IN generate_series(1, len(w) - 2)]
                  ELSE [] END AS sh
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM batch)
    ), hsh AS (
      SELECT doc_id, CASE WHEN len(w) >= 3
                  THEN [array_to_string(w[i:i+2], ' ') FOR i IN generate_series(1, len(w) - 2)]
                  ELSE [] END AS sh
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM hist)
    ), bsig AS (
      SELECT doc_id, [list_min([md5(CAST(k AS VARCHAR) || '|' || s) FOR s IN sh])
                      FOR k IN generate_series(0, 15)] AS sig FROM bsh
    ), hsig AS (
      SELECT doc_id, [list_min([md5(CAST(k AS VARCHAR) || '|' || s) FOR s IN sh])
                      FOR k IN generate_series(0, 15)] AS sig FROM hsh
    ), bband AS (
      SELECT doc_id, CAST(b AS VARCHAR) || ':' || md5(array_to_string(sig[b*4+1:b*4+4], '')) AS bucket
      FROM bsig, (SELECT unnest(generate_series(0, 3)) AS b)
    ), hband AS (
      SELECT doc_id, CAST(b AS VARCHAR) || ':' || md5(array_to_string(sig[b*4+1:b*4+4], '')) AS bucket
      FROM hsig, (SELECT unnest(generate_series(0, 3)) AS b)
    ), near_hits AS (
      SELECT DISTINCT b.doc_id FROM bband b JOIN hband h ON b.bucket = h.bucket
    )
    SELECT doc_id AS doc_id,
           CAST(MAX(is_exact) AS INT) AS exact_dup,
           CAST(MAX(is_near) AS INT) AS near_dup
    FROM (
      SELECT doc_id, 1 AS is_exact, 0 AS is_near FROM exact_hits
      UNION ALL
      SELECT doc_id, 0, 1 FROM near_hits
    ) GROUP BY doc_id
    """,
    doc="Incremental dedup: a new crawl batch (doc_id %% 4 == 0) "
    "checked against the historical corpus — exact digest anti-hits "
    "plus MinHash-LSH near-dup hits against history's band buckets. "
    "The production shape: history's signatures/buckets are "
    "precomputed once and reused per batch; the per-batch cost is "
    "proportional to the batch, not the corpus.",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)

    hist_digests = hist.select(F.md5("text").alias("d")).distinct()
    exact_hits = (
        batch.join(F.broadcast(hist_digests), F.md5(batch["text"]) == F.col("d"))
        .select("doc_id")
        .withColumn("is_exact", F.lit(1))
        .withColumn("is_near", F.lit(0))
    )

    def buckets(df):
        sigs = dedup.minhash_signatures(df, shingle_n=3, num_hashes=16)
        from etl_property_rumah123_spark.functions.hashing import lsh_band_keys

        return sigs.select(
            "doc_id",
            F.explode(lsh_band_keys(F.col("signature"), 4, 4)).alias("bucket"),
        )

    near_hits = (
        buckets(batch)
        .join(buckets(hist).select("bucket").distinct(), "bucket")
        .select("doc_id")
        .distinct()
        .withColumn("is_exact", F.lit(0))
        .withColumn("is_near", F.lit(1))
    )
    return (
        exact_hits.unionByName(near_hits)
        .groupBy("doc_id")
        .agg(
            F.max("is_exact").cast("int").alias("exact_dup"),
            F.max("is_near").cast("int").alias("near_dup"),
        )
    )


@part(
    "corpus_lsh_probe",
    """
    WITH hist AS (
      SELECT * FROM documents WHERE doc_id % 4 <> 0
    ), batch AS (
      SELECT * FROM documents WHERE doc_id % 4 = 0
    ), bsh AS (
      SELECT doc_id, CASE WHEN len(w) >= 3
                  THEN [array_to_string(w[i:i+2], ' ') FOR i IN generate_series(1, len(w) - 2)]
                  ELSE [] END AS sh
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM batch)
    ), hsh AS (
      SELECT doc_id, CASE WHEN len(w) >= 3
                  THEN [array_to_string(w[i:i+2], ' ') FOR i IN generate_series(1, len(w) - 2)]
                  ELSE [] END AS sh
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM hist)
    ), bsig AS (
      SELECT doc_id, [list_min([md5(CAST(k AS VARCHAR) || '|' || s) FOR s IN sh])
                      FOR k IN generate_series(0, 15)] AS sig FROM bsh
    ), hsig AS (
      SELECT doc_id, [list_min([md5(CAST(k AS VARCHAR) || '|' || s) FOR s IN sh])
                      FOR k IN generate_series(0, 15)] AS sig FROM hsh
    ), bband AS (
      SELECT doc_id, CAST(b AS VARCHAR) || ':' || md5(array_to_string(sig[b*4+1:b*4+4], '')) AS bucket
      FROM bsig, (SELECT unnest(generate_series(0, 3)) AS b)
    ), hband AS (
      SELECT doc_id, CAST(b AS VARCHAR) || ':' || md5(array_to_string(sig[b*4+1:b*4+4], '')) AS bucket
      FROM hsig, (SELECT unnest(generate_series(0, 3)) AS b)
    )
    SELECT DISTINCT b.doc_id AS new_id, h.doc_id AS indexed_id
    FROM bband b JOIN hband h ON b.bucket = h.bucket AND b.doc_id <> h.doc_id
    """,
    doc="LSH index probe at PAIR grain: a new batch (doc_id %% 4 == 0) "
    "probed against the standing corpus's band-bucket index — the "
    "serving join of the persistable index artifact "
    "(operators/dedup.py: lsh_bucket_table / write_lsh_index / "
    "probe_lsh_index; artifact write/append round-trip is pinned in "
    "tests/test_advanced.py). Per-batch cost only: the corpus side is "
    "one bucket-table scan, the batch side is the only thing hashed.",
)
def corpus_lsh_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    index = dedup.lsh_bucket_table(
        docs.filter(F.col("doc_id") % 4 != 0), hash_family="md5"
    )
    return dedup.probe_lsh_index(
        docs.filter(F.col("doc_id") % 4 == 0), index, hash_family="md5"
    )


@part(
    "components_star_chain",
    """
    WITH RECURSIVE edges_sym AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      WHERE (a.doc_id + 1) // 100 = a.doc_id // 100
      UNION ALL
      SELECT b.doc_id AS src, a.doc_id AS dst
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      WHERE (a.doc_id + 1) // 100 = a.doc_id // 100
    ), reach AS (
      SELECT doc_id AS node, doc_id AS r FROM documents
      UNION
      SELECT e.src AS node, reach.r AS r
      FROM edges_sym e JOIN reach ON reach.node = e.dst
    )
    SELECT node AS doc_id, CAST(MIN(r) AS BIGINT) AS component
    FROM reach GROUP BY node
    """,
    doc="Large-star/small-star connected components "
    "(operators/dedup.py:connected_components_star — O(log n) rounds, "
    "Kiveris et al. SoCC'14) driven over successor-chain edges "
    "(doc_id -> doc_id+1 inside each doc_id//100 block): 100-node "
    "PATH graphs, exactly the diameter-bound case the min-label "
    "algorithm refuses and the reason this variant exists (URL "
    "redirect chains produce such shapes). Oracled against DuckDB's "
    "RECURSIVE transitive closure — fully independent algorithm.",
)
def components_star_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    a = docs.select("doc_id")
    b = docs.select(F.col("doc_id").alias("__succ"))
    edges = (
        a.join(b, F.col("__succ") == F.col("doc_id") + 1)
        .filter(
            F.expr("(doc_id + 1) div 100") == F.expr("doc_id div 100")
        )
        .select(F.col("doc_id").alias("id_a"), F.col("__succ").alias("id_b"))
    )
    return dedup.connected_components_star(docs, edges).select(
        F.col("node").alias("doc_id"), F.col("component")
    )


@register(
    "dedup_components",
    """
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN [array_to_string(w[i:i+2], ' ') FOR i IN generate_series(1, len(w) - 2)]
                  ELSE [] END AS sh
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents)
    ), sig AS (
      SELECT doc_id,
             [list_min([md5(CAST(k AS VARCHAR) || '|' || s) FOR s IN sh])
              FOR k IN generate_series(0, 15)] AS sig
      FROM sh
    ), bands AS (
      SELECT doc_id,
             CAST(b AS VARCHAR) || ':' || md5(array_to_string(sig[b*4+1:b*4+4], '')) AS bucket
      FROM sig, (SELECT unnest(generate_series(0, 3)) AS b)
    ), edges AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
    ), edges_sym AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM edges
    ), reach AS (
      SELECT doc_id AS node, doc_id AS r FROM documents
      UNION
      SELECT e.src AS node, reach.r AS r
      FROM edges_sym e JOIN reach ON reach.node = e.dst
    ), comp AS (
      SELECT node AS doc_id, CAST(MIN(r) AS BIGINT) AS component
      FROM reach GROUP BY node
    ), scored AS (
      SELECT c.doc_id, c.component,
             COALESCE(length(trim(d.text)), 0) AS score
      FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    ), canon AS (
      SELECT component, doc_id AS canonical_id
      FROM (SELECT component, doc_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY component
                     ORDER BY score DESC, doc_id ASC
                   ) AS rn
            FROM scored)
      WHERE rn = 1
    )
    SELECT s.doc_id AS doc_id, s.component AS component,
           CAST(c.canonical_id AS BIGINT) AS canonical_id,
           CAST(s.doc_id = c.canonical_id AS INT) AS is_canonical
    FROM scored s JOIN canon c ON s.component = c.component
    """,
    doc="Dedup clustering + CANONICAL SELECTION: MinHash-LSH candidate "
    "pairs -> connected components via iterative min-label propagation "
    "(checkpointed DataFrame loop) -> keep-best-per-cluster (longest "
    "trimmed text, lowest-id tiebreak — the fuzzy-dedup pipeline's "
    "retain-one step), oracled against a DuckDB RECURSIVE CTE "
    "transitive closure + window argmax — two fully independent "
    "algorithms. The score is integer char length so the argmax is "
    "exact on both engines.",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    edges = dedup.lsh_candidate_pairs(docs, shingle_n=3, num_hashes=16, bands=4)
    comp = dedup.connected_components(docs, edges).select(
        F.col("node").alias("doc_id"), F.col("component")
    )
    scores = docs.select(
        "doc_id",
        F.coalesce(F.length(F.trim("text")), F.lit(0))
        .cast("long")
        .alias("score"),
    )
    return dedup.canonical_per_component(comp, scores).select(
        "doc_id", "component", "canonical_id", "is_canonical"
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@register(
    "knn_bruteforce",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         s AS (
           SELECT query_id, neighbor_id,
                  {_DUCK_DOT.format(a='qv', b='cv')} AS sim
           FROM q JOIN c ON query_id <> neighbor_id
         )
    SELECT query_id AS query_id, neighbor_id AS neighbor_id, CAST(rnk AS BIGINT) AS rank
    FROM (SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
          FROM s)
    WHERE rnk <= 5
    """,
    doc="Exact top-5 cosine neighbors for 10 query vectors: broadcast "
    "query side, streamed corpus, per-query top-k window.",
    headline=True,
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(
        e.filter(F.col("vec_id") < 10), e, k=5
    )


@part(
    "ann_topk_lsh",
    None,  # approximate + engine-specific hyperplanes: rows-only check
    doc="Approximate top-k via random-hyperplane LSH buckets "
    "(deterministic md5-derived planes); exact scoring inside buckets.",
)
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return similarity.ann_topk(
        e.filter(F.col("vec_id") < 10), e, dim=64, k=5, num_planes=6,
        hamming_probes=1,
    )


@part(
    "ann_topk_ivf",
    None,  # KMeans cells are engine-specific: rows-only check; recall
    # quality is asserted on clustered data in test_similarity_recall.py
    doc="IVF-style ANN: KMeans coarse quantization (16 cells), each "
    "query probes its 2 nearest cells; exact scoring inside cells. "
    "One corpus shuffle by cell at build; n_probe/n_lists of the data "
    "touched per query at serve.",
)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        e.filter(F.col("vec_id") < 10), e, k=5, n_lists=16, n_probe=2
    )


@part(
    "embedding_norm_stats",
    """
    SELECT label AS label,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(SQRT(list_reduce([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) FOR x IN embedding], (a, b) -> a + b))), 6) AS avg_norm
    FROM embeddings GROUP BY label
    """,
    doc="Vector-column aggregation: per-label mean L2 norm, computed "
    "fully JVM-side (transform + fold, no UDF).",
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return e.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg(l2_norm(F.col("embedding"))), 6).alias("avg_norm"),
    )


@part(
    "embedding_int8_quant",
    """
    SELECT vec_id AS vec_id,
           ROUND(scale, 6) AS scale,
           ROUND(CASE WHEN scale = 0 THEN 0.0 ELSE
             list_max([abs(floor(CAST(x AS DOUBLE) / scale + 0.5) * scale
                           - CAST(x AS DOUBLE)) FOR x IN embedding])
           END, 6) AS max_abs_err,
           ROUND(CASE WHEN scale = 0 THEN 0.0 ELSE
             list_reduce([abs(floor(CAST(x AS DOUBLE) / scale + 0.5) * scale
                              - CAST(x AS DOUBLE)) FOR x IN embedding],
                         (a, b) -> a + b) / len(embedding)
           END, 6) AS mean_abs_err
    FROM (
      SELECT vec_id, embedding,
             list_max([abs(CAST(x AS DOUBLE)) FOR x IN embedding]) / 127.0 AS scale
      FROM embeddings
    )
    """,
    doc="Int8 embedding quantization accounting — the 4x storage "
    "compression every 100 TB embedding table runs: per-vector "
    "max-abs symmetric scale (max|v|/127), codes floor(v/scale + 0.5) "
    "(explicit floor form so both engines round identically — ROUND "
    "half-rule differs between them), and the reconstruction-error "
    "profile (max / mean absolute error) of dequantize(quantize(v)). "
    "Pure Column HOFs over the vector; the error folds are the shared "
    "left-to-right form. Zero vectors quantize to scale 0 / error 0.",
)
def embedding_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    absd = F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    scale = F.array_max(absd) / F.lit(127.0)
    err = F.transform(
        F.col("embedding"),
        lambda x: F.abs(
            F.floor(x.cast("double") / F.col("__scale") + F.lit(0.5))
            * F.col("__scale")
            - x.cast("double")
        ),
    )
    with_scale = e.withColumn("__scale", scale).withColumn("__err", err)
    fold = F.aggregate(F.col("__err"), F.lit(0.0), lambda a, x: a + x)
    zero = F.col("__scale") == 0.0
    return with_scale.select(
        "vec_id",
        F.round(F.col("__scale"), 6).alias("scale"),
        F.round(
            F.when(zero, F.lit(0.0)).otherwise(F.array_max(F.col("__err"))), 6
        ).alias("max_abs_err"),
        F.round(
            F.when(zero, F.lit(0.0)).otherwise(
                fold / F.size(F.col("embedding"))
            ),
            6,
        ).alias("mean_abs_err"),
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@part(
    "text_token_stats",
    f"""
    SELECT doc_id AS doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           END AS n_tokens,
           CAST(len(regexp_extract_all(text, '{text_analysis.BPE_ISH_PATTERN}')) AS BIGINT) AS n_bpeish,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_measured
    FROM documents
    """,
    doc="Token counting: whitespace tokens + BPE-ish sub-word regex "
    "runs + chars.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        text_analysis.token_count(F.col("text")).alias("n_tokens"),
        text_analysis.bpe_ish_token_count(F.col("text")).alias("n_bpeish"),
        text_analysis.char_count(F.col("text")).alias("n_chars_measured"),
    )


@part(
    "text_top_terms",
    """
    SELECT term AS term, CAST(COUNT(*) AS BIGINT) AS freq,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
          FROM documents)
    WHERE LENGTH(term) >= 3
    GROUP BY term
    ORDER BY freq DESC, term
    LIMIT 50
    """,
    doc="Corpus vocabulary: explode tokens -> term + document "
    "frequency -> global top-50. The classic wordcount with the "
    "two-level aggregation (term, doc) -> term that map-side combines "
    "at scale; top-k is a single-partition final sort of the "
    "already-aggregated term table.",
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    terms = d.select(
        "doc_id",
        F.explode(hashing.word_tokens(F.lower(F.col("text")))).alias("term"),
    ).filter(F.length("term") >= 3)
    return (
        terms.groupBy("term")
        .agg(
            F.count("*").alias("freq"),
            F.count_distinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.col("freq").desc(), "term")
        .limit(50)
    )


@part(
    "corpus_prepare_pipeline",
    """
    WITH w AS (
      SELECT doc_id, lang, text, string_split_regex(trim(text), '\\s+') AS w
      FROM documents
    ), gated AS (
      SELECT doc_id, lang, text,
             CASE WHEN trim(text) = '' THEN 0 ELSE len(w) END AS n_tokens
      FROM w
      WHERE (CASE WHEN trim(text) = '' THEN 0 ELSE len(w) END) >= 5
        AND (CAST(len(list_filter(w, x -> list_contains(['the','a','and','of','is'], x))) AS DOUBLE)
             / NULLIF(CAST(len(w) AS DOUBLE), 0.0)) <= 0.6
    ), deduped AS (
      SELECT doc_id, lang, n_tokens FROM (
        SELECT doc_id, lang, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM gated
      ) WHERE rn = 1
    )
    SELECT split AS split, lang AS lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM (
      SELECT lang, n_tokens,
             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|split42'), 1, 1)) AS INT) < 8
                  THEN 'train'
                  WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|split42'), 1, 1)) AS INT) < 9
                  THEN 'val' ELSE 'test' END AS split
      FROM deduped
    ) GROUP BY split, lang
    """,
    doc="The full corpus-preparation pipeline as ONE lazy plan: "
    "quality gate (P-style expressions, zero shuffles) -> exact dedup "
    "keep-min-id (one shuffle on digest) -> deterministic salted-hash "
    "split -> per-(split, lang) token accounting. The composition the "
    "engine exists for; Catalyst pipelines all four stages.",
)
def corpus_prepare_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    # Gate computed from the shared tokenized view: for any doc that
    # can pass n_tokens >= 5 the clean-words array equals word_tokens
    # (they differ only on blank text, which the floor excludes), so
    # stop_ratio over it matches quality_features' value exactly.
    d = tokenized_docs(spark, sf_dir)
    stop_ratio = text_analysis.stopword_ratio(
        F.col("words"), text_analysis.LANG_MARKERS["en"]
    )
    gated = (
        d.withColumn("stop_ratio", stop_ratio)
        .filter(
            (F.col("n_tok") >= 5)
            & (F.col("stop_ratio").isNull() | (F.col("stop_ratio") <= 0.6))
        )
        .select("doc_id", "lang", "text", F.col("n_tok").alias("n_tokens"))
    )
    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        gated.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "text")
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|split42"))), 1, 1
        ),
        16,
        10,
    ).cast("int")
    split = (
        F.when(h < 8, F.lit("train")).when(h < 9, F.lit("val")).otherwise(F.lit("test"))
    )
    return (
        deduped.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


@part(
    "events_top_paths",
    """
    WITH g AS (
      SELECT user_id, event_id, event_type, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), s AS (
      SELECT user_id, event_id, event_type, ts,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS session_id
      FROM g
    ), paths AS (
      SELECT user_id, session_id,
             array_to_string(list(event_type ORDER BY ts, event_id)[1:5], '>') AS path
      FROM s GROUP BY user_id, session_id
    )
    SELECT path AS path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 20
    """,
    doc="Behavioral path mining: sessionize (gaps-and-islands), build "
    "each session's ordered event-type path (first 5 steps) with an "
    "ordered collect, rank the most common paths. The ordered "
    "list-aggregation + frequency shape behind user-journey and "
    "n-gram-over-actions features.",
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_session = F.when(
        prev_us.isNull() | (F.unix_micros(F.col("ts")) - prev_us > 1_800_000_000), 1
    ).otherwise(0)
    s = e.withColumn("session_id", F.sum(new_session).over(w))
    paths = (
        s.groupBy("user_id", "session_id")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ).cast("array<struct<ts:timestamp,event_id:long,event_type:string>>"),
                1,
                5,
            ).alias("steps")
        )
        .select(
            F.concat_ws(
                ">", F.transform(F.col("steps"), lambda x: x["event_type"])
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )


@part(
    "events_anomaly_zscore",
    """
    WITH stats AS (
      SELECT event_type,
             AVG(value) AS mu,
             STDDEV_SAMP(value) AS sigma
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_id AS event_id, e.event_type AS event_type,
           ROUND((e.value - s.mu) / s.sigma, 6) AS z
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE e.value IS NOT NULL
      AND ABS((e.value - s.mu) / s.sigma) > 3.0
    """,
    doc="Anomaly flagging: per-type sample mean/stddev (tiny stats "
    "table, broadcast back) -> |z| > 3 outliers. Two passes over "
    "events, both map-side-combining aggregations/joins; the pattern "
    "behind data-quality monitors at ingest.",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        e.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3.0)
        .select("event_id", "event_type", F.round(z, 6).alias("z"))
    )


@part(
    "events_gap_fill",
    """
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events WHERE event_type = 'error'
    ), cal AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start FROM bounds
    ), actual AS (
      SELECT date_trunc('hour', ts) AS hour_start, CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE event_type = 'error' GROUP BY 1
    )
    SELECT strftime(cal.hour_start, '%Y-%m-%d %H:%M:%S') AS hour_start,
           COALESCE(actual.n, 0) AS n
    FROM cal LEFT JOIN actual ON cal.hour_start = actual.hour_start
    """,
    doc="Time-series gap filling: a generated hourly calendar "
    "(sequence + explode between the observed bounds) left-joined to "
    "actual counts, missing hours zero-filled — the dense-series shape "
    "dashboards and models need. The calendar side is tiny and "
    "broadcast; scales with the time range, not the event volume.",
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    cal = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start")
    )
    actual = e.groupBy(F.date_trunc("hour", "ts").alias("hour_start")).agg(
        F.count("*").alias("n")
    )
    return (
        F.broadcast(cal)
        .join(actual, "hour_start", "left")
        .select(
            F.date_format("hour_start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


@part(
    "events_time_rollup",
    """
    SELECT CASE WHEN GROUPING(y) = 1 THEN NULL ELSE y END AS y,
           CASE WHEN GROUPING(m) = 1 THEN NULL ELSE m END AS m,
           CASE WHEN GROUPING(d) = 1 THEN NULL ELSE d END AS d,
           CAST(GROUPING(y) * 4 + GROUPING(m) * 2 + GROUPING(d) AS BIGINT) AS lvl,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(value), 0) AS BIGINT) AS total
    FROM (SELECT CAST(EXTRACT(year FROM ts) AS BIGINT) AS y,
                 CAST(EXTRACT(month FROM ts) AS BIGINT) AS m,
                 CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
                 value
          FROM events)
    GROUP BY ROLLUP (y, m, d)
    """,
    doc="Hypertable-style time-hierarchy rollup: one pass over events "
    "producing day, month, year, and grand-total grains via "
    "ROLLUP(y, m, d) with GROUPING() disambiguation (lvl encodes the "
    "grain; NULL group keys normalized so real NULLs and subtotal "
    "markers cannot collide). This is the continuous-aggregate shape "
    "time-series stores maintain incrementally — here Spark computes "
    "every grain in one shuffle with map-side partial aggregation; "
    "the incremental-maintenance analog is merge_into_partitioned "
    "over the day grain plus re-aggregation of coarser grains.",
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
        "value",
    )
    g = e.rollup("y", "m", "d").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 0).cast("long").alias("total"),
        F.grouping("y").alias("__gy"),
        F.grouping("m").alias("__gm"),
        F.grouping("d").alias("__gd"),
    )
    lvl = (
        F.col("__gy") * 4 + F.col("__gm") * 2 + F.col("__gd")
    ).cast("long")
    return g.select(
        F.when(F.col("__gy") == 1, F.lit(None)).otherwise(F.col("y")).alias("y"),
        F.when(F.col("__gm") == 1, F.lit(None)).otherwise(F.col("m")).alias("m"),
        F.when(F.col("__gd") == 1, F.lit(None)).otherwise(F.col("d")).alias("d"),
        lvl.alias("lvl"),
        "n",
        "total",
    )


@part(
    "events_interpolate",
    """
    WITH e AS (
      SELECT date_trunc('hour', ts) AS h, value
      FROM events WHERE event_type = 'purchase'
    ), bounds AS (
      SELECT MIN(h) AS lo, MAX(h) AS hi FROM e
    ), cal AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
    ), hourly AS (
      SELECT cal.h AS h, a.v AS v
      FROM cal LEFT JOIN (SELECT h, ROUND(AVG(value), 6) AS v
                          FROM e GROUP BY h) a USING (h)
    ), marked AS (
      SELECT h, v,
        last_value(v IGNORE NULLS) OVER w_prev AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
          OVER w_prev AS ph,
        first_value(v IGNORE NULLS) OVER w_next AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
          OVER w_next AS nh
      FROM hourly
      WINDOW
        w_prev AS (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
           CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS known,
           ROUND(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv) * (date_diff('hour', ph, h) * 1.0
                                 / date_diff('hour', ph, nh))
             ELSE NULL END, 6) AS v_interp
    FROM marked
    """,
    doc="Time-series linear interpolation: dense hourly calendar of "
    "mean purchase value with gaps filled by lerp between the last "
    "and next KNOWN hours (carried via last/first IGNORE NULLS window "
    "pairs — value AND its hour). Leading/trailing gaps stay NULL (no "
    "extrapolation). The global window runs over the CALENDAR (rows = "
    "time range in hours), never the event volume — the hourly "
    "aggregate upstream is the only data-sized shuffle. Both engines "
    "evaluate the identical lerp expression on identical rounded "
    "inputs, so the result is hash-exact.",
)
def events_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(F.date_trunc("hour", "ts").alias("h"), "value")
    )
    bounds = e.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    actual = e.groupBy("h").agg(F.round(F.avg("value"), 6).alias("v"))
    hourly = F.broadcast(cal).join(actual, "h", "left")
    w_prev = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.orderBy("h").rowsBetween(0, Window.unboundedFollowing)
    known_h = F.when(F.col("v").isNotNull(), F.col("h"))
    m = hourly.select(
        "h",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(known_h, ignorenulls=True).over(w_prev).alias("ph"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(known_h, ignorenulls=True).over(w_next).alias("nh"),
    )
    hours = lambda a, b: (  # noqa: E731 — integer hour distance
        (F.unix_timestamp(b) - F.unix_timestamp(a)) / F.lit(3600)
    ).cast("long")
    lerp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        hours(F.col("ph"), F.col("h")) * F.lit(1.0)
        / hours(F.col("ph"), F.col("nh"))
    )
    return m.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        F.col("v").isNotNull().cast("int").alias("known"),
        F.round(
            F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
                F.when(
                    F.col("pv").isNotNull() & F.col("nv").isNotNull(), lerp
                )
            ),
            6,
        ).alias("v_interp"),
    )


@part(
    "funnel_conversion",
    """
    WITH firsts AS (
      SELECT user_id,
             MIN(ts) FILTER (WHERE event_type = 'signup') AS first_signup,
             MIN(ts) FILTER (WHERE event_type = 'click') AS first_click,
             MIN(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_users,
      CAST(COUNT(first_signup) AS BIGINT) AS n_signup,
      CAST(COUNT(CASE WHEN first_click > first_signup THEN 1 END) AS BIGINT) AS n_click_after_signup,
      CAST(COUNT(CASE WHEN first_purchase > first_click AND first_click > first_signup
                 THEN 1 END) AS BIGINT) AS n_full_funnel
    FROM firsts
    """,
    doc="Funnel analysis: signup -> click -> purchase ordering per "
    "user via conditional MIN aggregates — one shuffle on user_id, no "
    "joins, the scalable formulation of sequence funnels (vs the "
    "self-join-per-stage anti-pattern).",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("s"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("c"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p"),
    )
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.count("s").alias("n_signup"),
        F.count(F.when(F.col("c") > F.col("s"), 1)).alias("n_click_after_signup"),
        F.count(
            F.when((F.col("p") > F.col("c")) & (F.col("c") > F.col("s")), 1)
        ).alias("n_full_funnel"),
    )


@part(
    "text_quality_filter",
    """
    WITH w AS (
      SELECT doc_id, lang, text, string_split_regex(trim(text), '\\s+') AS w
      FROM documents
    ), feat AS (
      SELECT doc_id, lang,
             CASE WHEN trim(text) = '' THEN 0 ELSE len(w) END AS n_tokens,
             CAST(len(list_filter(w, x -> list_contains(['the','a','and','of','is'], x))) AS DOUBLE)
               / NULLIF(CAST(len(w) AS DOUBLE), 0.0) AS stop_ratio,
             CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
               / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0.0) AS punct_ratio
      FROM w
    )
    SELECT doc_id AS doc_id, lang AS lang, CAST(n_tokens AS BIGINT) AS n_tokens
    FROM feat
    WHERE n_tokens >= 5
      AND (stop_ratio IS NULL OR stop_ratio <= 0.6)
      AND (punct_ratio IS NULL OR punct_ratio <= 0.2)
    """,
    doc="Corpus quality gate (C4-style heuristics composed into one "
    "filter): min token count, bounded stopword ratio, bounded "
    "punctuation ratio. Pure expressions — runs inside the scan stage "
    "with zero shuffles at any scale.",
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    feats = text_analysis.quality_features(d)
    return feats.filter(
        (F.col("n_tokens") >= 5)
        & (F.col("stop_ratio").isNull() | (F.col("stop_ratio") <= 0.6))
        & (F.col("punct_ratio").isNull() | (F.col("punct_ratio") <= 0.2))
    ).select("doc_id", "lang", "n_tokens")


@part(
    "text_tfidf_top_term",
    """
    WITH terms AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM terms WHERE LENGTH(term) >= 3 GROUP BY doc_id, term
    ), df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * LN(n.n_docs / df.df), 6) AS tfidf
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    )
    SELECT doc_id AS doc_id, term AS top_term, tfidf AS tfidf
    FROM (SELECT doc_id, term, tfidf,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, term) AS rn
          FROM scored)
    WHERE rn = 1
    """,
    doc="TF-IDF keyword extraction: term frequency x log inverse doc "
    "frequency, top-scoring term per document. The df table is tiny "
    "(vocabulary) -> broadcast to the tf side; log argument identical "
    "on both engines so doubles match exactly.",
)
def text_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    terms = d.select(
        "doc_id",
        F.explode(hashing.word_tokens(F.lower(F.col("text")))).alias("term"),
    ).filter(F.length("term") >= 3)
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = float(d.count())
    scored = tf.join(F.broadcast(df_t), "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(n_docs) / F.col("df")), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("top_term"), "tfidf")
    )


@part(
    "corpus_split_deterministic",
    """
    SELECT split AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_id
    FROM (
      SELECT doc_id,
             CASE WHEN h < 8 THEN 'train' WHEN h < 9 THEN 'val' ELSE 'test' END AS split
      FROM (SELECT doc_id,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|split42'), 1, 1)) AS INT) AS h
            FROM documents)
    ) GROUP BY split
    """,
    doc="Deterministic train/val/test corpus split (80/5/15ish, actual "
    "ratio set by the hex-digit bucket of a salted md5): reproducible "
    "across engines, runs, and partitionings — the property random "
    "sample() lacks. Zero shuffles beyond the count aggregation; the "
    "same hash gate scales to exact-fraction sampling at 100 TB.",
)
def corpus_split_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|split42"))), 1, 1),
        16,
        10,
    ).cast("int")
    split = (
        F.when(h < 8, F.lit("train")).when(h < 9, F.lit("val")).otherwise(F.lit("test"))
    )
    return (
        d.select(split.alias("split"), "doc_id")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_id"))
    )


# Per-language mixing weights for the deterministic sampler. A real
# pipeline reads these from config; a literal dict keeps the Spark
# when-chain and the oracle CASE generated from ONE source of truth.
_MIX_RATES: dict[str, float] = {"en": 1.0, "zh": 0.5, "es": 0.5, "de": 0.25}
_MIX_DEFAULT = 0.1
_PACK_BUDGET = 1024

# Clean word array (''/null text -> [], no empty tokens) — DuckDB twin
# of text_analysis.clean_words.
_DUCK_WORDS = (
    "list_filter(string_split_regex(trim(coalesce(text, '')), '\\s+'), "
    "x -> x <> '')"
)

# ---------------------------------------------------------------------------
# Shared tokenized view: the corpus pipeline's branches all need the
# word array; without sharing, a 13-branch suite re-tokenizes the
# corpus ~7 times. Materialized (localCheckpoint) once per
# (application, sf_dir) — the same pattern as the LSH bucket table —
# and reused by every branch AND across the bench sweep's queries. At
# 100 TB this is "tokenize once, persist, fan out", which is how a
# real multi-stage corpus job is laid out anyway.
# ---------------------------------------------------------------------------

_TOKENIZED_CACHE: dict = {}


def tokenized_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, text, words, n_tok) over documents, tokenized
    exactly once per session+dataset (words = clean_words: ''/null
    text -> [])."""
    import os as _os

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _TOKENIZED_CACHE:
        return _TOKENIZED_CACHE[key]
    d = table(spark, sf_dir, "documents")
    # tests patch `table` with narrower frames; lang is optional
    lang = F.col("lang") if "lang" in d.columns else F.lit(None).cast("string")
    view = d.select(
        "doc_id",
        lang.alias("lang"),
        "text",
        text_analysis.clean_words(F.col("text")).alias("words"),
    ).withColumn("n_tok", F.size("words").cast("long"))
    # Memoize only real dataset dirs: tests patch `table` with ad-hoc
    # frames under fake sf_dir strings, which must never stick.
    if not _os.path.isdir(sf_dir):
        return view
    _TOKENIZED_CACHE[key] = common.materialize(view)
    return _TOKENIZED_CACHE[key]


def _duck_mix_rate() -> str:
    arms = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in _MIX_RATES.items()
    )
    return f"CASE lang {arms} ELSE {_MIX_DEFAULT} END"


@part(
    "corpus_mix_sample",
    f"""
    SELECT lang AS lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN u < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CAST(SUM(CASE WHEN u < rate THEN n_tok ELSE 0 END) AS BIGINT) AS n_tokens_sampled
    FROM (
      SELECT lang,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|mix42'), 1, 6)) AS BIGINT)
               / 16777216.0 AS u,
             {_duck_mix_rate()} AS rate,
             len({_DUCK_WORDS}) AS n_tok
      FROM documents
    ) GROUP BY lang
    """,
    doc="Dataset-mixing accounting: per-language doc/token counts "
    "admitted by the deterministic hash gate at the configured mixing "
    "weights. The gate (md5-derived uniform < rate) is reproducible "
    "across engines and partitionings — the property sample() lacks — "
    "and evaluates inside the scan stage; the only shuffle is the "
    "final per-language aggregation.",
)
def corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tokenized_docs(spark, sf_dir)
    rate = F.lit(float(_MIX_DEFAULT))
    for k, v in reversed(_MIX_RATES.items()):
        rate = F.when(F.col("lang") == k, F.lit(float(v))).otherwise(rate)
    u = sampling.deterministic_uniform(F.col("doc_id"), "|mix42")
    admitted = (u < rate).cast("int")
    return (
        d.select("lang", admitted.alias("__adm"), F.col("n_tok").alias("__tok"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__adm").cast("long").alias("n_sampled"),
            F.sum(F.col("__adm") * F.col("__tok")).cast("long").alias(
                "n_tokens_sampled"
            ),
        )
    )


@part(
    "corpus_token_pack",
    f"""
    WITH tok AS (
      SELECT doc_id, CAST(len({_DUCK_WORDS}) AS BIGINT) AS n_tok
      FROM documents
    ), run AS (
      SELECT doc_id, n_tok,
             SUM(n_tok) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running
      FROM tok
    )
    SELECT CAST((running - n_tok) // {_PACK_BUDGET} AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM run GROUP BY 1
    """,
    doc="Sequence-packing accounting: documents laid out in doc_id "
    "order, token stream cut every 1024 tokens, each doc assigned the "
    "bin it starts in (concat-and-chunk pretraining packing). The "
    "Spark side computes the global running sum with the two-phase "
    "distributed prefix sum (operators/sampling.py) — range "
    "repartition + per-partition window + broadcast offsets — never a "
    "single-partition global window; the oracle's single-node window "
    "checks it reproduces the exact same global order.",
)
def corpus_token_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tokenized_docs(spark, sf_dir).select("doc_id", "n_tok")
    return sampling.pack_token_bins(
        d, budget=_PACK_BUDGET, order_col="doc_id", weight_col="n_tok"
    )


@part(
    "text_lm_surprisal",
    f"""
    WITH w AS (
      SELECT doc_id, {_DUCK_WORDS} AS w FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest([w[i] || ' ' || w[i+1] FOR i IN generate_series(1, len(w) - 1)]) AS b
      FROM w WHERE len(w) >= 2
    ), freq AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY b
    ), tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS t FROM freq
    )
    SELECT doc_id AS doc_id,
           ROUND(AVG(length(bin(t // c)) - 1), 6) AS lm_surprisal
    FROM bg JOIN freq USING (b) CROSS JOIN tot
    GROUP BY doc_id
    """,
    doc="CCNet-style LM quality proxy: per-doc mean bigram surprisal "
    "against the corpus's own bigram frequencies. Surprisal is the "
    "INTEGER bucket floor(log2(total/freq)) computed as "
    "length(bin(total DIV freq)) - 1 — floating ln is not reproducible "
    "across engines (libm last-ulp differences flip ROUND at scale), "
    "while bin() of a BIGINT is exact in both; the filter only needs "
    "monotonicity, which the bucket keeps. Shape: one bigram-explode "
    "scan feeding (a) the frequency aggregation and (b) the scoring "
    "join — the exploded table is localCheckpointed since both "
    "branches read it; the 1-row corpus total attaches via an explicit "
    "broadcast nested-loop join (the bounded-side pattern the plan "
    "gate whitelists — an equi-join on a literal key constant-folds "
    "into the same plan anyway).",
)
def text_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = tokenized_docs(spark, sf_dir).select(
        "doc_id", F.col("words").alias("w")
    )
    bg = (
        w.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(text_analysis.word_bigrams(F.col("w"))).alias("b"),
        )
        .transform(common.materialize)
    )
    freq = bg.groupBy("b").agg(F.count("*").cast("long").alias("c"))
    tot = freq.agg(F.sum("c").cast("long").alias("t"))
    freq_t = freq.crossJoin(F.broadcast(tot))
    s = bg.join(freq_t, "b").select(
        "doc_id", (F.length(F.bin(F.expr("t DIV c"))) - 1).alias("s")
    )
    return s.groupBy("doc_id").agg(
        F.round(F.avg("s"), 6).alias("lm_surprisal")
    )


@part(
    "text_boilerplate_strip",
    """
    WITH s0 AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(coalesce(text, ''), '.'),
                                        x -> trim(x)), x -> x <> '') AS l
      FROM documents
    ), s AS (
      SELECT doc_id, unnest(l) AS seg,
             unnest(generate_series(1, len(l))) AS pos
      FROM s0
    ), b AS (
      SELECT seg
      FROM (SELECT seg, count(DISTINCT doc_id) AS df FROM s GROUP BY seg)
      WHERE df >= 3
    )
    SELECT s.doc_id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN b.seg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           COALESCE(string_agg(s.seg, '. ' ORDER BY s.pos)
                      FILTER (WHERE b.seg IS NULL), '') AS clean_text
    FROM s LEFT JOIN b USING (seg)
    GROUP BY s.doc_id
    """,
    doc="RefinedWeb-style boilerplate removal: sentence segments "
    "appearing verbatim in >= 3 distinct docs are dropped and each "
    "doc's survivors are re-joined in original order ('. ' canonical "
    "form). The testdata corpus has no cross-doc repeated segments, so "
    "here the op verifies as an exact identity pass (counts + "
    "re-assembled text must still hash-match); the planted-boilerplate "
    "behavior is pinned by tests/test_sampling.py against the same "
    "oracle on a fixture corpus. See operators/text_analysis.py:"
    "strip_boilerplate for the scale shape.",
)
def text_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.strip_boilerplate(table(spark, sf_dir, "documents"))


_CHUNK_SIZE, _CHUNK_STRIDE = 256, 192


@part(
    "corpus_chunk_plan",
    f"""
    WITH tok AS (
      SELECT doc_id, CAST(len({_DUCK_WORDS}) AS BIGINT) AS n_tok
      FROM documents
    ), ex AS (
      SELECT doc_id, n_tok,
             unnest(generate_series(0,
               (GREATEST(n_tok - {_CHUNK_SIZE}, 0) + {_CHUNK_STRIDE - 1})
                 // {_CHUNK_STRIDE})) AS chunk_idx
      FROM tok WHERE n_tok > 0
    )
    SELECT doc_id AS doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(LEAST(chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_SIZE}, n_tok)
                - chunk_idx * {_CHUNK_STRIDE} AS BIGINT) AS chunk_tokens
    FROM ex
    """,
    doc="Retrieval-style chunk plan: one row per (doc, chunk) for "
    "256-token windows advancing by 192 (64-token overlap), last "
    "window truncated at doc end. Non-negative integer arithmetic "
    "only — Spark DIV truncates, DuckDB // floors, so negative "
    "numerators would diverge. Generate-and-explode, zero shuffles.",
)
def corpus_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tokenized_docs(spark, sf_dir).select("doc_id", "n_tok")
    return sampling.chunk_spans(d, size=_CHUNK_SIZE, stride=_CHUNK_STRIDE)


_SPAN_N = 16


@part(
    "corpus_repeated_spans",
    f"""
    WITH w0 AS (
      SELECT doc_id,
             string_split_regex(trim(coalesce(text, '')), '\\s+') AS w
      FROM documents
    ), sp AS (
      SELECT doc_id,
             unnest(CASE WHEN len(w) >= {_SPAN_N}
                    THEN [md5(array_to_string(w[i:i+{_SPAN_N - 1}], ' '))
                          FOR i IN generate_series(1, len(w) - {_SPAN_N - 1})]
                    ELSE [] END) AS h
      FROM w0
    ), rep AS (
      SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM sp GROUP BY h)
      WHERE nd >= 2
    ), cnt AS (
      SELECT sp.doc_id, COUNT(*) AS n_windows,
             SUM(CASE WHEN rep.h IS NOT NULL THEN 1 ELSE 0 END) AS n_repeated
      FROM sp LEFT JOIN rep ON sp.h = rep.h
      GROUP BY sp.doc_id
    )
    SELECT w0.doc_id AS doc_id,
           CAST(COALESCE(cnt.n_windows, 0) AS BIGINT) AS n_windows,
           CAST(COALESCE(cnt.n_repeated, 0) AS BIGINT) AS n_repeated
    FROM w0 LEFT JOIN cnt ON w0.doc_id = cnt.doc_id
    """,
    doc="Span-level exact-substring dedup primitive (the repeated-"
    "passage detector of Lee et al.'s dedup study): a 16-token window "
    "position counts as repeated when its exact n-gram occurs in >= 2 "
    "distinct docs. Per-doc (n_windows, n_repeated) accounting; "
    "callers cut on the repeated fraction. The natural corpus has no "
    "cross-doc 16-grams, so this verifies as an all-zeros identity "
    "pass here (counts still hash-compared); planted-passage behavior "
    "is pinned in tests/test_sampling.py. Windows are md5'd before "
    "any shuffle — exchanges carry digests, never 16-word strings. "
    "See operators/dedup.py:repeated_spans.",
)
def corpus_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.repeated_spans(
        tokenized_docs(spark, sf_dir), span_n=_SPAN_N, words_col="words"
    )


_N_SHARDS = 8


@part(
    "corpus_shuffle_shards",
    f"""
    WITH h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|shuffle42'),
                                  1, 12)) AS BIGINT) AS hv
      FROM documents
    ), r AS (
      SELECT doc_id, hv % {_N_SHARDS} AS shard,
             row_number() OVER (PARTITION BY hv % {_N_SHARDS}
                                ORDER BY hv, doc_id) AS rn
      FROM h
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS head_doc
    FROM r GROUP BY shard
    """,
    doc="Deterministic training-order shuffle + sharding accounting: "
    "salted-md5 48-bit order key, shard = h mod 8, per-shard doc count "
    "and the doc that LEADS each shard's epoch order (row_number over "
    "(h, doc_id) — the head doc pins the whole order, so a hash or "
    "windowing divergence between engines fails the value check). The "
    "production write is repartition(shard) + sortWithinPartitions — "
    "one hash shuffle at any scale. See operators/sampling.py:"
    "shard_order.",
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = sampling.shard_order(
        table(spark, sf_dir, "documents").select("doc_id"), n_shards=_N_SHARDS
    )
    w = Window.partitionBy("shard").orderBy("__h", "doc_id")
    r = d.withColumn("rn", F.row_number().over(w))
    return r.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.max(F.when(F.col("rn") == 1, F.col("doc_id")))
        .cast("long")
        .alias("head_doc"),
    )


@part(
    "corpus_source_cap",
    """
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR) || '|cap42'),
                                         doc_id) AS rn
      FROM documents)
    SELECT source AS source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE rn <= 10) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) FILTER (WHERE rn <= 10) AS BIGINT) AS kept_id_sum
    FROM ranked GROUP BY source
    """,
    doc="Per-source document cap (the per-domain cap of web-scale "
    "corpus curation: no source may dominate the training mix): keep "
    "at most 10 docs per source in deterministic salted-md5 order, "
    "account (n_docs, n_kept, sum of kept ids) per source — the id "
    "sum pins EXACTLY which docs survived, so a hash or window-order "
    "divergence between engines fails the value check. One shuffle "
    "on source; mega-group pre-thinning via the shuffle-free hash "
    "gate is documented in operators/sampling.py:cap_per_group.",
)
def corpus_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = sampling.cap_per_group(
        table(spark, sf_dir, "documents").select("doc_id", "source"),
        group_col="source",
        key_col="doc_id",
        k=10,
    )
    return d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("__keep").cast("long").alias("n_kept"),
        F.sum(F.when(F.col("__keep") == 1, F.col("doc_id")))
        .cast("long")
        .alias("kept_id_sum"),
    )


_SEMDEDUP_PLANES, _SEMDEDUP_DIM, _SEMDEDUP_THRESHOLD = 6, 64, 0.3
_SEMDEDUP_SEED = "semdedup-42"


def _duck_semantic_bucket() -> str:
    """DuckDB twin of similarity.rp_lsh_buckets for the semdedup seed:
    sign bit per literal +-1 hyperplane, identical fold order, so the
    bucket id is bit-for-bit reproducible across engines."""
    from etl_property_rumah123_spark.operators.similarity import _hyperplane

    terms = []
    for p in range(_SEMDEDUP_PLANES):
        plane = _hyperplane(_SEMDEDUP_SEED, p, _SEMDEDUP_DIM)
        lit = "[" + ", ".join(str(v) for v in plane) + "]"
        d = _DUCK_DOT.format(a="embedding", b=lit)
        terms.append(f"(CASE WHEN {d} >= 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(terms)


@part(
    "corpus_semantic_dedup",
    f"""
    WITH b AS (
      SELECT vec_id, embedding, {_duck_semantic_bucket()} AS bucket
      FROM embeddings
    ), d AS (
      SELECT a.bucket AS bucket,
             CAST(COUNT(DISTINCT b2.vec_id) AS BIGINT) AS n_dropped
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
      WHERE {_DUCK_DOT.format(a='a.embedding', b='b2.embedding')}
              >= {_SEMDEDUP_THRESHOLD}
      GROUP BY a.bucket
    )
    SELECT CAST(b.bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COALESCE(MAX(d.n_dropped), 0) AS BIGINT) AS n_dropped
    FROM b LEFT JOIN d ON b.bucket = d.bucket
    GROUP BY b.bucket
    """,
    doc="SemDeDup-style semantic dedup accounting: deterministic "
    "random-hyperplane buckets (6 literal +-1 planes -> 64 buckets), "
    "inside each bucket drop every vector with a smaller-id neighbor "
    "at cosine >= 0.3 (keep-lowest-id per semantic cluster). One "
    "equi-join on the bucket key — sum(bucket^2) work, never "
    "all-pairs; exact ground truth is dedup_embedding_cosine. The "
    "oracle recomputes buckets and drops from the same plane "
    "literals. See operators/dedup.py:semantic_dedup.",
)
def corpus_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.semantic_dedup(
        table(spark, sf_dir, "embeddings"),
        threshold=_SEMDEDUP_THRESHOLD,
        dim=_SEMDEDUP_DIM,
        num_planes=_SEMDEDUP_PLANES,
        seed=_SEMDEDUP_SEED,
    )


@part(
    "text_repetition_scores",
    f"""
    WITH base AS (
      SELECT doc_id,
             list_filter([trim(x) FOR x IN string_split(coalesce(text, ''), chr(10))],
                         x -> x <> '') AS lines,
             {_DUCK_WORDS} AS w
      FROM documents
    ), scal AS (
      SELECT doc_id,
             CAST(len(lines) AS BIGINT) AS n_lines,
             ROUND(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
                   / NULLIF(CAST(len(lines) AS DOUBLE), 0.0), 6) AS dup_line_frac,
             ROUND(CAST(len(w) - len(list_distinct(w)) AS DOUBLE)
                   / NULLIF(CAST(len(w) AS DOUBLE), 0.0), 6) AS dup_word_frac
      FROM base
    ), bg AS (
      SELECT doc_id,
             unnest([w[i] || ' ' || w[i+1] FOR i IN generate_series(1, len(w) - 1)]) AS b
      FROM base WHERE len(w) >= 2
    ), bgm AS (
      SELECT doc_id, MAX(c) AS maxc, SUM(c) AS totc
      FROM (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b)
      GROUP BY doc_id
    )
    SELECT s.doc_id AS doc_id, s.n_lines AS n_lines,
           s.dup_line_frac AS dup_line_frac, s.dup_word_frac AS dup_word_frac,
           ROUND(CAST(m.maxc AS DOUBLE) / CAST(m.totc AS DOUBLE), 6) AS top_bigram_frac
    FROM scal s LEFT JOIN bgm m ON s.doc_id = m.doc_id
    """,
    doc="Gopher-style repetition filters: duplicate-line fraction, "
    "duplicate-word fraction (pure expressions, zero shuffles), and "
    "most-frequent-bigram share (explode + two map-side-combining "
    "aggregations — not the per-row HOF form, which is quadratic in "
    "document length).",
)
def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_analysis.repetition_features(table(spark, sf_dir, "documents"))


@part(
    "text_quality_scores",
    """
    WITH w AS (
      SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w FROM documents
    )
    SELECT doc_id AS doc_id,
           ROUND(CAST(len(list_filter(w, x -> list_contains(['the','a','and','of','is'], x))) AS DOUBLE)
                 / NULLIF(CAST(len(w) AS DOUBLE), 0.0), 6) AS stop_ratio,
           ROUND(CAST(list_sum([CAST(LENGTH(x) AS BIGINT) FOR x IN w]) AS DOUBLE)
                 / NULLIF(CAST(len(w) AS DOUBLE), 0.0), 6) AS mean_word_len,
           ROUND(CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
                 / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0.0), 6) AS punct_ratio
    FROM w
    """,
    doc="Quality scoring features: stopword ratio, mean word length, "
    "punctuation ratio — corpus-filter signals as pure expressions.",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = text_analysis.quality_features(table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.round("stop_ratio", 6).alias("stop_ratio"),
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
    )


def _duck_lang_hits(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in text_analysis.LANG_MARKERS[lang])
    return (
        f"len(list_filter(w, x -> list_contains([{markers}], x)))"
    )


@part(
    "text_lang_id",
    f"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ), scores AS (
      SELECT doc_id,
             {_duck_lang_hits('en')} AS s_en,
             {_duck_lang_hits('fr')} AS s_fr,
             {_duck_lang_hits('de')} AS s_de,
             {_duck_lang_hits('es')} AS s_es,
             {_duck_lang_hits('zh')} AS s_zh
      FROM w
    )
    SELECT doc_id AS doc_id,
           CASE WHEN GREATEST(s_en, s_fr, s_de, s_es, s_zh) < 1 THEN 'und'
                WHEN s_en = GREATEST(s_en, s_fr, s_de, s_es, s_zh) THEN 'en'
                WHEN s_fr = GREATEST(s_en, s_fr, s_de, s_es, s_zh) THEN 'fr'
                WHEN s_de = GREATEST(s_en, s_fr, s_de, s_es, s_zh) THEN 'de'
                WHEN s_es = GREATEST(s_en, s_fr, s_de, s_es, s_zh) THEN 'es'
                ELSE 'zh' END AS detected_lang
    FROM scores
    """,
    doc="Heuristic language ID: argmax of per-language marker-word "
    "hits with deterministic first-wins tie-break, 'und' below "
    "min evidence.",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return text_analysis.detect_language_agg(d).withColumnRenamed(
        "lang", "detected_lang"
    )


@part(
    "text_fingerprint",
    """
    WITH w AS (
      SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w FROM documents
    )
    SELECT doc_id AS doc_id,
           COALESCE(
             list_min(CASE WHEN len(w) >= 5
               THEN [md5(array_to_string(w[i:i+4], ' ')) FOR i IN generate_series(1, len(w) - 4)]
               ELSE [] END),
             md5(text)) AS fingerprint
    FROM w
    """,
    doc="Document fingerprint: min-wise md5 over word 5-gram shingles "
    "(rolling-window content hash), whole-text fallback for short docs.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return text_analysis.fingerprint_agg(d, shingle_n=5)


# ---------------------------------------------------------------------------
# Event-stream analytics (batch form; streaming/ has the readStream twin)
# ---------------------------------------------------------------------------


@register(
    "events_hourly",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(value), 0) AS BIGINT) AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc="Hourly rollup by event type — the batch twin of the streaming "
    "tumbling-window aggregation.",
    headline=True,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 0).cast("long").alias("total_value"),
        )
    )


@part(
    "events_tumbling_15min",
    """
    SELECT strftime(time_bucket(INTERVAL '15 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1
    """,
    doc="Tumbling 15-minute windows via F.window (epoch-aligned, same "
    "alignment as DuckDB time_bucket).",
)
def events_tumbling_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n",
            "n_users",
        )
    )


@part(
    "events_session_window_native",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    )
    SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(user_id AS BIGINT) AS user_id,
           CAST(epoch_us(MAX(ts)) // 1000000
                - epoch_us(MIN(ts)) // 1000000 AS BIGINT) AS span_s
    FROM s GROUP BY user_id, sid
    """,
    doc="The ENGINE-NATIVE session window (F.session_window): dynamic "
    "gap-merged sessions as a single aggregation operator — one "
    "shuffle on the grouping key with the session merge inside the "
    "aggregate, vs the lag+flag-sum rewrite's two window passes "
    "(`events_sessionize` keeps that form as the portable twin). "
    "Boundary semantics pinned by an adversarial tie fixture "
    "(tests/test_advanced.py): a successor at EXACTLY gap distance "
    "MERGES (the window end is inclusive), so the island break is "
    "STRICTLY > gap — the same rule the lag rewrite uses. Real "
    "microsecond data never ties, which is why only a constructed "
    "fixture can pin this edge.",
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"), F.min("ts"), F.max("ts"))
        .select(
            F.date_format(F.col("min(ts)"), "yyyy-MM-dd HH:mm:ss").alias(
                "sess_start"
            ),
            "n_events",
            F.col("user_id").cast("long").alias("user_id"),
            (
                F.unix_seconds(F.col("max(ts)"))
                - F.unix_seconds(F.col("min(ts)"))
            ).alias("span_s"),
        )
    )


@register(
    "events_sessionize",
    """
    WITH g AS (
      SELECT user_id, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id AS user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM g GROUP BY user_id
    """,
    doc="Sessionization (gaps-and-islands): 30-min inactivity gap via "
    "LAG + flag-sum. Batch twin of the session_window streaming op.",
    headline=True,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_session = F.when(
        prev_us.isNull() | (F.unix_micros(F.col("ts")) - prev_us > 1_800_000_000),
        1,
    ).otherwise(0)
    return (
        e.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


@register(
    "multimodal_ingest",
    """
    SELECT doc_id AS sample_id,
           'text' AS modality,
           CAST(LENGTH(text) AS BIGINT) AS payload_bytes,
           md5(text) AS payload_digest
    FROM documents
    """,
    doc="Multimodal ingest plumbing: opaque binary payload column + "
    "typed metadata; filters/joins touch metadata only, never bytes. "
    "(Decode runs real BMP/WAV parsers in mapInPandas — see "
    "operators/multimodal.py and functions/codecs.py.)",
)
def multimodal_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.operators import multimodal

    media = multimodal.documents_as_media(table(spark, sf_dir, "documents"))
    return media.select(
        "sample_id",
        "modality",
        F.length(F.col("payload")).cast("long").alias("payload_bytes"),
        F.md5(F.col("payload")).alias("payload_digest"),
    )


@part(
    "multimodal_decode",
    None,  # mapInPandas stage — not runnable in DuckDB
    doc="Arrow-batched decode stage (mapInPandas): binary payload in, "
    "typed metadata out, one Python worker per core. BMP and PCM WAV "
    "payloads decode through REAL format parsers "
    "(functions/codecs.py); the mixed-modality input synthesizes "
    "genuine BMP/WAV bytes from the documents table, so the stage "
    "extracts true widths/heights/durations. Compressed codecs stay "
    "a documented production swap. See operators/multimodal.py.",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.operators import multimodal

    media = multimodal.synthesize_media(table(spark, sf_dir, "documents"))
    return multimodal.decode_media(media)


@part(
    "multimodal_features",
    None,  # mapInPandas stage — not runnable in DuckDB
    doc="Arrow-batched feature extraction: payload bytes -> fixed-size "
    "array<float> per sample — a normalized histogram over DECODED "
    "content (BMP pixels, WAV sample magnitudes; raw bytes for text). "
    "Production swaps the histogram for a model forward pass. The "
    "output feeds the embedding similarity/dedup operators directly.",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.operators import multimodal

    media = multimodal.synthesize_media(table(spark, sf_dir, "documents"))
    return multimodal.extract_features(media)


@part(
    "multimodal_frame_sample",
    None,  # mapInPandas stage — not runnable in DuckDB
    doc="Frame sampling (1:N row expansion inside mapInPandas): 4 "
    "evenly spaced frame digests per payload — the video-keyframe "
    "pipeline shape with a deterministic stub in place of a codec.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.operators import multimodal

    media = multimodal.synthesize_media(table(spark, sf_dir, "documents"))
    return multimodal.sample_frames(media)


# ---------------------------------------------------------------------------
# ANN suite (three index families, shared output contract) + profiling
# ---------------------------------------------------------------------------


# The ANN oracle reproduces all three index families end-to-end in
# DuckDB: the md5-derived +-1 hyperplanes (bit expansion from the hex
# digest), the hash-seeded IVF coarse quantizer (seed pick is a
# one-line ORDER BY md5), and the hash-seeded PQ codebooks including
# corpus encoding, ADC lookup scoring with an EXPLICIT left-to-right
# subspace sum, and the exact re-rank. Every float comes from the
# same left-fold (functions/vector.py <-> list_reduce), so buckets,
# cells, codes, and rankings are bit-identical — the driver value-
# checks the full approximate serving path, not just its row count.
_ANN_ORACLE = """
WITH phex AS (
  SELECT p, md5('rp-lsh-42|' || CAST(p AS VARCHAR) || '|0') AS hx
  FROM (SELECT unnest(range(6)) AS p)
), vb AS (
  SELECT e.vec_id,
    CAST(SUM(CASE WHEN list_reduce(
      [CASE WHEN ((16*(strpos('0123456789abcdef', substr(ph.hx, 2*(d//8)+1, 1))-1)
                  + strpos('0123456789abcdef', substr(ph.hx, 2*(d//8)+2, 1))-1) >> (d%8)) & 1 = 1
            THEN CAST(e.embedding[d+1] AS DOUBLE) ELSE -CAST(e.embedding[d+1] AS DOUBLE) END
       FOR d IN range(64)], (x, y) -> x + y) >= 0 THEN 1<<ph.p ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings e, phex ph
  GROUP BY e.vec_id
), qprobe AS (
  SELECT vec_id AS query_id,
         unnest(list_prepend(bucket, [xor(bucket, CAST(1<<p AS BIGINT)) FOR p IN range(6)])) AS bucket
  FROM vb WHERE vec_id < 10
), lsh_cand AS (
  SELECT DISTINCT qp.query_id, c.vec_id AS neighbor_id
  FROM qprobe qp JOIN vb c ON qp.bucket = c.bucket AND c.vec_id <> qp.query_id
), lsh_scored AS (
  SELECT lc.query_id, lc.neighbor_id, __DOT_QC__ AS sim
  FROM lsh_cand lc
  JOIN embeddings q ON q.vec_id = lc.query_id
  JOIN embeddings c ON c.vec_id = lc.neighbor_id
), lsh_top AS (
  SELECT query_id, neighbor_id, rnk FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
    FROM lsh_scored) WHERE rnk <= 5
), ivf_seeds AS (
  SELECT rn - 1 AS cell, embedding AS centroid FROM (
    SELECT embedding, row_number() OVER (ORDER BY md5('ivf|' || CAST(vec_id AS VARCHAR)), vec_id) AS rn
    FROM embeddings) WHERE rn <= 16
), ivf_d2 AS (
  SELECT e.vec_id, s.cell, e.embedding,
    list_reduce([(CAST(e.embedding[d+1] AS DOUBLE) - CAST(s.centroid[d+1] AS DOUBLE))
                 * (CAST(e.embedding[d+1] AS DOUBLE) - CAST(s.centroid[d+1] AS DOUBLE))
                 FOR d IN range(64)], (x, y) -> x + y) AS d2
  FROM embeddings e, ivf_seeds s
), ivf_cassign AS (
  SELECT vec_id AS neighbor_id, cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell) AS rn
    FROM ivf_d2) WHERE rn = 1
), ivf_probes AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell) AS rn
    FROM ivf_d2 WHERE vec_id < 10) WHERE rn <= 2
), ivf_scored AS (
  SELECT p.query_id, ca.neighbor_id, __DOT_QC__ AS sim
  FROM ivf_probes p
  JOIN ivf_cassign ca ON ca.cell = p.cell AND ca.neighbor_id <> p.query_id
  JOIN embeddings q ON q.vec_id = p.query_id
  JOIN embeddings c ON c.vec_id = ca.neighbor_id
), ivf_top AS (
  SELECT query_id, neighbor_id, rnk FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
    FROM ivf_scored) WHERE rnk <= 5
), pq_cb AS (
  SELECT j.j, s.c, s.w[j.j*8+1 : j.j*8+8] AS w FROM (
    SELECT rn - 1 AS c, embedding AS w FROM (
      SELECT embedding, row_number() OVER (ORDER BY md5('pq|' || CAST(vec_id AS VARCHAR)), vec_id) AS rn
      FROM embeddings) WHERE rn <= 16) s,
    (SELECT unnest(range(8)) AS j) j
), pq_codes AS (
  SELECT neighbor_id, j, c FROM (
    SELECT e.vec_id AS neighbor_id, cb.j, cb.c, row_number() OVER (
        PARTITION BY e.vec_id, cb.j ORDER BY
        list_reduce([(CAST(e.embedding[cb.j*8+d+1] AS DOUBLE) - CAST(cb.w[d+1] AS DOUBLE))
                     * (CAST(e.embedding[cb.j*8+d+1] AS DOUBLE) - CAST(cb.w[d+1] AS DOUBLE))
                     FOR d IN range(8)], (x, y) -> x + y) ASC, cb.c) AS rn
    FROM embeddings e, pq_cb cb) WHERE rn = 1
), pq_lut AS (
  SELECT q.vec_id AS query_id, cb.j, cb.c,
    list_reduce([CAST(q.embedding[cb.j*8+d+1] AS DOUBLE) * CAST(cb.w[d+1] AS DOUBLE)
                 FOR d IN range(8)], (x, y) -> x + y) AS val
  FROM embeddings q, pq_cb cb WHERE q.vec_id < 10
), pq_adc AS (
  SELECT l.query_id, co.neighbor_id,
    max(CASE WHEN l.j=0 THEN l.val END) + max(CASE WHEN l.j=1 THEN l.val END)
    + max(CASE WHEN l.j=2 THEN l.val END) + max(CASE WHEN l.j=3 THEN l.val END)
    + max(CASE WHEN l.j=4 THEN l.val END) + max(CASE WHEN l.j=5 THEN l.val END)
    + max(CASE WHEN l.j=6 THEN l.val END) + max(CASE WHEN l.j=7 THEN l.val END) AS approx_sim
  FROM pq_codes co JOIN pq_lut l ON l.j = co.j AND l.c = co.c
  WHERE co.neighbor_id <> l.query_id
  GROUP BY l.query_id, co.neighbor_id
), pq_cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx_sim DESC, neighbor_id) AS ar
    FROM pq_adc) WHERE ar <= 40
), pq_top AS (
  SELECT query_id, neighbor_id, rnk FROM (
    SELECT pc.query_id, pc.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY pc.query_id ORDER BY __DOT_QC__ DESC, pc.neighbor_id) AS rnk
    FROM pq_cand pc
    JOIN embeddings q ON q.vec_id = pc.query_id
    JOIN embeddings c ON c.vec_id = pc.neighbor_id) WHERE rnk <= 5
), ix_seeds AS (
  -- the PERSISTED index: centroids hash-picked from the STANDING
  -- corpus only (vec_id % 4 <> 0) at write time; the % 4 = 0 batch is
  -- appended later against those frozen centroids, so the final cells
  -- table assigns EVERY vector to the standing-corpus seeds
  SELECT rn - 1 AS cell, embedding AS centroid FROM (
    SELECT embedding, row_number() OVER (ORDER BY md5('ivfx|' || CAST(vec_id AS VARCHAR)), vec_id) AS rn
    FROM embeddings WHERE vec_id % 4 <> 0) WHERE rn <= 16
), ix_d2 AS (
  SELECT e.vec_id, s.cell,
    list_reduce([(CAST(e.embedding[d+1] AS DOUBLE) - CAST(s.centroid[d+1] AS DOUBLE))
                 * (CAST(e.embedding[d+1] AS DOUBLE) - CAST(s.centroid[d+1] AS DOUBLE))
                 FOR d IN range(64)], (x, y) -> x + y) AS d2
  FROM embeddings e, ix_seeds s
), ix_cassign AS (
  SELECT vec_id AS neighbor_id, cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell) AS rn
    FROM ix_d2) WHERE rn = 1
), ix_probes AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell) AS rn
    FROM ix_d2 WHERE vec_id < 10) WHERE rn <= 2
), ix_scored AS (
  SELECT p.query_id, ca.neighbor_id, __DOT_QC__ AS sim
  FROM ix_probes p
  JOIN ix_cassign ca ON ca.cell = p.cell AND ca.neighbor_id <> p.query_id
  JOIN embeddings q ON q.vec_id = p.query_id
  JOIN embeddings c ON c.vec_id = ca.neighbor_id
), ix_top AS (
  SELECT query_id, neighbor_id, rnk FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
    FROM ix_scored) WHERE rnk <= 5
), phex8 AS (
  -- the PERSISTED RP-LSH index (round 11): 8 seed-derived planes.
  -- Buckets are pure seed math (no fitted state), so the
  -- build-on-3/4 + append-1/4 lifecycle equals bucketing the full
  -- corpus — which is exactly what this reproduces.
  SELECT p, md5('rp-lsh-42|' || CAST(p AS VARCHAR) || '|0') AS hx
  FROM (SELECT unnest(range(8)) AS p)
), vb8 AS (
  SELECT e.vec_id,
    CAST(SUM(CASE WHEN list_reduce(
      [CASE WHEN ((16*(strpos('0123456789abcdef', substr(ph.hx, 2*(d//8)+1, 1))-1)
                  + strpos('0123456789abcdef', substr(ph.hx, 2*(d//8)+2, 1))-1) >> (d%8)) & 1 = 1
            THEN CAST(e.embedding[d+1] AS DOUBLE) ELSE -CAST(e.embedding[d+1] AS DOUBLE) END
       FOR d IN range(64)], (x, y) -> x + y) >= 0 THEN 1<<ph.p ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings e, phex8 ph
  GROUP BY e.vec_id
), qprobe8 AS (
  SELECT vec_id AS query_id,
         unnest(list_prepend(bucket, [xor(bucket, CAST(1<<p AS BIGINT)) FOR p IN range(8)])) AS bucket
  FROM vb8 WHERE vec_id < 10
), rpx_cand AS (
  SELECT DISTINCT qp.query_id, c.vec_id AS neighbor_id
  FROM qprobe8 qp JOIN vb8 c ON qp.bucket = c.bucket AND c.vec_id <> qp.query_id
), rpx_scored AS (
  SELECT lc.query_id, lc.neighbor_id, __DOT_QC__ AS sim
  FROM rpx_cand lc
  JOIN embeddings q ON q.vec_id = lc.query_id
  JOIN embeddings c ON c.vec_id = lc.neighbor_id
), rpx_top AS (
  SELECT query_id, neighbor_id, rnk FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
    FROM rpx_scored) WHERE rnk <= 5
)
SELECT 'rp_lsh' AS method, CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id, CAST(rnk AS BIGINT) AS rank FROM lsh_top
UNION ALL
SELECT 'ivf', query_id, neighbor_id, CAST(rnk AS BIGINT) FROM ivf_top
UNION ALL
SELECT 'pq_adc', query_id, neighbor_id, CAST(rnk AS BIGINT) FROM pq_top
UNION ALL
SELECT 'ivf_index', query_id, neighbor_id, CAST(rnk AS BIGINT) FROM ix_top
UNION ALL
SELECT 'rp_index', query_id, neighbor_id, CAST(rnk AS BIGINT) FROM rpx_top
""".replace("__DOT_QC__", _DUCK_DOT.format(a="q.embedding", b="c.embedding"))


@register(
    "ann_suite",
    _ANN_ORACLE,
    doc="Approximate nearest-neighbor suite, tagged union of five "
    "serving paths over the same 10-query workload: 'rp_lsh' "
    "(md5-derived random-hyperplane buckets + multi-probe), 'ivf' "
    "(hash-seeded coarse cells — the 0-iteration-KMeans baseline — "
    "n_probe=2), 'pq_adc' (product quantization with hash-seeded "
    "codebooks: corpus encode -> asymmetric-distance lookup scoring "
    "-> exact re-rank of the candidate set), and 'ivf_index' — the "
    "PERSISTED index artifact exercised end to end: write_ann_index "
    "on the standing corpus (vec_id % 4 <> 0), append_ann_index of "
    "the % 4 = 0 batch against the frozen centroids (no refit), then "
    "probe_ann_index at batch cost with cell-partition pruning "
    "(operators/similarity.py). Zero fitted state everywhere, so the "
    "DuckDB oracle reproduces buckets/cells/codes/rankings "
    "bit-for-bit and the driver value-checks the whole serving path "
    "INCLUDING the on-disk build/append/probe lifecycle; the "
    "KMeans-fitted ivf_topk/pq_topk remain the production tuning "
    "(recall-tested in test_similarity_recall.py). 'rp_index' "
    "(round 11) runs the same lifecycle through the PERSISTED "
    "RP-LSH artifact at planes=8/multiprobe=1 — pure seed math, so "
    "build-on-3/4 + append-1/4 provably equals full-corpus "
    "bucketing. All five share the (query_id, neighbor_id, rank) "
    "contract of knn_bruteforce.",
)
def ann_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os

    from etl_property_rumah123_spark.operators.common import scratch_base

    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    lsh = similarity.ann_topk(
        q, e, dim=64, k=5, num_planes=6, hamming_probes=1
    ).withColumn("method", F.lit("rp_lsh"))
    ivf = similarity.ivf_topk_seeded(
        q, e, k=5, n_lists=16, n_probe=2
    ).withColumn("method", F.lit("ivf"))
    pq = similarity.pq_topk_seeded(q, e, k=5, m=8, nbits=4).withColumn(
        "method", F.lit("pq_adc")
    )
    # persisted-index lifecycle: build on the standing corpus, append
    # the new batch (frozen centroids), probe through the artifact.
    # The scratch path is unique PER INVOCATION (uuid component):
    # write_ann_index deletes-then-rebuilds its path, so a path keyed
    # only by the sf-dir basename would let two concurrent runs over
    # the same dataset (bench + correctness harness) race a probe
    # against the other's delete/overwrite.
    # Unique dirs would otherwise accumulate in scratch (often a
    # tmpfs): sweep siblings idle > 1 h — long past any live run's
    # probe, so a concurrent run's index is never touched.
    import shutil as _shutil
    import time as _time
    import uuid as _uuid

    root = f"{scratch_base()}/sg_ann_index"
    try:
        for d in _os.listdir(root):
            p = f"{root}/{d}"
            if _time.time() - _os.path.getmtime(p) > 3600:
                _shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass
    idx = (
        f"{root}/"
        f"{_os.path.basename(_os.path.normpath(sf_dir))}_"
        f"{_uuid.uuid4().hex[:12]}"
    )
    # fifth member (round 11): the persisted RP-LSH index — same
    # build/append/probe lifecycle through the hyperplane artifact at
    # planes=8 (distinct from the in-memory rp_lsh member's 6, so the
    # oracle proves the persisted path computes its own answer).
    # The two artifact lifecycles are INDEPENDENT pipelines over
    # different dirs — they build on two driver threads (each with its
    # own newSession/SQLConf), overlapping instead of serializing
    # (same pattern as agg_suite's concurrent members); the probes run
    # after both land.
    rpx_dir = f"{idx}_rp"

    def _build_ivf():
        s = spark.newSession()
        es = table(s, sf_dir, "embeddings")
        similarity.write_ann_index(
            es.filter(F.col("vec_id") % 4 != 0), idx,
            n_lists=16, salt="ivfx|",
        )
        similarity.append_ann_index(
            es.filter(F.col("vec_id") % 4 == 0), idx
        )

    def _build_rp():
        s = spark.newSession()
        es = table(s, sf_dir, "embeddings")
        similarity.write_rp_index(
            es.filter(F.col("vec_id") % 4 != 0), rpx_dir,
            dim=64, num_planes=8,
        )
        similarity.append_rp_index(
            es.filter(F.col("vec_id") % 4 == 0), rpx_dir
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as ex:
        for f in [ex.submit(_build_ivf), ex.submit(_build_rp)]:
            f.result()
    ixp = similarity.probe_ann_index(q, idx, k=5, n_probe=2).withColumn(
        "method", F.lit("ivf_index")
    )
    rpx = similarity.probe_rp_index(
        q, rpx_dir, k=5, hamming_probes=1
    ).withColumn("method", F.lit("rp_index"))
    return (
        lsh.unionByName(ivf)
        .unionByName(pq)
        .unionByName(ixp)
        .unionByName(rpx)
        .select("method", "query_id", "neighbor_id", "rank")
    )


@part(
    "dq_lineitem_checks",
    """
    WITH one AS (
      SELECT COUNT(*) AS n,
        COUNT(*) FILTER (WHERE NOT COALESCE(l_quantity BETWEEN 1 AND 50, FALSE)) AS v_qty,
        COUNT(*) FILTER (WHERE NOT COALESCE(l_discount BETWEEN 0 AND 0.1, FALSE)) AS v_disc,
        COUNT(*) FILTER (WHERE NOT COALESCE(l_returnflag IN ('A','N','R'), FALSE)) AS v_flag,
        COUNT(*) FILTER (WHERE NOT COALESCE(l_extendedprice > 0, FALSE)) AS v_price,
        COUNT(*) FILTER (WHERE NOT COALESCE(l_shipdate >= TIMESTAMP '1995-06-01', FALSE)) AS v_ship
      FROM lineitem)
    SELECT 'qty_in_range' AS rule, CAST(n AS BIGINT) AS n_rows,
           CAST(v_qty AS BIGINT) AS n_violations,
           ROUND(1.0 - v_qty * 1.0 / n, 6) AS pass_rate FROM one
    UNION ALL SELECT 'discount_band', n, v_disc, ROUND(1.0 - v_disc * 1.0 / n, 6) FROM one
    UNION ALL SELECT 'returnflag_enum', n, v_flag, ROUND(1.0 - v_flag * 1.0 / n, 6) FROM one
    UNION ALL SELECT 'positive_price', n, v_price, ROUND(1.0 - v_price * 1.0 / n, 6) FROM one
    UNION ALL SELECT 'shipped_after_1995h2', n, v_ship, ROUND(1.0 - v_ship * 1.0 / n, 6) FROM one
    """,
    doc="Declarative data-quality expectations over lineitem — range, "
    "band, enum, positivity, and a date floor (deliberately violated "
    "by ~6% of rows so the counting path is exercised) — ALL checked "
    "in one groupless aggregation pass (operators/profiling.py:"
    "check_expectations): map-side conditional counts, stack-reshaped "
    "long; NULL predicate = violation.",
)
def dq_lineitem_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.operators.profiling import check_expectations

    l = table(spark, sf_dir, "lineitem")
    return check_expectations(
        l,
        {
            "qty_in_range": F.col("l_quantity").between(1, 50),
            "discount_band": F.col("l_discount").between(0.0, 0.1),
            "returnflag_enum": F.col("l_returnflag").isin("A", "N", "R"),
            "positive_price": F.col("l_extendedprice") > 0,
            "shipped_after_1995h2": F.col("l_shipdate")
            >= F.lit("1995-06-01").cast("timestamp"),
        },
    )


@register(
    "profile_table",
    """
    WITH o AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(o_orderstatus) AS c_status, COUNT(DISTINCT o_orderstatus) AS d_status,
             MIN(o_orderstatus) AS mn_status, MAX(o_orderstatus) AS mx_status,
             COUNT(o_totalprice) AS c_price, COUNT(DISTINCT o_totalprice) AS d_price,
             ROUND(CAST(MIN(o_totalprice) AS DOUBLE), 6) AS mn_price,
             ROUND(CAST(MAX(o_totalprice) AS DOUBLE), 6) AS mx_price,
             COUNT(o_custkey) AS c_cust, COUNT(DISTINCT o_custkey) AS d_cust,
             ROUND(CAST(MIN(o_custkey) AS DOUBLE), 6) AS mn_cust,
             ROUND(CAST(MAX(o_custkey) AS DOUBLE), 6) AS mx_cust
      FROM orders
    ), e AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(event_type) AS c_type, COUNT(DISTINCT event_type) AS d_type,
             MIN(event_type) AS mn_type, MAX(event_type) AS mx_type,
             COUNT(value) AS c_value, COUNT(DISTINCT value) AS d_value,
             ROUND(CAST(MIN(value) AS DOUBLE), 6) AS mn_value,
             ROUND(CAST(MAX(value) AS DOUBLE), 6) AS mx_value
      FROM events
    )
    SELECT 'orders.o_orderstatus' AS col, n_rows AS n_rows,
           n_rows - c_status AS n_null, d_status AS n_distinct,
           mn_status AS min_s, mx_status AS max_s,
           CAST(NULL AS DOUBLE) AS min_v, CAST(NULL AS DOUBLE) AS max_v
    FROM o
    UNION ALL
    SELECT 'orders.o_totalprice', n_rows, n_rows - c_price, d_price,
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), mn_price, mx_price
    FROM o
    UNION ALL
    SELECT 'orders.o_custkey', n_rows, n_rows - c_cust, d_cust,
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), mn_cust, mx_cust
    FROM o
    UNION ALL
    SELECT 'events.event_type', n_rows, n_rows - c_type, d_type,
           mn_type, mx_type, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM e
    UNION ALL
    SELECT 'events.value', n_rows, n_rows - c_value, d_value,
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), mn_value, mx_value
    FROM e
    """,
    doc="Dataset profiling (ingest data-quality gate): per-column row/"
    "null/distinct counts and ranges for orders + events, ONE "
    "aggregation scan per table reshaped long via stack — never a "
    "per-column re-scan.",
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.operators.profiling import profile_columns

    o = profile_columns(
        table(spark, sf_dir, "orders"),
        "orders",
        {
            "o_orderstatus": "string",
            "o_totalprice": "numeric",
            "o_custkey": "numeric",
        },
    )
    e = profile_columns(
        table(spark, sf_dir, "events"),
        "events",
        {"event_type": "string", "value": "numeric"},
    )
    return o.unionByName(e)


@part(
    "corpus_decontaminate",
    """
    WITH cw AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
      FROM documents WHERE doc_id % 50 <> 0
    ), csh AS (
      SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(w) >= 8
                    THEN [array_to_string(w[i:i+7], ' ')
                          FOR i IN generate_series(1, len(w) - 7)]
                    ELSE [] END)) AS s
      FROM cw
    ), ew AS (
      SELECT string_split_regex(trim(text), '\\s+') AS w
      FROM documents WHERE doc_id % 50 = 0
    ), esh AS (
      SELECT DISTINCT unnest(
               CASE WHEN len(w) >= 8
                    THEN [array_to_string(w[i:i+7], ' ')
                          FOR i IN generate_series(1, len(w) - 7)]
                    ELSE [] END) AS s
      FROM ew
    )
    SELECT c.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM csh c JOIN esh e ON c.s = e.s
    GROUP BY c.doc_id
    """,
    doc="Training/eval decontamination: corpus docs (doc_id %% 50 != 0) "
    "sharing >= 1 exact word 8-gram with the held-out eval slice — the "
    "collision test run before training-data admission. Eval shingle "
    "set is broadcast; corpus side streams.",
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tokenized_docs(spark, sf_dir)
    return dedup.ngram_contamination(
        docs.filter(F.col("doc_id") % 50 != 0),
        docs.filter(F.col("doc_id") % 50 == 0),
        shingle_n=8,
        corpus_words_col="words",
        eval_words_col="words",
    )


@part(
    "archive_ingest_roundtrip",
    """
    SELECT CAST(doc_id % 3 AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS payload_bytes,
           CAST(SUM(doc_id) AS VARCHAR) AS id_sum
    FROM documents WHERE doc_id < 60
    GROUP BY doc_id % 3
    """,
    doc="The doc_archive shard DataSource under the driver's value "
    "hash: 60 documents are packed into three deterministic zip "
    "shards (doc_id % 3; fixture built driver-side like the listing "
    "pages), read back through spark.read.format('doc_archive') — "
    "one partition per shard — and aggregated per shard with exact "
    "payload byte counts; the oracle restates the accounting straight "
    "from documents.text. A member lost, truncated, or mis-sized "
    "anywhere in the container read path fails the hash.",
)
def archive_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import zipfile

    from etl_property_rumah123_spark.sources.archive_source import (
        ArchiveDataSource,
    )

    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
        .collect()  # 60 rows: driver-side FIXTURE build, like listing pages
    )
    base = f"/tmp/sg_archive_part/{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    shards = {}
    for r in docs:
        shards.setdefault(int(r["doc_id"]) % 3, []).append(r)
    for shard_id, rows in shards.items():
        with zipfile.ZipFile(os.path.join(base, f"shard{shard_id}.zip"), "w") as zf:
            for r in sorted(rows, key=lambda x: x["doc_id"]):
                info = zipfile.ZipInfo(f"doc{r['doc_id']:06d}.txt")
                zf.writestr(info, (r["text"] or "").encode("utf-8"))

    spark.dataSource.register(ArchiveDataSource)
    df = spark.read.format("doc_archive").option("path", base).load()
    doc_id = F.regexp_extract("member", r"doc(\d+)\.txt", 1).cast("long")
    return (
        df.select(
            F.regexp_extract("archive", r"shard(\d)\.zip", 1)
            .cast("long")
            .alias("shard"),
            doc_id.alias("doc_id"),
            F.col("size"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("size").alias("payload_bytes"),
            F.sum("doc_id").cast("string").alias("id_sum"),
        )
        .select("shard", "n_docs", "payload_bytes", "id_sum")
    )


# ---------------------------------------------------------------------------
# Distributed training-side analytics (operators/ml.py)
# ---------------------------------------------------------------------------

# Shared feature/label SQL for the logistic-GD oracle: exact-integer
# features scaled by double division, label from lang. The whole
# 3-iteration descent is restated as chained CTEs whose weights are
# scalar subqueries — every reduction is an integer (micro-quantized)
# sum, so partial-aggregation order cannot flip a bit, and the link is
# the rational sigmoid (no libm exp -> bit-identical doubles).
_LOGREG_FEAT_SQL = """
feat AS (
  SELECT n_chars / 500.0 AS x1,
         (length(COALESCE(text, '')) -
          length(replace(COALESCE(text, ''), ' ', '')) + 1) / 100.0 AS x2,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents
)"""


def _logreg_iter_sql(it: int, w0: str, w1: str, w2: str) -> str:
    """One GD iteration: gradient sums g{it} from weights, then the
    updated weights w{it}. Weight refs are SQL fragments (literals for
    iteration 1, scalar subqueries after)."""
    z = f"({w0} + {w1} * x1 + {w2} * x2)"
    p = f"(0.5 + 0.5 * {z} / (1 + abs({z})))"
    return f"""
g{it} AS (
  SELECT COUNT(*)::BIGINT AS n,
         SUM(CAST(FLOOR(({p} - y) * 1000000.0) AS BIGINT))::BIGINT AS g0,
         SUM(CAST(FLOOR(({p} - y) * x1 * 1000000.0) AS BIGINT))::BIGINT AS g1,
         SUM(CAST(FLOOR(({p} - y) * x2 * 1000000.0) AS BIGINT))::BIGINT AS g2
  FROM feat
),
w{it} AS (
  SELECT {w0} - (0.5 / n) * (g0 / 1000000.0) AS w0,
         {w1} - (0.5 / n) * (g1 / 1000000.0) AS w1,
         {w2} - (0.5 / n) * (g2 / 1000000.0) AS w2
  FROM g{it}
)"""


def _logreg_oracle_sql() -> str:
    parts_sql = [_LOGREG_FEAT_SQL]
    w = ("0.0", "0.0", "0.0")
    for it in (1, 2, 3):
        parts_sql.append(_logreg_iter_sql(it, *w))
        w = tuple(f"(SELECT w{j} FROM w{it})" for j in range(3))
    branches = []
    for it in (1, 2, 3):
        for j in range(3):
            branches.append(
                f"SELECT {it} AS iter, 'w{j}' AS feature, "
                f"(SELECT g{j} FROM g{it}) AS grad_micro, "
                f"(SELECT w{j} FROM w{it}) AS weight"
            )
    return (
        "WITH " + ",".join(parts_sql) + "\n"
        + "\nUNION ALL\n".join(branches)
    )


@part(
    "logreg_train_gd",
    _logreg_oracle_sql(),
    doc="Distributed batch-gradient logistic regression (3 "
    "iterations, rational-sigmoid link) predicting lang='en' from "
    "exact-integer document features: each iteration is ONE tiny "
    "aggregate of micro-quantized per-row gradient contributions "
    "(map-side partial sums; driver folds d+1 integers and embeds the "
    "next weights as literals). The data-parallel training layout — "
    "no row shuffle at any corpus size. Oracle restates all three "
    "iterations as chained DuckDB CTEs; integer quantization makes "
    "the value hash exact across engines (operators/ml.py).",
)
def logreg_train_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.operators import ml

    docs = table(spark, sf_dir, "documents")
    text = F.coalesce(F.col("text"), F.lit(""))
    feat = docs.select(
        (F.col("n_chars") / F.lit(500.0)).alias("x1"),
        (
            (
                F.length(text)
                - F.length(F.replace(text, F.lit(" "), F.lit("")))
                + F.lit(1)
            )
            / F.lit(100.0)
        ).alias("x2"),
        F.when(F.col("lang") == "en", F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("y"),
    )
    return ml.logistic_gd_history_df(
        spark, feat, ["x1", "x2"], "y", iterations=3, lr=0.5
    )


@part(
    "embedding_gram_matrix",
    None,  # oracle attached below (built from the shared builder)
    doc="placeholder",
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.operators import ml

    return ml.gram_matrix_micro(
        table(spark, sf_dir, "embeddings"), "embedding", dims=8
    )


def _install_gram_oracle() -> None:
    from etl_property_rumah123_spark.operators import ml
    from etl_property_rumah123_spark.plans import PARTS

    spec = PARTS["embedding_gram_matrix"]
    spec.oracle = ml.gram_matrix_micro_sql("embeddings", "embedding", 8)
    spec.doc = (
        "Gram/covariance-matrix accumulation over the first 8 "
        "embedding dims (the distributed half of PCA): one aggregate "
        "of d*(d+1)/2 micro-quantized partial products (map-side "
        "outer-product combine, single 1-row reduce) unpivoted to "
        "(i, j, value) rows plus a (-1,-1,count) size row; eigen-"
        "decomposition is then a driver-side d x d problem. Integer "
        "quantization per row keeps the cross-engine hash exact "
        "(operators/ml.py)."
    )


_install_gram_oracle()


_BLOOM_POS_SQL = ", ".join(
    f"(CAST('0x' || substr(digest, {1 + 4 * s}, 4) AS BIGINT) % 1024)"
    for s in range(3)
)

_BLOOM_ORACLE = f"""
WITH admitted AS (
  SELECT md5(text) AS digest FROM documents WHERE doc_id % 5 <> 0
),
build_pos AS (
  SELECT unnest([{_BLOOM_POS_SQL}]) AS pos FROM admitted
),
bitmap AS (
  SELECT CAST(pos >> 5 AS BIGINT) AS word_idx,
         BIT_OR(CAST(1 AS BIGINT) << (CAST(pos AS INTEGER) & 31)) AS bits
  FROM build_pos GROUP BY 1
),
probe AS (
  SELECT doc_id, md5(text) AS digest FROM documents WHERE doc_id % 5 = 0
),
probe_pos AS (
  SELECT doc_id, unnest([{_BLOOM_POS_SQL}]) AS pos FROM probe
),
hits AS (
  SELECT p.doc_id,
         CASE WHEN COALESCE(b.bits, 0)
                   & (CAST(1 AS BIGINT) << (CAST(p.pos AS INTEGER) & 31))
                   <> 0
              THEN 1 ELSE 0 END AS hit
  FROM probe_pos p
  LEFT JOIN bitmap b ON CAST(p.pos >> 5 AS BIGINT) = b.word_idx
),
maybe AS (
  SELECT doc_id, CAST(MIN(hit) AS INT) AS maybe_present
  FROM hits GROUP BY doc_id
),
truth AS (
  SELECT p.doc_id,
         CAST(CASE WHEN p.digest IN (SELECT digest FROM admitted)
              THEN 1 ELSE 0 END AS INT) AS truly_present
  FROM probe p
)
SELECT m.doc_id AS doc_id, m.maybe_present AS maybe_present,
       t.truly_present AS truly_present
FROM maybe m JOIN truth t ON m.doc_id = t.doc_id
"""


@part(
    "bloom_membership_prune",
    _BLOOM_ORACLE,
    doc="Bloom-filter membership pruning (1024 bits as 32 bit_or'd "
    "words, k=3 md5-slice hashes): the admitted corpus builds the "
    "bitmap with map-side bit_or partial aggregation; the probe slice "
    "joins the broadcast bitmap and ANDs its k bits. The runtime-"
    "filter / semi-join-pruning shape that lets a 100 TB probe skip "
    "shuffling rows that cannot match. truly_present (exact semi-"
    "join ground truth) rides along so the driver hash pins the "
    "no-false-negatives guarantee (operators/ml.py).",
)
def bloom_membership_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.operators import ml

    docs = table(spark, sf_dir, "documents")
    admitted = docs.filter(F.col("doc_id") % 5 != 0).select(
        F.col("text").alias("key")
    )
    probe = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.col("text").alias("key")
    )
    bitmap = ml.bloom_build(admitted, "key")
    maybe = ml.bloom_probe(probe, bitmap, key_col="key", id_col="doc_id")
    admitted_digests = admitted.select(
        F.md5(F.col("key")).alias("digest")
    ).distinct()
    truth = (
        # hash equi-join on digest, deliberately NOT broadcast: the
        # admitted digest set is corpus-sized at scale (AQE may still
        # choose broadcast at test SFs)
        probe.withColumn("digest", F.md5(F.col("key")))
        .join(
            admitted_digests.withColumn("present", F.lit(1)),
            "digest",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce(F.col("present"), F.lit(0))
            .cast("int")
            .alias("truly_present"),
        )
    )
    return maybe.join(truth, "doc_id").select(
        "doc_id", "maybe_present", "truly_present"
    )


_PAGERANK_EDGES_SQL = """
SELECT o_custkey AS src, l_suppkey + 1000000 AS dst
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
UNION ALL
SELECT l_suppkey + 1000000 AS src, o_custkey AS dst
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
"""


def _pagerank_oracle() -> str:
    from etl_property_rumah123_spark.operators import ml

    return ml.pagerank_micro_sql(_PAGERANK_EDGES_SQL, iterations=3)


@part(
    "pagerank_bipartite",
    _pagerank_oracle(),
    doc="Fixed-point-quantized PageRank (3 iterations, damping 0.85) "
    "over the customer<->supplier trade graph (both directions of the "
    "orders x lineitem relation): ranks are BIGINT micro-units, "
    "contributions integer divisions, updates teleport + "
    "floor(damping * integer sum) - every reduction an exact integer "
    "sum, so the iterative computation value-hashes identically "
    "across engines. Per iteration: hash equi-join of ranks onto "
    "edges (AQE skew-split eligible) + groupBy-dst with map-side "
    "partial sums, composed lazily with no driver-side state - the "
    "canonical iterative-graph layout at any scale "
    "(operators/ml.py:pagerank_micro).",
)
def pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.operators import ml

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("cust"),
        (F.col("l_suppkey") + F.lit(1000000)).alias("supp"),
    )
    edges = pairs.select(
        F.col("cust").alias("src"), F.col("supp").alias("dst")
    ).union(
        pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    )
    return ml.pagerank_micro(edges, iterations=3)


def _kmeans_oracle() -> str:
    from etl_property_rumah123_spark.operators import ml

    return ml.kmeans_lloyd_micro_sql(
        "embeddings", "embedding", "vec_id", dims=8, k=4, iterations=2
    )


@part(
    "kmeans_lloyd",
    _kmeans_oracle(),
    doc="Distributed Lloyd's KMeans (k=4 over the first 8 embedding "
    "dims, 2 iterations): centroids broadcast as literals, assignment "
    "a pure-expression squared-distance argmin (left-associated term "
    "tree, array_position tie-break), update a k-row aggregate of "
    "micro-quantized component sums - exact integer partials make "
    "the iterative computation value-hash identically across engines "
    "(same trick as logreg/pagerank). Driver traffic is k x (d+1) "
    "numbers per iteration; rows/shuffles never leave the executors. "
    "Output: (cluster, dim, value) with dim -1 = member count, 0 = "
    "micro inertia, 1..8 = component micro-sums "
    "(operators/ml.py:kmeans_lloyd_micro).",
)
def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_property_rumah123_spark.operators import ml

    return ml.kmeans_lloyd_micro(
        table(spark, sf_dir, "embeddings"),
        "embedding",
        "vec_id",
        dims=8,
        k=4,
        iterations=2,
    )


_BM25_TERMS = ("hash", "join", "vector", "stream")


@part(
    "text_bm25_topk",
    """
    WITH dl AS (
      SELECT doc_id,
             string_split_regex(trim(lower(text)), '\\s+') AS w,
             CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS dl
      FROM documents
    ), stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(dl) AS DOUBLE) AS sdl FROM dl
    ), tf AS (
      SELECT doc_id, dl, t, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, dl, unnest(w) AS t FROM dl)
      WHERE t IN ('hash', 'join', 'vector', 'stream')
      GROUP BY doc_id, dl, t
    ), dft AS (
      SELECT t, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY t
    ), scored AS (
      SELECT tf.doc_id,
             CAST(FLOOR(
               LN(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * CAST(tf.dl AS DOUBLE) / (s.sdl / s.n)))
               * 1000000.0) AS BIGINT) AS c
      FROM tf JOIN dft d ON tf.t = d.t CROSS JOIN stats s
    )
    SELECT doc_id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
           CAST(SUM(c) AS BIGINT) AS score_micro
    FROM scored GROUP BY doc_id
    ORDER BY score_micro DESC, doc_id
    LIMIT 10
    """,
    doc="Okapi BM25 retrieval (k1=1.2, b=0.75) for a fixed 4-term "
    "query over the corpus: per-(doc, term) tf is one map-side-"
    "combined shuffle carrying only query-term hits, per-term df and "
    "the corpus stats broadcast into the scoring join, top-10 via "
    "TakeOrdered (no global sort). Per-term contributions are "
    "floor-micro-quantized BEFORE the per-doc sum, so scores are "
    "accumulation-order-free and hash-exact vs the oracle "
    "(operators/text_analysis.py:bm25_topk).",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return text_analysis.bm25_topk(d, _BM25_TERMS, k=10)


_STRIKE_N = 8


@part(
    "corpus_span_strike",
    f"""
    WITH w0 AS (
      SELECT doc_id,
             string_split_regex(trim(coalesce(text, '')), '\\s+') AS w
      FROM documents
    ), sh AS (
      SELECT doc_id, s['p'] AS p, s['h'] AS h
      FROM (
        SELECT doc_id,
               unnest(CASE WHEN len(w) >= {_STRIKE_N}
                      THEN [{{'p': i,
                             'h': md5(array_to_string(w[i:i+{_STRIKE_N - 1}], ' '))}}
                            FOR i IN generate_series(1, len(w) - {_STRIKE_N - 1})]
                      ELSE [] END) AS s
        FROM w0
      )
    ), rep AS (
      SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM sh GROUP BY h)
      WHERE nd >= 2
    ), cov AS (
      SELECT DISTINCT doc_id, cp FROM (
        SELECT sh.doc_id, unnest(generate_series(sh.p, sh.p + {_STRIKE_N - 1})) AS cp
        FROM sh JOIN rep ON sh.h = rep.h
      )
    ), covc AS (
      SELECT doc_id, COUNT(*) AS ncov FROM cov GROUP BY doc_id
    )
    SELECT w0.doc_id AS doc_id,
           CAST(len(w0.w) AS BIGINT) AS n_tokens,
           CAST(COALESCE(covc.ncov, 0) AS BIGINT) AS n_covered,
           CAST(len(w0.w) - COALESCE(covc.ncov, 0) AS BIGINT) AS n_retained
    FROM w0 LEFT JOIN covc ON w0.doc_id = covc.doc_id
    """,
    doc="Span-STRIKING accounting — the removal half of exact-"
    "substring dedup (Lee et al.), paired with the corpus_repeated_"
    "spans detector: per doc, the count of token positions covered by "
    "any cross-doc repeated 8-token window (the tokens a striking "
    "pass deletes) and the retained remainder. Positional windows "
    "ride the same shuffle-free arrays_zip+posexplode construction as "
    "shingle_rows (the position IS the window start — no sort, no "
    "window function); only windows joining the repeated-digest set "
    "pay the x8 coverage explode, so a clean corpus costs zero "
    "coverage shuffle. operators/dedup.py:strike_repeated_spans.",
)
def corpus_span_strike(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.strike_repeated_spans(
        tokenized_docs(spark, sf_dir), span_n=_STRIKE_N, words_col="words"
    )
