"""Distributed training-side analytics: the aggregate shapes a model
pipeline runs OVER the corpus — batch-gradient logistic regression,
gram/covariance-matrix accumulation for PCA, and Bloom-filter
membership pruning. None of these exist in the reference (a
single-machine pandas ETL, /root/reference/src/transform.py:5-95);
they extend the engine toward the 100 TB training-data stack.

Scale shapes (what makes these 1000-executor clean):
- **Gradient descent** = one tiny ``agg`` per iteration: every
  executor computes partial sums of per-row gradient contributions
  (map-side combine), the driver folds d+1 numbers and re-broadcasts
  the next weight vector as literals. No shuffle of rows, ever —
  this IS the data-parallel SGD/L-BFGS layout, at any corpus size.
- **Gram matrix** = one ``agg`` of d*(d+1)/2 partial products:
  map-side outer-product accumulation, a single 1-row reduce. PCA's
  eigendecomposition then runs driver-side on the d x d result —
  the classic tall-skinny split (n huge, d small).
- **Bloom filter** = groupBy over m/32 words with ``bit_or`` partial
  aggregation; the finished bitmap is rows, tiny, and broadcast to
  probes — the runtime-filter/semi-join-pruning pattern that lets a
  100 TB probe side skip shuffling rows that cannot match.

Cross-engine exactness (the driver value-hashes results against
DuckDB): every floating-point reduction is quantized to integer
micro-units PER ROW (``floor(x * 1e6)`` as BIGINT) before summing —
integer sums are associative, so partial aggregation order cannot
flip a bit. The logistic link is the rational "fast sigmoid"
``0.5 + 0.5 * z / (1 + |z|)`` — add/mul/div/abs only, no ``exp``, so
both engines produce bit-identical doubles from identical expression
trees (libm's exp differs by ULPs across implementations; IEEE
+,*,/ do not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MICRO = 1000000.0


def logistic_gd_fit(
    feat: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iterations: int = 3,
    lr: float = 0.5,
) -> list[dict]:
    """Batch gradient descent for logistic regression with the
    rational sigmoid link. ``feat`` columns must be DOUBLE; a bias
    term is implicit (feature "w0"). Returns per-iteration history:
    [{iter, feature, grad_micro, weight}], 3 x (d+1) entries.

    The per-iteration ``.first()`` collects d+2 numbers (counts +
    gradient sums) — the documented bounded-collect contract, same as
    the KMeans/PQ fits in ``operators/similarity.py``: driver traffic
    is O(d * iterations), independent of corpus size.
    """
    d = len(feature_cols)
    weights = [0.0] * (d + 1)
    history: list[dict] = []
    n = None
    for it in range(1, iterations + 1):
        z = F.lit(weights[0])
        for j, c in enumerate(feature_cols):
            z = z + F.lit(weights[j + 1]) * F.col(c)
        p = F.lit(0.5) + F.lit(0.5) * z / (F.lit(1.0) + F.abs(z))
        resid = p - F.col(label_col)
        aggs = [F.count(F.lit(1)).alias("n")]
        aggs.append(
            F.sum(F.floor(resid * F.lit(MICRO)).cast("long")).alias("g0")
        )
        for j, c in enumerate(feature_cols):
            aggs.append(
                F.sum(
                    F.floor(resid * F.col(c) * F.lit(MICRO)).cast("long")
                ).alias(f"g{j + 1}")
            )
        row = feat.agg(*aggs).first()
        n = row["n"]
        if not n:
            raise ValueError(
                "logistic_gd_fit: empty training input (0 rows)"
            )
        grads = [row[f"g{j}"] for j in range(d + 1)]
        # identical expression tree to the oracle SQL:
        # w - lr/n * (g/1e6)  ==  w - ((lr/n) * (g/1000000.0))
        weights = [
            w - (lr / n) * (g / MICRO) for w, g in zip(weights, grads)
        ]
        for j in range(d + 1):
            history.append(
                {
                    "iter": it,
                    "feature": f"w{j}",
                    "grad_micro": int(grads[j]),
                    "weight": float(weights[j]),
                }
            )
    return history


def logistic_gd_history_df(
    spark: SparkSession,
    feat: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iterations: int = 3,
    lr: float = 0.5,
) -> DataFrame:
    hist = logistic_gd_fit(feat, feature_cols, label_col, iterations, lr)
    return spark.createDataFrame(
        [(h["iter"], h["feature"], h["grad_micro"], h["weight"]) for h in hist],
        "iter int, feature string, grad_micro bigint, weight double",
    )


def gram_matrix_micro(
    df: DataFrame, vec_col: str, dims: int
) -> DataFrame:
    """Upper-triangular gram-matrix accumulation over the first
    ``dims`` vector components, micro-quantized per row: rows
    (i, j, value) for 1 <= i <= j <= dims (1-based, matching SQL list
    indexing) where value = sum(floor(v_i * v_j * 1e6)), plus one
    (-1, -1, count) size row. Covariance/PCA follows driver-side from
    this d x d summary — the only distributed work is ONE partial-agg
    reduction of d*(d+1)/2 integers."""

    def comp(i: int):
        return F.element_at(F.col(vec_col), i).cast("double")

    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    pairs = []
    for i in range(1, dims + 1):
        for j in range(i, dims + 1):
            pairs.append((i, j))
            aggs.append(
                F.sum(
                    F.floor(comp(i) * comp(j) * F.lit(MICRO)).cast("long")
                ).alias(f"p_{i}_{j}")
            )
    agg = df.agg(*aggs)
    stack_args = ["stack(%d" % (len(pairs) + 1), "-1L, -1L, n"]
    for i, j in pairs:
        stack_args.append(f"{i}L, {j}L, p_{i}_{j}")
    stack_expr = ", ".join(stack_args) + ") AS (i, j, value)"
    return agg.select(F.expr(stack_expr))


def gram_matrix_micro_sql(table: str, vec_col: str, dims: int) -> str:
    """DuckDB oracle twin of :func:`gram_matrix_micro` (1-based list
    indexing, identical expression tree inside floor)."""
    sums = ["COUNT(*)::BIGINT AS n"]
    pairs = []
    for i in range(1, dims + 1):
        for j in range(i, dims + 1):
            pairs.append((i, j))
            sums.append(
                f"SUM(CAST(FLOOR(CAST({vec_col}[{i}] AS DOUBLE) * "
                f"CAST({vec_col}[{j}] AS DOUBLE) * 1000000.0) AS BIGINT"
                f"))::BIGINT AS p_{i}_{j}"
            )
    branches = [
        "SELECT CAST(-1 AS BIGINT) AS i, CAST(-1 AS BIGINT) AS j, "
        "n AS value FROM s"
    ]
    for i, j in pairs:
        branches.append(
            f"SELECT {i}, {j}, p_{i}_{j} FROM s"
        )
    return (
        f"WITH s AS (SELECT {', '.join(sums)} FROM {table})\n"
        + "\nUNION ALL\n".join(branches)
    )


def _kmeans_comp(vec_col: str, d: int):
    return F.element_at(F.col(vec_col), d).cast("double")


def _kmeans_assign(df: DataFrame, vec_col: str, cents, dims: int):
    """Attach (cl, dmin): squared-distance argmin over the centroid
    list, 1-based first-match tie-break (array_position), built as
    left-associated term additions so the oracle's SQL tree is
    operation-identical."""
    dists = []
    for c in cents:
        t = None
        for d in range(dims):
            diff = _kmeans_comp(vec_col, d + 1) - F.lit(c[d])
            term = diff * diff
            t = term if t is None else t + term
        dists.append(t)
    darr = F.array(*dists)
    return df.withColumn("_dl", darr).select(
        "*",
        F.array_position(F.col("_dl"), F.array_min(F.col("_dl"))).alias("cl"),
        F.array_min(F.col("_dl")).alias("dmin"),
    )


def kmeans_lloyd_micro(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dims: int = 8,
    k: int = 4,
    iterations: int = 2,
) -> DataFrame:
    """Distributed Lloyd's KMeans, cross-engine-exact: centroids are
    broadcast as literals, assignment is a pure-expression squared-
    distance argmin, and the update is a k-row aggregate of per-row
    MICRO-QUANTIZED component sums (exact integer partials — the same
    order-independence trick as the logistic GD). Initial centroids
    are the vectors of ``id_col`` 0..k-1; empty clusters keep their
    previous centroid. Driver traffic per iteration is k x (dims+1)
    numbers (the bounded-collect contract).

    Returns 1-based (cluster, dim, value) rows after ``iterations``
    assignment rounds: dim -1 carries the member count, dim 0 the
    micro-quantized within-cluster inertia, dims 1..d the component
    micro-sums — everything the driver-side centroid/covariance math
    needs, nothing float-ambiguous in the hash."""
    if iterations < 1:
        raise ValueError("kmeans_lloyd_micro needs iterations >= 1")
    init_rows = (
        df.filter(F.col(id_col) < k)
        .orderBy(id_col)
        .select(*[_kmeans_comp(vec_col, d + 1) for d in range(dims)])
        .collect()
    )
    if len(init_rows) != k:
        raise ValueError(f"need ids 0..{k - 1} present for init")
    cents = [[float(v) for v in r] for r in init_rows]

    def update_aggs():
        aggs = [F.count(F.lit(1)).cast("long").alias("n")]
        for d in range(dims):
            aggs.append(
                F.sum(
                    F.floor(
                        _kmeans_comp(vec_col, d + 1) * F.lit(MICRO)
                    ).cast("long")
                ).alias(f"s{d + 1}")
            )
        return aggs

    assigned = None
    for it in range(1, iterations + 1):
        assigned = _kmeans_assign(df, vec_col, cents, dims)
        if it == iterations:
            break
        rows = {
            r["cl"]: r
            for r in assigned.groupBy("cl").agg(*update_aggs()).collect()
        }
        cents = [
            (
                [
                    (rows[j + 1][f"s{d + 1}"] / rows[j + 1]["n"]) / MICRO
                    for d in range(dims)
                ]
                if j + 1 in rows
                else cents[j]
            )
            for j in range(k)
        ]
    fin = assigned.groupBy("cl").agg(
        *update_aggs(),
        F.sum(F.floor(F.col("dmin") * F.lit(MICRO)).cast("long")).alias(
            "inertia"
        ),
    )
    stack_items = ["-1L, n", "0L, inertia"] + [
        f"{d + 1}L, s{d + 1}" for d in range(dims)
    ]
    stack_expr = (
        f"stack({dims + 2}, " + ", ".join(stack_items) + ") AS (dim, value)"
    )
    return fin.select(F.col("cl").alias("cluster"), F.expr(stack_expr))


def kmeans_lloyd_micro_sql(
    table: str,
    vec_col: str,
    id_col: str,
    dims: int = 8,
    k: int = 4,
    iterations: int = 2,
) -> str:
    """DuckDB oracle twin of :func:`kmeans_lloyd_micro`: every
    centroid table is a single-pass pivoted 1-row CTE referenced via
    CROSS JOIN (scalar subqueries would re-inline the upstream scan
    per reference — 64+ parquet opens blew the fd limit before this
    shape); COALESCE against the previous centroid row keeps empty
    clusters stable."""
    vcasts = ", ".join(
        f"CAST({vec_col}[{d + 1}] AS DOUBLE)" for d in range(dims)
    )
    sql = [
        f"WITH e AS (SELECT {id_col} AS vid, [{vcasts}] AS v FROM {table}),"
    ]
    init_cols = ", ".join(
        f"MAX(CASE WHEN vid = {j} THEN v[{d + 1}] END) AS c{j}_{d + 1}"
        for j in range(k)
        for d in range(dims)
    )
    sql.append(f"cent1 AS (SELECT {init_cols} FROM e WHERE vid < {k}),")

    def dist_expr(j: int) -> str:
        terms = [
            f"((v[{d + 1}] - c{j}_{d + 1}) * (v[{d + 1}] - c{j}_{d + 1}))"
            for d in range(dims)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = f"({out} + {t})"
        return out

    for it in range(1, iterations + 1):
        dls = ", ".join(dist_expr(j) for j in range(k))
        sql.append(
            f"a{it} AS (SELECT vid, v, [{dls}] AS dl "
            f"FROM e CROSS JOIN cent{it}),"
        )
        sql.append(
            f"asg{it} AS (SELECT vid, v, "
            f"list_indexof(dl, list_min(dl)) AS cl, "
            f"list_min(dl) AS dmin FROM a{it}),"
        )
        if it == iterations:
            break
        ssum = ", ".join(
            f"SUM(CAST(FLOOR(v[{d + 1}] * 1000000.0) AS BIGINT))::BIGINT "
            f"AS s{d + 1}"
            for d in range(dims)
        )
        sql.append(
            f"upd{it} AS (SELECT cl, COUNT(*)::BIGINT AS n, {ssum} "
            f"FROM asg{it} GROUP BY cl),"
        )
        pivot = ", ".join(
            f"MAX(CASE WHEN cl = {j + 1} THEN (s{d + 1} / n) / 1000000.0 "
            f"END) AS m{j}_{d + 1}"
            for j in range(k)
            for d in range(dims)
        )
        nxt = ", ".join(
            f"COALESCE(p.m{j}_{d + 1}, c.c{j}_{d + 1}) AS c{j}_{d + 1}"
            for j in range(k)
            for d in range(dims)
        )
        sql.append(
            f"cent{it + 1} AS (SELECT {nxt} FROM "
            f"(SELECT {pivot} FROM upd{it}) p CROSS JOIN cent{it} c),"
        )
    ssum = ", ".join(
        f"SUM(CAST(FLOOR(v[{d + 1}] * 1000000.0) AS BIGINT))::BIGINT "
        f"AS s{d + 1}"
        for d in range(dims)
    )
    sql.append(
        f"fin AS (SELECT cl, COUNT(*)::BIGINT AS n, {ssum}, "
        f"SUM(CAST(FLOOR(dmin * 1000000.0) AS BIGINT))::BIGINT AS inertia "
        f"FROM asg{iterations} GROUP BY cl)"
    )
    branches = [
        "SELECT cl AS cluster, CAST(-1 AS BIGINT) AS dim, n AS value FROM fin",
        "SELECT cl, 0, inertia FROM fin",
    ] + [f"SELECT cl, {d + 1}, s{d + 1} FROM fin" for d in range(dims)]
    return "\n".join(sql) + "\n" + "\nUNION ALL\n".join(branches)


def pagerank_micro(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping_micro: float = 0.85,
    teleport_micro: int = 150000,
) -> DataFrame:
    """Fixed-point-quantized PageRank: ranks live as BIGINT micro
    units (initial 1e6 per node), contributions are integer divisions
    ``rank div out_degree``, and each update is
    ``teleport + floor(damping * sum(contributions))`` — every
    reduction an exact integer sum, the one float op a deterministic
    IEEE multiply, so the whole 3-iteration computation value-hashes
    identically across engines (same trick as the logistic GD above).

    Shape per iteration: join ranks onto edges by source (hash
    equi-join, AQE skew-split eligible) + groupBy destination with
    map-side partial sums — the canonical iterative-graph layout that
    survives a 100x scale-up; no driver-side state. The deduplicated
    edge set is materialized ONCE (``localCheckpoint``): it feeds the
    degree table, the node list (twice via the union), and every
    iteration's join, so leaving it lazy re-runs the upstream edge
    build ~6x — measured 10x super-linear at the sf10 drill before
    this pin. Returns (node, degree, rank_micro) after ``iterations``
    rounds."""
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    ranks = nodes.select("node", F.lit(1000000).cast("long").alias("r"))
    ed = e.join(deg, "src")
    for _ in range(iterations):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(F.col("dst"), F.expr("r div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.lit(teleport_micro).cast("long")
                + F.floor(
                    F.lit(damping_micro)
                    * F.coalesce(F.col("s"), F.lit(0)).cast("double")
                )
            ).alias("r"),
        )
    return (
        ranks.join(
            deg.withColumnRenamed("src", "node"), "node", "left"
        )
        .select(
            "node",
            F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("degree"),
            F.col("r").alias("rank_micro"),
        )
    )


def pagerank_micro_sql(
    edges_cte: str,
    iterations: int = 3,
    damping_micro: float = 0.85,
    teleport_micro: int = 150000,
) -> str:
    """DuckDB oracle twin: the same quantized iterations as chained
    CTEs. ``edges_cte`` is a SELECT producing (src, dst) BIGINT rows
    (pre-distinct not required)."""
    sql = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_cte})),",
        "deg AS (SELECT src, COUNT(*)::BIGINT AS deg FROM e GROUP BY src),",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),",
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),",
    ]
    for it in range(1, iterations + 1):
        sql.append(
            f"c{it} AS (SELECT e.dst, SUM(r.r // d.deg)::BIGINT AS s "
            f"FROM e JOIN deg d ON e.src = d.src "
            f"JOIN r{it - 1} r ON e.src = r.node GROUP BY e.dst),"
        )
        sql.append(
            f"r{it} AS (SELECT n.node, CAST({teleport_micro} AS BIGINT) + "
            f"CAST(FLOOR({damping_micro} * "
            f"CAST(COALESCE(c.s, 0) AS DOUBLE)) AS BIGINT) AS r "
            f"FROM nodes n LEFT JOIN c{it} c ON n.node = c.dst),"
        )
    sql.append(
        f"fin AS (SELECT r.node, COALESCE(d.deg, 0)::BIGINT AS degree, "
        f"r.r AS rank_micro "
        f"FROM r{iterations} r LEFT JOIN deg d ON r.node = d.src)"
    )
    return "\n".join(sql) + "\nSELECT node, degree, rank_micro FROM fin"


# --- Bloom filter ---------------------------------------------------------

BLOOM_BITS = 1024  # 32 words x 32 bits
BLOOM_WORD_BITS = 32
BLOOM_K = 3


def _bloom_positions(digest):
    """k = 3 positions from disjoint 4-hex-digit slices of the md5
    digest — independent 16-bit hashes reduced mod m, computable
    identically in Spark (conv) and DuckDB (0x cast)."""
    return [
        F.pmod(
            F.conv(F.substring(digest, 1 + 4 * s, 4), 16, 10).cast("long"),
            F.lit(BLOOM_BITS),
        )
        for s in range(BLOOM_K)
    ]


def _bloom_positions_sql(digest: str) -> list[str]:
    return [
        f"(CAST('0x' || substr({digest}, {1 + 4 * s}, 4) AS BIGINT) "
        f"% {BLOOM_BITS})"
        for s in range(BLOOM_K)
    ]


def bloom_build(df: DataFrame, key_col: str) -> DataFrame:
    """Build the bitmap: rows (word_idx, bits) — at most m/32 rows,
    produced by a ``bit_or`` partial aggregation (each map task folds
    its keys locally; the reduce merges 32-long bitmaps)."""
    digest = F.md5(F.col(key_col))
    pos = F.explode(F.array(*_bloom_positions(digest))).alias("pos")
    return (
        df.select(pos)
        # word = pos >> 5, bit = pos & 31: pure shifts/masks so the
        # DuckDB twin is the literally identical integer expression
        .groupBy(
            F.shiftright(F.col("pos").cast("int"), 5)
            .cast("long")
            .alias("word_idx")
        )
        .agg(
            # shiftleft needs a literal bit count in the Python API;
            # the variable-shift form goes through expr
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos AS INT) & 31)")
            ).alias("bits")
        )
    )


def bloom_probe(
    probe: DataFrame, bitmap: DataFrame, key_col: str, id_col: str
) -> DataFrame:
    """Probe: each key's k bit positions left-join the (broadcast)
    bitmap; present iff every bit is set. No false negatives by
    construction; false positives bounded by (1-e^{-kn/m})^k."""
    digest = F.md5(F.col(key_col))
    pos = F.explode(F.array(*_bloom_positions(digest))).alias("pos")
    probed = (
        probe.select(F.col(id_col), pos)
        .withColumn(
            "word_idx",
            F.shiftright(F.col("pos").cast("int"), 5).cast("long"),
        )
        .join(F.broadcast(bitmap), "word_idx", "left")
        .withColumn(
            "hit",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(
                    F.expr(
                        "shiftleft(CAST(1 AS BIGINT), CAST(pos AS INT) & 31)"
                    )
                )
                != 0
            ).cast("int"),
        )
    )
    return probed.groupBy(id_col).agg(
        F.min("hit").cast("int").alias("maybe_present")
    )


def cached_embed(
    docs: DataFrame,
    cache_path: str,
    embed,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """CONTENT-ADDRESSED EMBEDDING CACHE — the "never embed the same
    bytes twice" pattern a 100 TB corpus pipeline lives on, since the
    embedder (a GPU model in production; any deterministic
    DataFrame -> DataFrame function here) dwarfs every other per-byte
    cost and recrawls/dedups re-present mostly-unchanged content.

    Probe-then-extend against a snapshot-log table keyed by the md5
    content digest:

    1. digest each doc (JVM-side md5, no UDF);
    2. broadcast-probe the cache snapshot (empty on first run);
    3. run ``embed(misses_df) -> (digest, embedding)`` ONLY on digests
       not yet cached (distinct digests, so in-batch duplicates embed
       once);
    4. append the new rows as a snapshot version (atomic; concurrent
       runs may race the same digest — duplicates are collapsed at
       probe time by a keep-any distinct, and embeddings are
       deterministic per digest, so either copy is the same answer);
    5. return (docs joined with embeddings, stats dict).

    The cache table composes with the rest of the log: time travel
    pins "which cache did run X use", vacuum ages it, compaction
    folds the per-run small files.
    """
    spark = docs.sparkSession
    from etl_property_rumah123_spark.sinks import table_log

    tagged = docs.withColumn("__digest", F.md5(F.coalesce(F.col(text_col), F.lit(""))))
    try:
        cache = (
            table_log.read_snapshot(spark, cache_path)
            .dropDuplicates(["digest"])
        )
    except ValueError:  # no snapshots yet: empty cache
        cache = None
    if cache is not None:
        hits = tagged.join(
            F.broadcast(cache), tagged["__digest"] == cache["digest"], "left"
        )
        misses = hits.filter(F.col("digest").isNull())
    else:
        hits = None
        misses = tagged
    miss_docs = misses.select(
        F.col("__digest").alias("digest"), F.col(text_col).alias("text")
    ).dropDuplicates(["digest"])
    new_rows = embed(miss_docs)  # must return (digest, embedding)
    n_new = new_rows.count()
    if n_new:
        table_log.commit_snapshot(new_rows, cache_path, mode="append")
    full_cache = table_log.read_snapshot(spark, cache_path).dropDuplicates(
        ["digest"]
    )
    out = tagged.join(
        F.broadcast(full_cache),
        tagged["__digest"] == full_cache["digest"],
        "left",
    ).drop("__digest", "digest", "text_cached")
    n_docs = docs.count()
    return out, {
        "n_docs": n_docs,
        "n_embedded": n_new,
        "n_cache_hits": n_docs - misses.count() if cache is not None else 0,
    }
