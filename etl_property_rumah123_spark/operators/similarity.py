"""Similarity search over embedding columns.

Two paths, per the north star:

- **brute-force top-k** (ground truth): query set x corpus join, dot
  product (== cosine on unit vectors), per-query top-k window. The
  corpus side streams; only (query_id, corpus_id, score) reach the
  shuffle. Correct at any scale but O(|Q| * n) — right when |Q| is
  small or as the in-bucket verifier.
- **bucketed ANN** (scale path): random-hyperplane LSH (sign bits of
  projections onto deterministic pseudo-random unit vectors) or
  IVF-style coarse quantization; candidates come from the query's
  bucket (+ optional multi-probe), then exact scoring inside buckets.
  Turns the n in O(|Q| * n) into the bucket size.

The projection vectors are derived from md5 of (table_seed, plane,
dim) — fully deterministic, no fitted state to ship, reproducible
across runs and engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_property_rumah123_spark.functions.vector import dot


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side should be small (it is broadcast); ranking uses a
    per-query window with a deterministic (score desc, id) tiebreak.
    Output: (query_id, neighbor_id, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", dot(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _hyperplane(seed: str, plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random +-1 hyperplane from md5 bits."""
    out: list[float] = []
    i = 0
    while len(out) < dim:
        h = hashlib.md5(f"{seed}|{plane}|{i}".encode()).digest()
        for byte in h:
            for bit in range(8):
                if len(out) >= dim:
                    break
                out.append(1.0 if (byte >> bit) & 1 else -1.0)
        i += 1
    return out


def rp_lsh_buckets(
    df: DataFrame,
    dim: int,
    num_planes: int = 8,
    vec_col: str = "embedding",
    seed: str = "rp-lsh-42",
) -> DataFrame:
    """Attach a random-hyperplane LSH bucket id (sign-bit code).

    Vectors with high cosine similarity agree on most sign bits, so
    near neighbors concentrate in the same bucket. The planes are
    constant literal arrays compiled into the plan — no fitted model,
    no broadcast needed.
    """
    code = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(seed, p, dim)])
        bit = (dot(F.col(vec_col), plane) >= 0).cast("long")
        code = code.bitwiseOR(F.shiftleft(bit, p))
    return df.withColumn("bucket", code)


def ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    hamming_probes: int = 0,
) -> DataFrame:
    """Approximate top-k: exact scoring restricted to the query's LSH
    bucket(s). Recall knobs: fewer planes -> bigger buckets; and
    **multi-probe** (``hamming_probes=1``): each query also probes the
    ``num_planes`` buckets one sign-flip away — the standard trick that
    buys most of a second hash table's recall for zero extra corpus
    state (only the tiny query side fans out). Output:
    (query_id, neighbor_id, rank)."""
    qb = rp_lsh_buckets(queries, dim, num_planes, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    if hamming_probes >= 1:
        flips = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << p).cast("long"))
                for p in range(num_planes)
            ],
        )
        qb = qb.withColumn("bucket", F.explode(flips))
    cb = rp_lsh_buckets(corpus, dim, num_planes, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket"
    )
    scored = (
        qb.join(cb, "bucket")
        .select("query_id", "neighbor_id", "qv", "cv")
        .distinct()  # multi-probe may reach one candidate via 2 buckets
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", dot(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    nbits: int = 4,
    vec_col: str = "embedding",
    sample_size: int = 2048,
    seed: int = 42,
    iters: int = 10,
):
    """Train product-quantization codebooks: split the vector into
    ``m`` subspaces, k-means (k = 2**nbits) each subspace on a bounded
    corpus sample.

    The codebook is a model artifact (m * 2**nbits * dim/m floats —
    a few KB), trained on a driver-side SAMPLE exactly like the IVF
    centroids: at 100 TB you sample a few thousand vectors, never the
    corpus. Deterministic: fixed seed, fixed Lloyd iteration count.
    Returns a numpy array of shape (m, 2**nbits, dim//m).
    """
    import numpy as np

    sample = corpus.select(vec_col).limit(sample_size).collect()
    X = np.array([r[0] for r in sample], dtype=np.float64)
    n, dim = X.shape
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub, ksub = dim // m, 2 ** nbits
    rng = np.random.RandomState(seed)
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        sub = X[:, j * dsub : (j + 1) * dsub]
        cent = sub[rng.choice(n, size=ksub, replace=n < ksub)].copy()
        for _ in range(iters):  # Lloyd
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                pts = sub[assign == c]
                if len(pts):
                    cent[c] = pts.mean(axis=0)
        books[j] = cent
    return books


def pq_encode(
    df: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode vectors to PQ codes: per subspace, the index of the
    nearest codebook centroid — m small ints per vector instead of
    dim floats (the 32x+ index compression that makes billion-vector
    ANN fit in memory). One Arrow-batched corpus pass; the codes
    table is the reusable serving artifact."""
    m, ksub, dsub = codebooks.shape
    books = codebooks  # closure-captured; broadcast with the task

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(X), m), dtype=np.int32)
            for j in range(m):
                sub = X[:, j * dsub : (j + 1) * dsub]
                d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"nid": pdf[id_col], "codes": list(codes)}
            )

    return df.select(id_col, vec_col).mapInPandas(
        kernel, schema="nid long, codes array<int>"
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m: int = 8,
    nbits: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    refine_factor: int = 8,
    max_queries: int = 100_000,
) -> DataFrame:
    """PQ-ADC approximate top-k with exact re-ranking.

    Pipeline: train codebooks on a sample -> encode the corpus
    (Arrow-batched pass, m bytes/vector) -> asymmetric distance
    computation: each query precomputes an m x 2**nbits inner-product
    lookup table against the codebooks, so scoring a corpus vector is
    m table lookups on its codes, never a d-dim dot product ->
    top ``k * refine_factor`` candidates per query by ADC score ->
    exact re-rank of just those candidates against the true vectors.
    ``refine_factor`` trades candidate-set size for recall: tightly
    clustered corpora need a wider set because ADC error exceeds the
    sim gap between near-tied neighbors (8x is recall 1.0 on the
    clustered test fixture; 4x drops to ~0.65).

    Scale shape: queries are collected (small by contract, same as the
    broadcast in brute_force_topk) — the collect is BOUNDED by
    ``max_queries`` with the limit applied before it, so a caller that
    violates the small-query-batch contract gets a loud error naming
    the knob instead of a silent driver flood (each query also costs
    an m x 2**nbits LUT row, so the cap bounds the broadcast LUT too).
    The corpus is touched twice — once to encode (reusable artifact),
    once streaming code lookups — and the only shuffle carries
    (query, candidate, score) triples.
    Output: (query_id, neighbor_id, rank), same contract as ann_topk.
    """
    import numpy as np

    books = train_pq_codebooks(corpus, m, nbits, vec_col, seed=seed)
    _, ksub, dsub = books.shape
    q_rows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"pq_topk received a query batch larger than max_queries="
            f"{max_queries}: the query side is collected to the driver "
            "to build the ADC lookup tables, so an unbounded batch is a "
            "driver OOM. Split the batch, or raise max_queries if the "
            "driver really has the memory."
        )
    q_ids = np.array([r[0] for r in q_rows])
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    # LUT[q, j, c] = <query_q subspace_j, centroid_c> ; ADC score =
    # sum_j LUT[q, j, codes_j] ~= full dot product
    lut = np.einsum(
        "qjd,jcd->qjc",
        Q.reshape(len(Q), m, dsub),
        books,
    )

    codes = pq_encode(corpus, books, vec_col, id_col)

    def score_kernel(batches):
        import pandas as pd

        for pdf in batches:
            C = np.stack(pdf["codes"].to_numpy())  # (b, m)
            # scores: (q, b) via LUT fancy-indexing per subspace
            scores = np.zeros((len(Q), len(C)))
            for j in range(m):
                scores += lut[:, j, C[:, j]]
            nids = pdf["nid"].to_numpy()
            out_q, out_n, out_s = [], [], []
            for qi in range(len(Q)):
                out_q.extend([int(q_ids[qi])] * len(C))
                out_n.extend(nids)
                out_s.extend(scores[qi])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "approx_sim": out_s}
            )

    import pandas as pd  # noqa: F401

    approx = codes.mapInPandas(
        score_kernel, schema="query_id long, neighbor_id long, approx_sim double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    wa = Window.partitionBy("query_id").orderBy(
        F.col("approx_sim").desc(), F.col("neighbor_id")
    )
    cand = (
        approx.withColumn("ar", F.row_number().over(wa))
        .filter(F.col("ar") <= k * refine_factor)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank of the candidate set only
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    rescored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("sim", dot(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _hash_sample_rows(
    corpus: DataFrame, n: int, salt: str, vec_col: str, id_col: str
) -> list[tuple]:
    """``n`` corpus rows picked by md5(salt || id) order — a
    deterministic, engine-portable 'random' sample (md5 of the id is
    uniform; no RNG state, so DuckDB reproduces the pick with the same
    one-line ORDER BY). Bounded driver collect, same contract as the
    KMeans/codebook sample fits. Returns [(idx, id, [float,...])]."""
    rows = (
        corpus.select(F.col(id_col).alias("sid"), F.col(vec_col).alias("v"))
        .withColumn(
            "__h", F.md5(F.concat(F.lit(salt), F.col("sid").cast("string")))
        )
        .orderBy("__h", "sid")
        .limit(n)
        .collect()
    )
    return [(i, r["sid"], [float(x) for x in r["v"]]) for i, r in enumerate(rows)]


def ivf_topk_seeded(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt: str = "ivf|",
) -> DataFrame:
    """IVF with a SEEDED coarse quantizer: the ``n_lists`` 'centroids'
    are hash-picked corpus vectors (the 0-iteration-KMeans baseline)
    instead of fitted KMeans centers.

    Why it exists alongside :func:`ivf_topk`: the serving structure is
    identical (assign corpus rows to their nearest cell once, probe a
    query's ``n_probe`` nearest cells, exact-score inside), but with
    zero fitted state the whole index is a pure function of the data —
    deterministic across runs AND reproducible by an independent SQL
    engine, so the driver value-checks the full ANN serving path
    (ann_suite oracle) rather than rows-only. Recall is a few points
    below fitted centroids at equal n_probe (seeds are corpus points,
    not means); the KMeans variant remains the production tuning.

    All distance folds are left-to-right (functions/vector.py), so
    cell assignments and rankings are bit-identical to the DuckDB
    mirror.
    """
    seeds = _hash_sample_rows(corpus, n_lists, salt, vec_col, id_col)
    cent_df = F.broadcast(
        corpus.sparkSession.createDataFrame(
            [(i, v) for i, _sid, v in seeds], "cell int, centroid array<double>"
        )
    )

    def d2_to(centroid_col):
        return F.aggregate(
            F.zip_with(
                F.col("__v"),
                centroid_col,
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def assign(df, id_alias, keep_n):
        w = Window.partitionBy(id_alias).orderBy(F.col("d2").asc(), F.col("cell"))
        return (
            df.select(
                F.col(id_col).alias(id_alias), F.col(vec_col).alias("__v")
            )
            .crossJoin(cent_df)
            .withColumn("d2", d2_to(F.col("centroid")))
            .withColumn("__cr", F.row_number().over(w))
            .filter(F.col("__cr") <= keep_n)
            .select(id_alias, F.col("__v"), "cell")
        )

    c_assigned = assign(corpus, "neighbor_id", 1).select(
        "neighbor_id", F.col("__v").alias("cv"), "cell"
    )
    probes = assign(queries, "query_id", n_probe).select(
        "query_id", F.col("__v").alias("qv"), "cell"
    )
    scored = (
        probes.join(c_assigned, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", dot(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def pq_topk_seeded(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m: int = 8,
    nbits: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt: str = "pq|",
    refine_factor: int = 8,
) -> DataFrame:
    """PQ-ADC with SEEDED codebooks: per-subspace codewords are the
    subspace slices of ``2**nbits`` hash-picked corpus vectors instead
    of per-subspace KMeans centroids.

    Same rationale as :func:`ivf_topk_seeded`: identical serving
    pipeline (encode corpus to m small codes -> per-query ADC lookup
    scoring -> exact re-rank of the top ``k * refine_factor``), zero
    fitted state, every float derived by the shared left-to-right
    fold — so the DuckDB oracle reproduces codes, ADC scores, and the
    final ranking bit-for-bit. The KMeans-codebook variant
    (:func:`pq_topk`) stays as the production path (tighter codebooks
    => smaller ADC error at equal m/nbits).

    Implementation is DataFrame-native (explode subspaces, window
    argmin, conditional-max pivot + explicit left-to-right ADC sum) —
    no driver-side numpy in the scoring path at all.
    """
    ksub = 2 ** nbits
    samples = _hash_sample_rows(corpus, ksub, salt, vec_col, id_col)
    dim = len(samples[0][2])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    spark = corpus.sparkSession
    # codebook rows: (j, c, codeword[dsub])
    cb_rows = [
        (j, c, v[j * dsub : (j + 1) * dsub])
        for j in range(m)
        for c, _sid, v in samples
    ]
    cb = F.broadcast(
        spark.createDataFrame(cb_rows, "j int, c int, w array<double>")
    )

    def sub_fold(vec_col_name, mul):
        """Left fold over the j-th subspace: (v[j*dsub+d] op w[d])."""
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

    # encode: per (vec, j) the argmin-d2 codeword (tiebreak smallest c)
    c_side = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    wenc = Window.partitionBy("neighbor_id", "j").orderBy(
        F.col("d2").asc(), F.col("c")
    )
    codes = (
        c_side.crossJoin(cb)
        .withColumn("d2", sub_fold("cv", mul=False))
        .withColumn("__r", F.row_number().over(wenc))
        .filter(F.col("__r") == 1)
        .select("neighbor_id", "j", "c")
    )
    # per-query LUT: dot(q_sub_j, codeword_{j,c})
    q_side = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    lut = (
        F.broadcast(q_side)
        .crossJoin(cb)
        .withColumn("val", sub_fold("qv", mul=True))
        .select("query_id", "j", "c", "val")
    )
    # ADC score: conditional-max pivot to one column per subspace, then
    # an EXPLICIT left-to-right sum — bit-identical across engines
    # (a plain SUM() aggregate has engine-chosen addition order).
    joined = codes.join(F.broadcast(lut), ["j", "c"])
    pivoted = joined.groupBy("query_id", "neighbor_id").agg(
        *[
            F.max(F.when(F.col("j") == j, F.col("val"))).alias(f"__t{j}")
            for j in range(m)
        ]
    )
    score = F.col("__t0")
    for j in range(1, m):
        score = score + F.col(f"__t{j}")
    approx = pivoted.withColumn("approx_sim", score).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("approx_sim").desc(), F.col("neighbor_id")
    )
    cand = (
        approx.withColumn("ar", F.row_number().over(wa))
        .filter(F.col("ar") <= k * refine_factor)
        .select("query_id", "neighbor_id")
    )
    rescored = (
        cand.join(F.broadcast(q_side), "query_id")
        .join(c_side, "neighbor_id")
        .withColumn("sim", dot(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    train_sample: int = 4096,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into ``n_lists``
    KMeans cells, search each query's ``n_probe`` nearest cells only.

    Scale shape: the KMeans fit runs on a bounded SAMPLE
    (``train_sample`` rows — coarse centroids need thousands of
    points, not the corpus; at 100 TB fitting on the full data would
    dominate the whole query); centroids are tiny and broadcast.
    Corpus rows are assigned a ``cell`` and shuffled once by it — at
    serving time a query touches n_probe/n_lists of the data.
    Recall/latency is the classic IVF nprobe curve.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    train = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
    if train_sample:
        train = train.limit(train_sample)
    # maxIter bounded: coarse cells only need rough centroids (recall
    # comes from n_probe, not from a fully converged k-means)
    model = KMeans(k=n_lists, seed=seed, featuresCol="features", maxIter=8).fit(train)

    def assign(df, id_alias):
        withv = df.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(f"{id_alias}_vec"),
            array_to_vector(F.col(vec_col)).alias("features"),
        )
        return model.transform(withv).withColumnRenamed("prediction", "cell")

    c_assigned = assign(corpus, "neighbor_id").select(
        "neighbor_id", F.col("neighbor_id_vec").alias("cv"), "cell"
    )

    # query -> its n_probe nearest centroids, via a broadcast centroid table
    centroids = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    cent_df = F.broadcast(
        queries.sparkSession.createDataFrame(
            centroids, "cell int, centroid array<double>"
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    dist_sq = F.aggregate(
        F.zip_with(
            F.col("qv"), F.col("centroid"), lambda a, b: (a.cast("double") - b) ** 2
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("cell"))
    probes = (
        q.crossJoin(cent_df)
        .withColumn("d2", dist_sq)
        .withColumn("cr", F.row_number().over(wq))
        .filter(F.col("cr") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    scored = (
        probes.join(c_assigned, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", dot(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
