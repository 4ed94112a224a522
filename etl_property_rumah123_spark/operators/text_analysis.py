"""Text-analysis operators for a training-data pipeline: token
counting, quality scoring, language ID, document fingerprinting.

All pure Column expressions over a text column — at 100 TB these run
embarrassingly parallel inside the scan stage with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_property_rumah123_spark.functions.hashing import shingles, word_tokens

#: Tiny per-language marker-word sets for the heuristic language ID.
#: Real pipelines use char-n-gram models; the *operator shape* (argmax
#: over per-language evidence scores, computed as expressions) is the
#: part that matters at scale.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "is"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "los", "que", "y", "una"),
    "zh": ("的", "是", "了", "在", "我"),
}

#: BPE-ish sub-word segmentation: runs of letters, runs of digits, or
#: single punctuation — a cheap stand-in for tokenizer-true counts.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.lit(0).cast("long")).otherwise(
        F.size(F.split(trimmed, r"\s+")).cast("long")
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word token count via regexp run extraction."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)).cast("long")


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


def stopword_ratio(words: Column, stopwords: tuple[str, ...]) -> Column:
    """Fraction of tokens that are stopwords (evidence of natural text)."""
    sw = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    return hits.cast("double") / F.nullif(F.size(words).cast("double"), F.lit(0.0))


def mean_word_length(words: Column) -> Column:
    total = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    return total.cast("double") / F.nullif(F.size(words).cast("double"), F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / all chars."""
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return punct.cast("double") / F.nullif(F.length(text).cast("double"), F.lit(0.0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the quality-feature bundle used for corpus filtering."""
    words = word_tokens(F.col(text_col))
    return df.withColumns(
        {
            "n_tokens": token_count(F.col(text_col)),
            "n_chars_measured": char_count(F.col(text_col)),
            "stop_ratio": stopword_ratio(words, LANG_MARKERS["en"]),
            "mean_word_len": mean_word_length(words),
            "punct_ratio": punct_ratio(F.col(text_col)),
        }
    )


#: PII surface patterns, deliberately written in the regex subset where
#: Java regex (Spark) and RE2 (DuckDB) agree byte-for-byte — parity is
#: pinned by the oracle comparing md5(redacted_text). Order matters for
#: redaction: emails first (their local part may contain digits a later
#: pattern would chew on), then IPs, then phone runs.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("phone", r"\+?\d[\d –-]{7,}\d"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-pattern PII match counts over the raw text (each pattern is
    counted independently, before any redaction)."""
    t = F.coalesce(text, F.lit(""))
    return {
        name: F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long")
        for name, pat in PII_PATTERNS
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with ``<NAME>`` placeholders, applying
    the patterns in ``PII_PATTERNS`` order. A pure expression chain —
    at 100 TB this runs inside the scan stage like every other
    text filter."""
    out = F.coalesce(text, F.lit(""))
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def clean_lines(text: Column) -> Column:
    """Non-empty trimmed lines of ``text`` (null text reads as '')."""
    return F.filter(
        F.transform(
            F.split(F.coalesce(text, F.lit("")), "\n"), lambda x: F.trim(x)
        ),
        lambda x: x != "",
    )


def clean_words(text: Column) -> Column:
    """Whitespace tokens with the empty-text artifact removed: ''/null
    text yields [] (plain ``word_tokens`` yields [''], kept there for
    parity with older oracles)."""
    return F.filter(
        word_tokens(F.coalesce(text, F.lit(""))), lambda x: x != ""
    )


def dup_fraction(arr: Column) -> Column:
    """Fraction of array elements that repeat an earlier element:
    ``(len - distinct) / len``; NULL for empty arrays."""
    n = F.size(arr).cast("double")
    return (n - F.size(F.array_distinct(arr)).cast("double")) / F.nullif(
        n, F.lit(0.0)
    )


def word_bigrams(words: Column) -> Column:
    """Adjacent word pairs joined with one space; < 2 words yields []."""
    n = F.size(words)
    return F.zip_with(
        F.slice(words, 1, n - 1),
        F.slice(words, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition filters, per document:

    - ``n_lines`` / ``dup_line_frac`` — share of non-empty lines that
      duplicate an earlier line (boilerplate / template detector);
    - ``dup_word_frac`` — share of tokens repeating an earlier token;
    - ``top_bigram_frac`` — share of adjacent-word bigram occurrences
      taken by the single most frequent bigram (NULL below 2 words).

    Shape at scale: the line/word fractions are pure Column
    expressions (zero shuffles, array_distinct is linear per doc). The
    top-bigram share is explode -> (doc, bigram) counts -> per-doc
    max/sum — two map-side-combining aggregations, deliberately NOT the
    HOF count-each-distinct-element form, whose per-row cost is
    quadratic in document length (pathological on one long document).
    """
    d = df.select(
        "doc_id",
        clean_lines(F.col(text_col)).alias("__lines"),
        clean_words(F.col(text_col)).alias("__w"),
    )
    scal = d.select(
        "doc_id",
        F.size("__lines").cast("long").alias("n_lines"),
        F.round(dup_fraction(F.col("__lines")), 6).alias("dup_line_frac"),
        F.round(dup_fraction(F.col("__w")), 6).alias("dup_word_frac"),
    )
    bg = (
        d.filter(F.size("__w") >= 2)
        .select("doc_id", F.explode(word_bigrams(F.col("__w"))).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("__maxc"), F.sum("c").alias("__totc"))
    )
    return (
        scal.join(bg, "doc_id", "left")
        .withColumn(
            "top_bigram_frac",
            F.round(
                F.col("__maxc").cast("double") / F.col("__totc").cast("double"), 6
            ),
        )
        .drop("__maxc", "__totc")
    )


def sentence_segments(text: Column) -> Column:
    """Non-empty trimmed '.'-delimited segments (null text reads '')."""
    return F.filter(
        F.transform(
            F.split(F.coalesce(text, F.lit("")), r"\."), lambda x: F.trim(x)
        ),
        lambda x: x != "",
    )


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 3,
) -> DataFrame:
    """RefinedWeb/CCNet-style boilerplate removal: drop every sentence
    segment that appears verbatim in >= ``min_df`` distinct documents
    (cookie banners, nav text, disclaimers), then reassemble each
    document's surviving segments in their original order.

    Output per input document: ``n_segments`` (before the cut),
    ``n_removed``, and ``clean_text`` — the kept segments re-joined as
    the canonical ``'. '``-separated form ('' when everything was
    boilerplate). Documents with no non-empty segments (null/blank
    text) drop out, matching the SQL oracle's explode semantics.

    Shape at scale: the exploded segment table is MATERIALIZED
    (operators/common.py) because two branches read it — the
    document-frequency pass and the join probe side — and Spark would
    otherwise re-run the scan+explode per branch. The df pass shuffles
    DISTINCT (segment, doc_id) pairs — each segment body crosses the
    wire once per containing doc, with map-side combine on the second
    aggregate; the boilerplate table is then *filtered to df >= min_df
    before joining*, so the join's build side holds only the (small,
    by construction heavy-tailed) boilerplate set and AQE plans it as
    a broadcast join; reassembly is one groupBy bounded by
    per-document size. At 100 TB, slim the df shuffle further by
    keying on xxhash64(segment) instead of the segment body.
    """
    from etl_property_rumah123_spark.operators.common import materialize

    segs = materialize(
        df.select(
            F.col(id_col),
            F.posexplode(sentence_segments(F.col(text_col))).alias(
                "pos", "seg"
            ),
        )
    )
    boiler = (
        segs.select("seg", id_col)
        .distinct()
        .groupBy("seg")
        .agg(F.count("*").cast("long").alias("__df"))
        .filter(F.col("__df") >= min_df)
        .select("seg")
        .withColumn("__boiler", F.lit(True))
    )
    flagged = segs.join(boiler, "seg", "left")
    kept = F.when(F.col("__boiler").isNull(), F.struct("pos", "seg"))
    return flagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_segments"),
        F.sum(F.when(F.col("__boiler").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept)), lambda s: s["seg"]
            ),
            ". ",
        ).alias("clean_text"),
    )


def lang_scores(words: Column) -> dict[str, Column]:
    """Per-language marker hit counts."""
    out = {}
    for lang, markers in LANG_MARKERS.items():
        sw = F.array(*[F.lit(w) for w in markers])
        out[lang] = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    return out


def detect_language(text: Column, min_hits: int = 1) -> Column:
    """Heuristic language ID: argmax of marker hits, 'und' when no
    language reaches ``min_hits``. Ties break by the fixed language
    order (deterministic)."""
    words = word_tokens(text)
    scores = lang_scores(words)
    best_lang = F.lit("und")
    best_score = F.lit(min_hits - 1)
    for lang, score in scores.items():  # later langs win only on strictly greater
        better = score > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return best_lang


def detect_language_agg(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", min_hits: int = 1
) -> DataFrame:
    """(id, lang) — same definition as ``detect_language`` (argmax of
    marker-word hits, 'und' below ``min_hits``, ties to the earlier
    language) in the aggregate formulation: explode words, one
    conditional-count aggregate per language (codegen + map-side
    combine), argmax over plain columns. Use this for corpus-scale
    scans; the Column-expression form remains for single-expression
    contexts."""
    words = df.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(word_tokens(F.col(text_col))).alias("__w"),
    )
    counts = words.groupBy("__id").agg(
        *[
            F.count(F.when(F.col("__w").isin(*markers), 1)).alias(f"__c_{lang}")
            for lang, markers in LANG_MARKERS.items()
        ]
    )
    best_lang = F.lit("und")
    best_score = F.lit(min_hits - 1).cast("long")
    for lang in LANG_MARKERS:  # later langs win only on strictly greater
        score = F.col(f"__c_{lang}")
        better = score > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return counts.select(F.col("__id").alias(id_col), best_lang.alias("lang"))


def fingerprint(text: Column, shingle_n: int = 5) -> Column:
    """Document fingerprint: lexicographic min md5 over word n-gram
    shingles (a min-wise rolling-window hash). Falls back to md5 of the
    whole text for docs shorter than the shingle width, so every doc
    fingerprints deterministically."""
    sh = shingles(word_tokens(text), shingle_n)
    min_shingle_hash = F.array_min(F.transform(sh, F.md5))
    return F.coalesce(min_shingle_hash, F.md5(text))


def fingerprint_agg(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_n: int = 5
) -> DataFrame:
    """(id, fingerprint) — same definition as ``fingerprint`` in the
    aggregate formulation (codegen shingle rows + min aggregate with
    map-side combine; short docs fall back to md5(text) through the
    null-marker row)."""
    from etl_property_rumah123_spark.operators.dedup import shingle_rows

    rows = shingle_rows(df, text_col, id_col, shingle_n)
    mins = rows.groupBy("doc_id").agg(F.min(F.md5("shingle")).alias("__min_h"))
    base = df.select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("__fb")
    )
    return base.join(mins, "doc_id", "left").select(
        F.col("doc_id").alias(id_col),
        F.coalesce("__min_h", "__fb").alias("fingerprint"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: tuple[str, ...],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 retrieval: score every document against a fixed bag
    of query terms, return the top-``k`` as (id, n_terms_hit,
    score_micro).

    Scale shape (the part that matters at 100 TB):
    - tokenize + per-(doc, term) tf is ONE shuffle on (doc, term) with
      map-side combine; only rows whose term is in the (tiny, literal)
      query set survive the scan-stage filter, so the shuffle carries
      |Q| * n_docs rows at most — not the corpus token stream;
    - document length and the corpus stats (N, avgdl) are a scan-local
      expression plus one scalar aggregate, broadcast back;
    - per-term df is an aggregate over the (doc, term) frame — tiny
      (<= |Q| rows), broadcast into the scoring join;
    - top-k is orderBy().limit(k) = TakeOrdered (per-partition heaps +
      driver merge), never a single-partition global sort.

    Cross-engine determinism: each per-term contribution is quantized
    to integer micro-units (``floor(x * 1e6)``) BEFORE the per-doc
    sum, so the score is accumulation-order-free and hash-exact vs a
    DuckDB restatement (same convention as operators/ml.py). The
    tie-break orders by (score_micro DESC, id) so the top-k set is
    deterministic.
    """
    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    qlit = F.array(*[F.lit(t) for t in query_terms])

    # dl = whitespace token count, DuckDB len(string_split_regex)
    # parity included ('' -> [''] -> 1; kept identical on both sides)
    docs = df.select(
        F.col(id_col).alias("__id"),
        word_tokens(F.lower(F.col(text_col))).alias("__w"),
    ).select("__id", "__w", F.size("__w").cast("long").alias("__dl"))

    stats = docs.agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__dl").alias("__sdl")
    )

    tf = (
        docs.select(
            "__id", "__dl", F.explode("__w").alias("__t")
        )
        .filter(F.array_contains(qlit, F.col("__t")))
        .groupBy("__id", "__dl", "__t")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"))
    )
    df_t = tf.groupBy("__t").agg(F.count(F.lit(1)).cast("double").alias("__df"))

    n = F.col("__n").cast("double")
    avgdl = F.col("__sdl").cast("double") / n
    idf = F.log(F.lit(1.0) + (n - F.col("__df") + F.lit(0.5)) / (F.col("__df") + F.lit(0.5)))
    norm = F.col("__tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("__dl").cast("double") / avgdl
    )
    contrib = idf * (F.col("__tf") * F.lit(k1 + 1.0)) / norm
    scored = (
        tf.join(F.broadcast(df_t), "__t")
        .crossJoin(F.broadcast(stats))
        .select(
            "__id",
            F.floor(contrib * F.lit(1e6)).cast("long").alias("__c"),
        )
    )
    return (
        scored.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.sum("__c").alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), F.col("__id"))
        .limit(k)
        .select(
            F.col("__id").alias(id_col), "n_terms_hit", "score_micro"
        )
    )
