"""Vector math over array<float|double> columns as native expressions.

Used by the similarity-search and embedding-dedup operators. All
arithmetic is element-wise cast to double then folded LEFT-TO-RIGHT
(``F.aggregate`` is a sequential fold), which makes results
reproducible and lets an independent engine (the DuckDB oracle, via
``list_reduce``) produce bit-identical doubles.

At 100 TB these expressions stay inside codegen — no Arrow transfer,
no Python. For very high dimensions (>~4k) a Pandas-UDF BLAS path
would win; at typical embedding dims (64-1536) the JVM loop is fine
and avoids the batch-transfer overhead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fold_sum(arr: Column) -> Column:
    """Sequential left-to-right sum of an array<double> column."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    """Dot product: zip_with multiply then sequential fold."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return fold_sum(prods)


def norm_sq(a: Column) -> Column:
    """Squared L2 norm."""
    return fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double")))


def l2_norm(a: Column) -> Column:
    return F.sqrt(norm_sq(a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null-safe on zero vectors via nullif."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))
