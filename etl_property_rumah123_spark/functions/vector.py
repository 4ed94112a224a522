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


def make_dot_pandas(dim: int):
    """Arrow-batched dot product, **bit-identical** to ``dot``.

    The kernel accumulates dimension-by-dimension across the whole
    batch (``acc += a[:, i] * b[:, i]``) — the same left-to-right
    float64 fold as ``F.aggregate``, just vectorized across rows, so
    IEEE results match the Column-expression form exactly and
    DuckDB-oracle thresholds/rankings stay stable. ~50-100x faster on
    large pair sets (the O(n^2) dedup verify path): one numpy fused
    loop instead of an interpreted expression tree per element.

    ``dim`` is fixed at plan-build time so the kernel can np.stack
    without ragged checks.
    """
    import pandas as pd  # noqa: F401 — resolves the kernel's type hints
    from pyspark.sql.functions import pandas_udf

    globals()["pd"] = pd  # pandas_udf resolves 'pd.Series' via module globals

    @pandas_udf("double")
    def dot_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        av = np.stack(a.values).astype("float64")
        bv = np.stack(b.values).astype("float64")
        acc = np.zeros(len(av), dtype="float64")
        for i in range(dim):  # left-to-right fold, same order as F.aggregate
            acc += av[:, i] * bv[:, i]
        return pd.Series(acc)

    return dot_pandas
