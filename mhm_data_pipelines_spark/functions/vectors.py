"""Vector expression builders over ``array<float/double>`` embedding
columns: dot product, norms, cosine — all builtin higher-order functions
(JVM-side), used by the similarity-search and embedding-dedup operators.

At 100 TB these expressions run inside codegen with no Python transfer;
the Pandas-UDF path exists in operators.similarity only for the batched
matrix variant where BLAS beats per-row folds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_c(a), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe on zero vectors (returns NULL)."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def normalize(a: Column | str) -> Column:
    """L2-normalize once at ingest so downstream cosine = dot — halves the
    per-pair cost of the brute-force search and makes LSH hyperplane
    signs scale-invariant."""
    n = norm(a)
    return F.when(
        n > 0, F.transform(_c(a), lambda x: x.cast("double") / n)
    )
