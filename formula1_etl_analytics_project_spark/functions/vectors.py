"""Vector math over ``array<float>`` embedding columns.

Native higher-order functions (``aggregate``/``zip_with``) keep the dot
product JVM-side; elements are cast to double *before* accumulation and
folded strictly left-to-right, which both matches DuckDB's list
functions closely enough for rounded comparison and avoids float32
accumulation error.

Scale notes: cosine top-k over N vectors is a map + top-k - no shuffle
except the final k-row reduction (``orderBy().limit(k)`` lowers to
TakeOrderedAndProject: per-partition heaps, driver merge of k rows per
partition). The LSH/IVF variants in operators.similarity cut the
candidate set before any of this runs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
