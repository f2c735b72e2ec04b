"""Vector math over ARRAY<DOUBLE> columns — pure Catalyst expressions.

These compile to JVM-side higher-order-function evaluation (no Python on the
hot path), which is the scale-safe way to do per-row linear algebra in Spark:
whole-stage codegen keeps the loop fused into the surrounding operators.

Mirrors the reference's mllib.linalg.Vector usage
([R] .../multilabel/MultiLabeledPoint.scala, confidence H — see SURVEY.md §0.2:
the reference mount was empty; citations are reconstructed).

Float discipline: left-to-right ``aggregate`` accumulation matches DuckDB's
list_* evaluation order, keeping cross-engine doubles bit-comparable before
the final round().
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    """Dot product of two equal-length ARRAY<DOUBLE> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a) -> Column:
    """L2 norm of an ARRAY<DOUBLE> column."""
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    """Cosine similarity; NULL-safe for zero vectors via nullif."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def l2_distance(a, b) -> Column:
    """Euclidean distance between two ARRAY<DOUBLE> columns."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def scale(a, s) -> Column:
    """Multiply every element of ARRAY<DOUBLE> ``a`` by scalar column ``s``."""
    return F.transform(a, lambda x: x * s)


def add(a, b) -> Column:
    """Element-wise sum of two ARRAY<DOUBLE> columns."""
    return F.zip_with(a, b, lambda x, y: x + y)
