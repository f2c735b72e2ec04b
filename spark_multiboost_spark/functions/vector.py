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


def sign_bits(a) -> Column:
    """Pack an ARRAY<DOUBLE> (dim <= 64) into ONE BIGINT of sign bits
    (bit i set iff a[i] >= 0).  Runs once per VECTOR row, so the per-pair
    Hamming distance downstream collapses to ``bit_count(xor)`` — a
    whole-stage-codegen intrinsic — instead of a 64-step interpreted
    higher-order fold per pair (HOFs are excluded from codegen; measured
    ~6x slower at 200k pairs).  At wider dims, emit ceil(d/64) words.

    Guarded: JVM shiftleft wraps shift amounts mod 64, so a >64-dim input
    would silently ALIAS bits (wrong Hamming distances) — raise_error makes
    it fail loudly instead (tests/test_properties.py pins the failure)."""
    packed = F.aggregate(
        a,
        F.struct(
            F.lit(0).cast("long").alias("b"), F.lit(0).cast("int").alias("i")
        ),
        lambda acc, x: F.struct(
            (
                acc["b"]
                + F.when(
                    x >= 0,
                    F.call_function(
                        "shiftleft", F.lit(1).cast("long"), acc["i"]
                    ),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("b"),
            (acc["i"] + 1).alias("i"),
        ),
    )
    # NULL passthrough first: F.size(NULL) is NULL, so without this branch a
    # NULL array falls through the <=64 test into raise_error (with a NULL
    # message) instead of propagating NULL like every other scalar fn here.
    return F.when(a.isNull(), F.lit(None).cast("long")).when(
        F.size(a) <= 64, packed["b"]
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("sign_bits: dim "),
                F.size(a).cast("string"),
                F.lit(" > 64 would alias bits (shiftleft wraps mod 64); "
                      "pack ceil(d/64) words instead"),
            )
        ).cast("long")
    )


def hamming_packed(a_bits, b_bits) -> Column:
    """Hamming distance between two sign_bits words: popcount of xor."""
    return F.bit_count(a_bits.bitwiseXOR(b_bits)).cast("int")
