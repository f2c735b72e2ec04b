"""Cross-engine float discipline (SURVEY.md §2 oracle-match rules).

Problem: SUM/AVG over DOUBLE depends on accumulation order, which differs
between Spark partitions and DuckDB — and between two runs of the same
Spark job at different parallelism. That breaks value-hash comparison AND
run-to-run reproducibility at cluster scale.

Fix: cast the per-row measure to DECIMAL(18,6) before aggregating. Decimal
addition is exact and associative, so the sum is order-independent and
bit-identical in any engine; the final cast back to DOUBLE is exact for
|x| < 2^53 * 1e-6. Per-row double expressions are IEEE-deterministic, and
fixture measures are ~2dp, so the 6dp decimal quantization is unambiguous
(never lands on a rounding boundary).

Use :func:`dsum` / :func:`davg` in Spark and :func:`dsum_sql` /
:func:`davg_sql` in the oracle text, always with the same alias.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(expr: Column | str) -> Column:
    """Order-independent SUM of a double expression (exact decimal path)."""
    c = F.expr(expr) if isinstance(expr, str) else expr
    return F.sum(c.cast(DEC)).cast("double")


def davg(expr: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum divided by count."""
    c = F.expr(expr) if isinstance(expr, str) else expr
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr})"


def bcount() -> Column:
    """COUNT(*) as BIGINT (both engines agree on the type)."""
    return F.count(F.lit(1)).cast("bigint")
