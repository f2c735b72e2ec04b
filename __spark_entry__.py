"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``spark_multiboost_spark``; this module is a thin
re-export so the registry stays the single source of truth.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_multiboost_spark.registry import oracle_sql as _oracle_sql
from spark_multiboost_spark.registry import queries as _queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7 Phase 1): top-k cosine neighbors over
    ``embeddings`` at sf0.001 — exercises scan, array lambdas, broadcast
    join, window top-k, and aggregation in one plan."""
    from spark_multiboost_spark.functions.similarity import topk_cosine

    return topk_cosine(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query."""
    return _oracle_sql()
