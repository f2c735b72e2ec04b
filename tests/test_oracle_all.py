"""Parametrized oracle check: every registered SQL query vs DuckDB at
sf0.001 (the driver does the same at sf0.01)."""

from __future__ import annotations

import pytest

from spark_multiboost_spark.registry import all_queries
from tests.harness import compare, run_rows_only

_ALL = all_queries()
_SQL = sorted(n for n, q in _ALL.items() if q.oracle is not None)
_ROWS_ONLY = sorted(n for n, q in _ALL.items() if q.oracle is None)


@pytest.mark.parametrize("name", _SQL)
def test_oracle(spark, sf_dir, name):
    compare(spark, name, sf_dir)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only(spark, sf_dir, name):
    assert run_rows_only(spark, name, sf_dir) >= 0
