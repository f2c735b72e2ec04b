"""Local mirror of the driver's DuckDB-oracle check (SURVEY.md §5.2).

Runs a registered Spark query and its DuckDB oracle on the same sf_dir and
compares row count, column names, and values (order-insensitive, exact after
the per-query round() discipline). Used by pytest at sf0.001 for fast
iteration; the driver does the same at sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from spark_multiboost_spark.session import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.map(lambda x: "NULL" if pd.isna(x) else f"{x:.6f}")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.map(lambda x: "NULL" if pd.isna(x) else str(bool(x)))
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.map(lambda x: "NULL" if pd.isna(x) else str(int(x)))
        else:
            df[c] = s.map(lambda x: "NULL" if x is None or (isinstance(x, float) and math.isnan(x)) else str(x))
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark, name: str, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle result for query ``name``."""
    from spark_multiboost_spark.registry import all_queries

    q = all_queries()[name]
    sdf = q.fn(spark, sf_dir).toPandas()
    assert q.oracle is not None, f"{name} has no oracle (rows-only)"
    con = duck_connect(sf_dir)
    odf = con.execute(q.oracle).df()
    con.close()

    assert len(sdf) == len(odf), f"{name}: rowcount spark={len(sdf)} duckdb={len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns spark={sorted(sdf.columns)} duckdb={sorted(odf.columns)}"
    )
    if len(sdf) == 0:
        return  # both empty (counts asserted equal above) — match by definition
    ns, no = _normalize(sdf), _normalize(odf)
    if not ns.equals(no):
        diff_mask = (ns != no).any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch\nspark:\n{ns[diff_mask].head(10)}\n"
            f"duckdb:\n{no[diff_mask].head(10)}"
        )


def run_rows_only(spark, name: str, sf_dir: str) -> int:
    """For rows-only queries: execute and return the row count (>= 0)."""
    from spark_multiboost_spark.registry import all_queries

    q = all_queries()[name]
    return q.fn(spark, sf_dir).count()
