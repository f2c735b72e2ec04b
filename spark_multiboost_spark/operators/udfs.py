"""Python UDF surface (SURVEY.md §2 B35-B37): scalar UDF, Arrow-vectorized
pandas UDFs, grouped-agg pandas UDF, applyInPandas grouped map, Python UDTF.

Policy (100 TB posture): UDFs are the slow path — every query here exists to
prove the plumbing, and each one that CAN be cross-checked against pure SQL
is (the UDF must reproduce the declarative semantics exactly). Row-at-a-time
UDFs only on tiny dimensions; everything else Arrow-batched.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.parity import bcount, dsum_sql
from ..registry import query
from ..session import load_tables


@pandas_udf(LongType())
def _token_count(text: pd.Series) -> pd.Series:
    # whitespace token count over the Arrow batch.  C-level str.count in a
    # list comprehension: ~3.6x faster than the regex-backed pandas
    # .str.count(" ") and ~equal to it even counting the Python loop.  NULL
    # text stays NULL (None -> NaN -> Arrow null), matching the SQL twin.
    return pd.Series(
        [t.count(" ") + 1 if isinstance(t, str) else None for t in text],
        index=text.index,
        dtype="float64",
    )


@query(
    "q_b35_pandas_udf_token_count",
    oracle="""
SELECT doc_id,
       CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
FROM documents
""",
    group="B",
)
def pandas_udf_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B35: Arrow-vectorized pandas UDF (token count) — cross-checked
    against the pure-SQL space-counting formula, proving the UDF reproduces
    declarative semantics exactly."""
    d = load_tables(spark, sf_dir)["documents"]
    return d.select("doc_id", _token_count("text").alias("n_tokens"))


@query(
    "q_b35_scalar_udf",
    oracle="SELECT r_regionkey, UPPER(r_name) AS name_upper FROM region",
    group="B",
)
def scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B35: row-at-a-time Python UDF — deliberately confined to the 5-row
    region dim (the anti-pattern demo; pandas UDFs are ~10-100x faster on
    real columns)."""
    r = load_tables(spark, sf_dir)["region"]
    up = F.udf(lambda s: s.upper() if s is not None else None, StringType())
    return r.select("r_regionkey", up("r_name").alias("name_upper"))


@pandas_udf(DoubleType())
def _weighted_mean(v: pd.Series, w: pd.Series) -> float:
    den = w.sum()
    return float((v * w).sum() / den) if den != 0 else float("nan")


# Spark disallows mixing GROUPED_AGG pandas UDFs with JVM aggregates in one
# agg() — so the row count is a pandas UDF too
@pandas_udf(LongType())
def _group_count(v: pd.Series) -> int:
    return len(v)


@query(
    "q_b36_grouped_agg_udf",
    oracle="""
SELECT event_type,
       ROUND(SUM(value * CAST(user_id AS DOUBLE)) / SUM(CAST(user_id AS DOUBLE)), 4) AS wmean,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type ORDER BY event_type
""",
    group="B",
)
def grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B36: GROUPED_AGG pandas UDF (weighted mean) vs its SQL twin.
    round(4): pandas uses pairwise summation vs sequential in SQL engines,
    so low bits differ legitimately."""
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.groupBy("event_type")
        .agg(
            F.round(
                _weighted_mean(F.col("value"), F.col("user_id").cast("double")), 4
            ).alias("wmean"),
            _group_count(F.col("value")).alias("n"),
        )
        .orderBy("event_type")
    )


_MINMAX_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("value_minmax", DoubleType()),
    ]
)


def _minmax_norm(pdf: pd.DataFrame) -> pd.DataFrame:
    lo, hi = pdf["value"].min(), pdf["value"].max()
    span = hi - lo
    # span == 0 (single-event user / constant values) -> sentinel -1.0 so the
    # UDF and the SQL twin agree without NULL-vs-NaN ambiguity
    out = pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "user_id": pdf["user_id"],
            "value_minmax": ((pdf["value"] - lo) / span if span != 0 else -1.0),
        }
    )
    # half-AWAY rounding to match SQL ROUND (DuckDB and Spark F.round):
    # pandas .round is half-even, which flips exact .xxxxxx5 values
    # (surfaced by the sf0.1 sweep: 3/100k rows). Safe for the [0,1] range
    # and the exact -1.0 sentinel.
    out["value_minmax"] = np.floor(out["value_minmax"] * 1e6 + 0.5) / 1e6
    return out


@query(
    "q_b36_apply_in_pandas",
    oracle="""
SELECT event_id, user_id,
       COALESCE(ROUND((value - MIN(value) OVER (PARTITION BY user_id))
             / NULLIF(MAX(value) OVER (PARTITION BY user_id)
                      - MIN(value) OVER (PARTITION BY user_id), 0), 6), -1.0) AS value_minmax
FROM events
""",
    group="B",
)
def apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B36: applyInPandas grouped-map (per-user min-max normalization) vs
    the window-function SQL twin. Min-max (not z-score) so the math is
    exact — no variance-algorithm drift between engines."""
    e = load_tables(spark, sf_dir)["events"]
    return e.select("event_id", "user_id", "value").groupBy("user_id").applyInPandas(
        _minmax_norm, schema=_MINMAX_SCHEMA
    )


@query(
    "q_b37_udtf_tokens",
    oracle="""
SELECT doc_id, token
FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
      FROM documents WHERE doc_id < 50)
WHERE LENGTH(token) > 0
""",
    group="B",
)
def udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B37: Python UDTF — tokenizes text into one row per token; twin of
    the declarative explode(split(...)) / UNNEST form."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, token string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            if text:
                for tok in text.split(" "):
                    if tok:
                        yield doc_id, tok

    d = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < 50)
    spark.udtf.register("smb_tokenize", Tokenize)
    d.createOrReplaceTempView("docs_head")
    return spark.sql(
        "SELECT t.doc_id, t.token FROM docs_head d, "
        "LATERAL smb_tokenize(d.doc_id, d.text) t"
    )


@query(
    "q_b35_sql_udf",
    oracle=f"""
SELECT l_returnflag,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS net_revenue,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    group="B",
)
def sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B35 (cont.): SQL-DEFINED scalar function (Spark 4's CREATE FUNCTION
    ... RETURN <expr>) — the UDF form with NO serialization wall: the body
    is inlined into the plan at resolution time, so it runs inside
    whole-stage codegen exactly like writing the expression by hand.  This
    is the right default for shareable business logic at 100 TB; Python
    UDFs (the rest of B35) are for logic expressions can't state.

    The oracle inlines the same expression — hash equality proves the
    function boundary added nothing."""
    t = load_tables(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION smb_net(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    t["lineitem"].createOrReplaceTempView("v_li_sqludf")
    return spark.sql(
        f"""
SELECT l_returnflag,
       CAST(SUM(CAST(smb_net(l_extendedprice, l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS net_revenue,
       CAST(COUNT(1) AS BIGINT) AS n
FROM v_li_sqludf GROUP BY l_returnflag ORDER BY l_returnflag
"""
    )


@query(
    "q_b37_sql_tvf",
    oracle="""
SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT t.tok) AS BIGINT) AS n_distinct
FROM (SELECT doc_id, text FROM documents WHERE doc_id < 5) d,
     LATERAL (SELECT UNNEST(STRING_SPLIT(d.text, ' ')) AS tok) t
GROUP BY d.doc_id ORDER BY d.doc_id
""",
    group="B",
)
def sql_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B37 (cont.): SQL-DEFINED TABLE function (CREATE FUNCTION ... RETURNS
    TABLE) applied per input row via LATERAL — the declarative twin of the
    Python UDTF (q_b37_udtf_tokens).  Like the scalar form, the body
    resolves into the plan (a generator under a lateral join), so the
    tokenizer runs JVM-side with zero Python workers.

    Scale: the generator explodes inside the scan's stage; the rollup is
    one hash-agg on doc_id."""
    t = load_tables(spark, sf_dir)
    spark.sql(
        """
CREATE OR REPLACE TEMPORARY FUNCTION smb_toks(s STRING)
RETURNS TABLE(pos INT, tok STRING)
RETURN SELECT posexplode(split(s, ' ')) AS (pos, tok)
"""
    )
    t["documents"].createOrReplaceTempView("v_docs_sqltvf")
    return spark.sql(
        """
SELECT d.doc_id, CAST(COUNT(1) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT t.tok) AS BIGINT) AS n_distinct
FROM (SELECT doc_id, text FROM v_docs_sqltvf WHERE doc_id < 5) d,
     LATERAL smb_toks(d.text) t
GROUP BY d.doc_id ORDER BY d.doc_id
"""
    )


@query(
    "q_b37_udtf_polymorphic",
    oracle="""
SELECT event_id,
       json_extract(props, '$.k')::BIGINT AS k,
       event_type
FROM events WHERE event_id < 100 ORDER BY event_id
""",
    group="B",
)
def udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B37 (cont.): POLYMORPHIC Python UDTF — Spark 4's analyze() static
    method computes the output schema AT PLAN TIME from the literal
    arguments (here: which JSON fields to surface and their types), so one
    UDTF serves any projection without per-variant classes — the
    table-function analogue of schema-on-read.  eval() then parses per
    row; the analyze-time schema is what lets Catalyst prune, plan joins,
    and validate downstream references as if the output were a real table.

    Python-row-path caveats apply exactly as q_b37_udtf_tokens: this is
    API-surface coverage (bounded to 100 events), not the hot path — the
    declarative twin (json_extract in codegen, see q_b29) is what runs at
    100 TB."""
    import json as _json

    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
    from pyspark.sql.types import LongType, StringType, StructType

    @udtf
    class ExtractProps:
        @staticmethod
        def analyze(
            row_id: AnalyzeArgument, payload: AnalyzeArgument, fields: AnalyzeArgument
        ) -> AnalyzeResult:
            schema = StructType().add("event_id", LongType())
            for f in fields.value.split(","):
                name, typ = f.split(":")
                schema = schema.add(
                    name, LongType() if typ == "bigint" else StringType()
                )
            return AnalyzeResult(schema=schema)

        def eval(self, row_id: int, payload: str, fields: str):
            d = _json.loads(payload) if payload else {}
            out = [row_id]
            for f in fields.split(","):
                name, typ = f.split(":")
                v = d.get(name)
                out.append(int(v) if (typ == "bigint" and v is not None) else v)
            yield tuple(out)

    e = load_tables(spark, sf_dir)["events"].filter(F.col("event_id") < 100)
    spark.udtf.register("smb_extract_props", ExtractProps)
    e.createOrReplaceTempView("events_head")
    out = spark.sql(
        "SELECT t.* FROM events_head e, "
        "LATERAL smb_extract_props(e.event_id, e.props, 'k:bigint') t"
    )
    # join event_type back (string field absent from props — proves the
    # UDTF output composes with ordinary columns)
    return (
        out.join(e.select("event_id", "event_type"), "event_id")
        .select("event_id", "k", "event_type")
        .orderBy("event_id")
    )
