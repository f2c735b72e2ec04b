"""Sinks (SURVEY.md §2 B3): partitioned parquet write + read-back.

Scale notes: `partitionBy` on a low-cardinality natural key gives partition
pruning to every downstream reader; the read-back query here filters one
partition and the scan shows PartitionFilters (dynamic pruning territory at
cluster scale).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parity import bcount, dsum
from ..registry import query
from ..session import load_tables


@query("q_b03_partitioned_write", oracle=None, group="B")
def partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: write lineitem partitioned by l_returnflag, read back with a
    partition filter, aggregate. Rows-only (sink correctness = read-back)."""
    t = load_tables(spark, sf_dir)
    path = os.path.join(tempfile.mkdtemp(prefix="smb_pq_"), "lineitem_part")
    (
        t["lineitem"]
        .write.mode("overwrite")
        .partitionBy("l_returnflag")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        bcount().alias("n"), dsum("l_quantity").alias("sum_qty")
    ).orderBy("l_linestatus")
