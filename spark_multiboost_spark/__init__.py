"""spark_multiboost_spark — a PySpark-native analytics engine with the
capabilities of BaiGang/spark_multiboost (AdaBoost.MH multi-label boosting),
re-expressed Spark-first, plus the relational / streaming / LLM-data-pipeline
surface documented in SURVEY.md §2.

Layout:
  session.py    — SparkSession builder + fixture-table registry
  registry.py   — query registry (queries() / oracle_sql() contract)
  operators/    — relational + window + set ops (SURVEY §2 group B)
  functions/    — vector math, text analysis (groups D3, D4, ext)
  sources/      — readers/writers (B1-B3)
  streaming/    — structured streaming jobs + batch equivalents (group C)
  ml/           — AdaBoost.MH estimator/model (group A / D7)
  plans/        — iterative-plan management (localCheckpoint helpers)
"""

__version__ = "0.1.0"
