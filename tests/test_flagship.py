from __future__ import annotations

from tests.harness import compare


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"qid", "cid", "rank", "cos_sim", "label_match"} == set(df.columns)


def test_flagship_oracle(spark, sf_dir):
    compare(spark, "q_d3_topk_cosine", sf_dir)


def test_knn_label_agreement_oracle(spark, sf_dir):
    compare(spark, "q_d3_knn_label_agreement", sf_dir)


def test_bucketed_ann_oracle(spark, sf_dir):
    compare(spark, "q_d3_bucketed_ann", sf_dir)
