"""Unit tests porting the reference's test scenarios (SURVEY.md §5.1-5.2):
DecisionStumpSuite's hand-built argmin check and AdaBoostMHSuite's
loss-decrease check, plus the sf0.001 end-to-end quality anchor."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spark_multiboost_spark.ml import boosting


@pytest.fixture(scope="module")
def stump_unit(spark):
    """FIXTURES.md §2.4: 6 rows, 2 features, K=2; optimal cut is feature 1
    (1-based) at a threshold in (0.3, 0.4)."""
    rows = []
    f0 = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6]
    for i in range(6):
        y0 = 1 if i >= 3 else -1
        rows.append((i + 1, [f0[i], 1.0], 0 if y0 == 1 else 1))
    emb = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>, label INT"
    )
    weighted = boosting.init_weights(boosting.mlp_long(emb, 2), 6, 2)
    feats = boosting.explode_features(emb)
    return emb, weighted, feats


def test_stump_search_known_argmin(stump_unit):
    emb, weighted, feats = stump_unit
    stump = boosting.fit_stump(weighted, feats, m=6, num_classes=2)
    # separable at feature 1 between 0.3 and 0.4; threshold = last value of
    # the low block = 0.3 (phi: x > theta)
    assert stump.feature == 1
    assert abs(stump.threshold - 0.3) < 1e-12
    # class 0 is positive above the cut -> positive vote; class 1 inverse
    assert stump.votes[0] > 0 and stump.votes[1] < 0
    assert stump.z < 1.0  # better than chance


def test_weight_update_normalizes(stump_unit, spark):
    emb, weighted, feats = stump_unit
    stump = boosting.fit_stump(weighted, feats, m=6, num_classes=2)
    new_w = boosting.update_weights(weighted, feats, stump, spark)
    total = new_w.agg(F.sum("weight")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


def test_training_learns_separable_data(spark):
    """On separable data (label = which third of feature 1's range) the
    booster must drive training Hamming loss well below the 1/K baseline —
    the AdaBoostMHSuite scenario [R] (reconstructed, SURVEY §5.1)."""
    k = 3
    rows = []
    for i in range(90):
        f1 = (i % 9) / 9.0  # 0.0 .. 0.888
        label = int(f1 * 3)  # thirds -> 0,1,2
        rows.append((i, [f1, float((i * 7) % 5) / 5.0], label))
    emb = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>, label INT"
    )
    stumps = boosting.train(spark, emb, num_rounds=6, num_classes=k)
    scored = boosting.score_model(emb, boosting.stumps_to_df(spark, stumps))
    mlp = boosting.mlp_long(emb, k)
    loss = boosting.hamming_loss(scored, mlp).collect()[0]["hamming_loss"]
    assert loss < 1.0 / k / 2  # far below the all-negative baseline (1/3)


def test_training_on_fixture_embeddings(spark, sf_dir):
    """Fixture labels are noise w.r.t. embeddings (verified: 5-NN label
    agreement 0.089 ~= chance 0.1), so the all-negative state (Hamming
    loss = 1/K = 0.1) is the optimum; training must reach/hold it and not
    diverge."""
    from spark_multiboost_spark.session import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"]
    mlp = boosting.mlp_long(emb, 10)
    stumps = boosting.train(spark, emb, num_rounds=3, num_classes=10)
    scored = boosting.score_model(emb, boosting.stumps_to_df(spark, stumps))
    loss = boosting.hamming_loss(scored, mlp).collect()[0]["hamming_loss"]
    assert loss <= 0.1 + 1e-9


def test_train_z_bound_monotone(spark, sf_dir):
    """Training error bound prod_t Z_t (Schapire-Singer) must shrink."""
    from spark_multiboost_spark.session import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"]
    stumps = boosting.train(spark, emb, num_rounds=3, num_classes=10)
    zs = [s.z for s in stumps]
    assert all(z < 1.0 for z in zs)
    bound = math.prod(zs)
    assert bound < zs[0]


def test_estimator_pipeline(spark, sf_dir):
    from spark_multiboost_spark.ml.estimator import AdaBoostMHClassifier
    from spark_multiboost_spark.session import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"]
    clf = AdaBoostMHClassifier(numRounds=2, numClasses=10)
    model = clf.fit(emb)
    out = model.transform(emb)
    assert "scores" in out.columns and "predicted_labels" in out.columns
    row = out.filter(F.col("vec_id") == 0).collect()[0]
    assert len(row["scores"]) == 10


def test_a12_sampled_training_deterministic(spark, sf_dir):
    """A12 regression lock (VERDICT r8 item 7): sampled training with a
    fixed seed is deterministic within Spark (sample() is a seeded hash of
    the row content), so the exact chosen stumps are pinned here — the
    oracle cannot cross engines for seeded sampling, but the choice must
    never drift across Spark versions/partitionings unnoticed."""
    from spark_multiboost_spark.session import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"]
    runs = [
        boosting.train(
            spark, emb, num_rounds=2, num_classes=10,
            sample_fraction=0.5, seed=42,
        )
        for _ in range(2)
    ]
    picks = [[(s.feature, s.threshold) for s in stumps] for stumps in runs]
    assert picks[0] == picks[1], "seeded sampled training must be repeatable"
    # pin the exact stumps at sf0.001 (the regression lock itself) — what
    # matters is that the (feature, threshold) pair is STABLE, not what it is
    if sf_dir.rstrip("/").endswith("sf0.001"):
        assert picks[0] == [
            (1, 0.3503933548927307),
            (57, -0.12729206681251526),
        ], f"sampled-training stump drift: {picks[0]}"


def test_a12_hash_sample_binds(spark, sf_dir):
    """A12 exact-oracle twin (VERDICT r10 item 2) non-vacuity: the
    multiplicative-congruential selector must pick a STRICT subset each
    round (neither empty nor everything — an all-pass predicate would make
    the 'sampled' oracle a plain D7 rerun), the two rounds must select
    DIFFERENT id sets, and the hash-sampled model must differ from the
    unsampled one somewhere (stump or vote) so the oracle exercises the
    sampling path."""
    from spark_multiboost_spark.ml.queries import (
        D7_FEATS,
        D7_ROUNDS,
        K,
        _a12_sample_pred,
    )
    from spark_multiboost_spark.session import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"]
    ids = emb.select(F.col("vec_id").alias("id"))
    m = ids.count()
    picked = [ids.filter(_a12_sample_pred(t)).count() for t in range(D7_ROUNDS)]
    assert all(0 < p < m for p in picked), f"sampler degenerate: {picked} of {m}"
    sym_diff = (
        ids.filter(_a12_sample_pred(0) != _a12_sample_pred(1)).count()
    )
    assert sym_diff > 0, "rounds select identical id sets — STEP rotation inert"

    emb4 = emb.withColumn("embedding", F.slice("embedding", 1, D7_FEATS))
    sampled = boosting.train(
        spark, emb4, num_rounds=D7_ROUNDS, num_classes=K,
        sample_pred=_a12_sample_pred, feature_fraction=3 / D7_FEATS,
    )
    full = boosting.train(spark, emb4, num_rounds=D7_ROUNDS, num_classes=K)
    assert [(s.feature, s.threshold, s.votes) for s in sampled] != [
        (s.feature, s.threshold, s.votes) for s in full
    ], "hash-sampled training identical to full training — sampling inert"


def test_multilabel_training_learns_separable_sets(spark):
    """True multi-label training (VERDICT r8 item 3): rows carry label SETS
    {third, third+3} over K=6; separable at feature 1, so multi-label
    Hamming loss must fall well below the all-negative baseline (2/6)."""
    rows = []
    for i in range(90):
        f1 = (i % 9) / 9.0
        third = int(f1 * 3)
        rows.append((i, [f1, float((i * 7) % 5) / 5.0], [third, third + 3]))
    emb = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>, labels ARRAY<INT>"
    )
    stumps = boosting.train(
        spark, emb, num_rounds=6, num_classes=6, label_set_col="labels"
    )
    scored = boosting.score_model(emb, boosting.stumps_to_df(spark, stumps))
    mlp = boosting.mlp_long_multi(emb, 6)
    loss = boosting.hamming_loss(scored, mlp).collect()[0]["hamming_loss"]
    assert loss < 2.0 / 6 / 2  # far below the all-negative baseline


def test_multilabel_estimator_predicts_sets(spark, sf_dir):
    """The labelSetCol path must flow through the Estimator API and emit
    multi-class predicted label sets."""
    from spark_multiboost_spark.ml.estimator import AdaBoostMHClassifier
    from spark_multiboost_spark.session import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"].withColumn(
        "labels", F.array(F.col("label"), (F.col("label") + 1) % 10)
    )
    clf = AdaBoostMHClassifier(numRounds=2, numClasses=10, labelSetCol="labels")
    model = clf.fit(emb)
    out = model.transform(emb)
    assert "predicted_labels" in out.columns
    assert out.count() == emb.count()


def test_a1_text_parser_roundtrip_exact(spark, sf_dir):
    """The text serialize->parse path must reproduce every vector
    bit-exactly (Spark's double<->string cast is round-trip-safe)."""
    from spark_multiboost_spark.registry import all_queries

    row = all_queries()["q_a1_text_parser"].fn(spark, sf_dir).collect()[0]
    assert row["n_parsed"] > 0
    assert row["n_mismatch"] == 0


def test_a1_sparse_parser_roundtrip_exact(spark, sf_dir):
    """The sparse (libsvm-style idx:val -> MAP<INT,DOUBLE> -> zero-filled
    dense) path must also round-trip bit-exactly, and must actually
    exercise sparsity (non-zero entry count strictly between 0 and
    n_parsed * dim)."""
    from spark_multiboost_spark.registry import all_queries

    row = all_queries()["q_a1_sparse_parser"].fn(spark, sf_dir).collect()[0]
    assert row["n_parsed"] > 0
    assert row["n_mismatch"] == 0
    assert 0 < row["n_sparse_entries"] < row["n_parsed"] * 64


def test_als_recommendations_shape(spark, sf_dir):
    from spark_multiboost_spark.registry import all_queries

    pdf = all_queries()["q_a16_als_recommend"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 20
    assert pdf["user"].is_unique
    # implicit-feedback confidence scores are positive for observed users
    assert (pdf["score"] > 0).all()
    assert pdf["top_item"].between(0, 49).all()
