"""AdaBoost.MH with decision stumps — the reference's core capability
(SURVEY.md §2 group A), re-expressed as relational dataflow on DataFrames.

Reference parity (all [R] citations reconstructed — the /root/reference
mount was empty at survey time, SURVEY.md §0):
- MultiLabeledPoint / WeightedMultiLabeledPoint
  [R] .../multilabel/MultiLabeledPoint.scala -> long-form frame
  (id, class, y, weight) + a separate exploded feature frame (id, feature,
  value); SURVEY §1.2 chose the long form so every boosting step is a plain
  relational op.
- DecisionStumpAlgorithm.run [R] .../baselearners/DecisionStump.scala ->
  :func:`stump_candidates` (A3) + prefix-sum threshold search (A4) +
  Z-criterion scoring (A5) + argmin (A6).
- AdaBoostMHAlgorithm.run [R] .../stronglearners/AdaBoostMH.scala ->
  :func:`train` (A10): driver loop, weight update + normalization (A8),
  localCheckpoint per round (plan truncation — our analogue of the
  reference's per-round re-cache).
- AdaBoostMHModel.predict [R] -> :func:`score_model` (A9): broadcast stump
  table join + hash agg.

Math (Schapire & Singer 1999, BoosTexter 2000):
  phi_{j,theta}(x) = +1 if x[j] > theta else -1
  W_+^l = sum_i w_il [y_il = phi(x_i)],  W_-^l = sum_i w_il [y_il != phi(x_i)]
  votes v_l = 0.5 ln((W_+^l + eps) / (W_-^l + eps)),  eps = 1/(2mK)
  Z(j,theta) = 2 sum_l sqrt(W_+^l W_-^l)   (minimized over candidates)
  weight update: w' = w exp(-y v_l phi(x)) / Z_norm

Scale posture (SURVEY §4.2): the candidate search pre-aggregates weights by
(feature, value, class) BEFORE the window prefix-sum, so the window input is
|distinct values| x K per feature, not m x K; the per-feature window is the
d-way shuffle documented for salting at extreme scale. Feature indices are
1-based everywhere (matches SQL element_at/list indexing in both engines).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


@dataclass
class Stump:
    """One base hypothesis h_t (reference: DecisionStumpModel [R])."""

    t: int
    feature: int  # 1-based
    threshold: float
    z: float
    votes: list[float]  # length K; h(x)[l] = votes[l] * phi(x)


def mlp_long(emb: DataFrame, num_classes: int = 10) -> DataFrame:
    """Lift single-label rows to the multi-label long form
    (id, class, y in {+1,-1}) — FIXTURES.md §2.1."""
    return emb.select(
        F.col("vec_id").alias("id"),
        F.explode(F.sequence(F.lit(0), F.lit(num_classes - 1))).alias("class"),
        "label",
    ).select(
        "id",
        "class",
        F.when(F.col("class") == F.col("label"), 1).otherwise(-1).alias("y"),
    )


def mlp_long_multi(emb: DataFrame, num_classes: int = 10) -> DataFrame:
    """True multi-label long form (BoosTexter label SETS — the reference's
    core use case, VERDICT r8 item 3): ``labels`` is an ARRAY<INT> column;
    y[i, l] = +1 iff l ∈ labels_i.  The single-label :func:`mlp_long` is
    the |labels| = 1 special case."""
    return emb.select(
        F.col("vec_id").alias("id"),
        F.explode(F.sequence(F.lit(0), F.lit(num_classes - 1))).alias("class"),
        "labels",
    ).select(
        "id",
        "class",
        F.when(F.array_contains("labels", F.col("class")), 1)
        .otherwise(-1)
        .alias("y"),
    )


def init_weights(mlp: DataFrame, m: int, num_classes: int) -> DataFrame:
    """A2: uniform initial distribution D_1(i,l) = 1/(mK)."""
    return mlp.withColumn("weight", F.lit(1.0 / (m * num_classes)))


def explode_features(emb: DataFrame) -> DataFrame:
    """A3 input: (id, feature[1-based], value) from the array column."""
    return emb.select(
        F.col("vec_id").alias("id"), F.posexplode("embedding").alias("feature", "value")
    ).withColumn("feature", F.col("feature") + 1)


def stump_class_weights(weighted: DataFrame, feats: DataFrame) -> DataFrame:
    """A3+A4: for every candidate cut (feature, threshold=observed value) and
    class, the Schapire-Singer weight masses W_+ / W_-.

    Pipeline: join exploded features with the weighted long frame on id
    (m*d x K rows), pre-aggregate to (feature, value, class) — the map-side
    combine that keeps the window small — then one cumulative-sum window per
    (feature, class) ordered by value.
    """
    joined = feats.join(weighted, "id")
    grouped = joined.groupBy("feature", "value", "class").agg(
        F.sum(F.when(F.col("y") == 1, F.col("weight")).otherwise(0.0)).alias("swp"),
        F.sum(F.when(F.col("y") == -1, F.col("weight")).otherwise(0.0)).alias("swm"),
    )
    w_cum = (
        Window.partitionBy("feature", "class")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("feature", "class")
    cum = grouped.select(
        "feature",
        F.col("value").alias("threshold"),
        "class",
        F.sum("swp").over(w_cum).alias("p_plus"),
        F.sum("swm").over(w_cum).alias("p_minus"),
        F.sum("swp").over(w_tot).alias("t_plus"),
        F.sum("swm").over(w_tot).alias("t_minus"),
    )
    # phi = +1 above the threshold: correct side mass combines the positives
    # above the cut with the negatives at/below it
    return cum.select(
        "feature",
        "threshold",
        "class",
        (F.col("t_plus") - F.col("p_plus") + F.col("p_minus")).alias("w_plus"),
        (F.col("t_minus") - F.col("p_minus") + F.col("p_plus")).alias("w_minus"),
    )


def uniform_class_weights(
    emb: DataFrame, num_features: int, num_classes: int, m: int
) -> DataFrame:
    """A3+A4 for ROUND ONE (uniform weights): the weighted long frame is a
    pure function of the scan, so the feats-x-weights join of
    :func:`stump_class_weights` fuses away — one pass over the source
    explodes (feature, class) pairs directly, saving both join shuffles.
    The training loop keeps the join because its weights evolve; this is
    the plan you want wherever weights are derivable (first round,
    re-initialization, uniform-importance scoring). Numbers are identical
    to the join formulation."""
    base = (
        emb.select(
            F.col("vec_id").alias("id"),
            "label",
            F.posexplode(F.slice("embedding", 1, num_features)).alias("f0", "value"),
        )
        .select(
            "id",
            "label",
            (F.col("f0") + 1).alias("feature"),
            "value",
            F.explode(F.sequence(F.lit(0), F.lit(num_classes - 1))).alias("class"),
        )
        .select(
            "feature",
            "value",
            "class",
            F.when(F.col("class") == F.col("label"), 1).otherwise(-1).alias("y"),
            F.lit(1.0 / (m * num_classes)).alias("weight"),
        )
    )
    grouped = base.groupBy("feature", "value", "class").agg(
        F.sum(F.when(F.col("y") == 1, F.col("weight")).otherwise(0.0)).alias("swp"),
        F.sum(F.when(F.col("y") == -1, F.col("weight")).otherwise(0.0)).alias("swm"),
    )
    w_cum = (
        Window.partitionBy("feature", "class")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("feature", "class")
    cum = grouped.select(
        "feature",
        F.col("value").alias("threshold"),
        "class",
        F.sum("swp").over(w_cum).alias("p_plus"),
        F.sum("swm").over(w_cum).alias("p_minus"),
        F.sum("swp").over(w_tot).alias("t_plus"),
        F.sum("swm").over(w_tot).alias("t_minus"),
    )
    return cum.select(
        "feature",
        "threshold",
        "class",
        (F.col("t_plus") - F.col("p_plus") + F.col("p_minus")).alias("w_plus"),
        (F.col("t_minus") - F.col("p_minus") + F.col("p_plus")).alias("w_minus"),
    )


def stump_class_weights_salted(
    weighted: DataFrame, feats: DataFrame, n_buckets: int = 8
) -> DataFrame:
    """A4 at extreme scale (SURVEY §4.2 item 2): the per-(feature, class)
    prefix-sum window above puts ALL of a feature's rows in one window
    partition — the skew wall when one feature has ~m distinct values and m
    is 10^9. This variant salts the window by a value-range bucket (any
    monotone value->bucket map keeps prefix order):

      stage 1: per-(feature, class, bucket) partial sums        (map-side)
      stage 2: running bucket offsets over the TINY d*K*B frame  (window)
      stage 3: within-bucket prefix sums + offset               (window,
               fan-in bounded by m/B instead of m)

    Weights are summable, so offset + within-bucket prefix == global
    prefix; equality with the unsalted operator is oracle-checked
    (q_a4_prefix_weights_salted shares q_a4's DuckDB SQL).
    """
    joined = feats.join(weighted, "id")
    # monotone range bucketing: embedding values are O(1); floor(v*B/4)
    # spreads them over ~2B buckets while preserving value order
    bucket = F.floor(F.col("value") * (n_buckets / 4.0))
    grouped = (
        joined.withColumn("bucket", bucket)
        .groupBy("feature", "class", "bucket", "value")
        .agg(
            F.sum(F.when(F.col("y") == 1, F.col("weight")).otherwise(0.0)).alias("swp"),
            F.sum(F.when(F.col("y") == -1, F.col("weight")).otherwise(0.0)).alias("swm"),
        )
    )
    bucket_tot = grouped.groupBy("feature", "class", "bucket").agg(
        F.sum("swp").alias("bp"), F.sum("swm").alias("bm")
    )
    w_off = (
        Window.partitionBy("feature", "class")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_tot.select(
        "feature",
        "class",
        "bucket",
        F.coalesce(F.sum("bp").over(w_off), F.lit(0.0)).alias("off_p"),
        F.coalesce(F.sum("bm").over(w_off), F.lit(0.0)).alias("off_m"),
    )
    w_in = (
        Window.partitionBy("feature", "class", "bucket")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("feature", "class")
    cum = (
        grouped.join(offsets, ["feature", "class", "bucket"])
        .select(
            "feature",
            F.col("value").alias("threshold"),
            "class",
            (F.col("off_p") + F.sum("swp").over(w_in)).alias("p_plus"),
            (F.col("off_m") + F.sum("swm").over(w_in)).alias("p_minus"),
            F.sum("swp").over(w_tot).alias("t_plus"),
            F.sum("swm").over(w_tot).alias("t_minus"),
        )
    )
    return cum.select(
        "feature",
        "threshold",
        "class",
        (F.col("t_plus") - F.col("p_plus") + F.col("p_minus")).alias("w_plus"),
        (F.col("t_minus") - F.col("p_minus") + F.col("p_plus")).alias("w_minus"),
    )


def stump_z(class_weights: DataFrame) -> DataFrame:
    """A5: Z(feature, threshold) = 2 sum_l sqrt(W_+ W_-)."""
    return class_weights.groupBy("feature", "threshold").agg(
        (2.0 * F.sum(F.sqrt(F.col("w_plus") * F.col("w_minus")))).alias("z")
    )


def best_stump_row(zs: DataFrame) -> DataFrame:
    """A6: global argmin of Z, deterministic tiebreak (z, feature,
    threshold).  The ranking key quantizes z to 1e-9 (floor(z·1e9 + 0.5),
    mirrored in every SQL oracle): EXACT z ties are possible — e.g. the
    degenerate max-threshold cut (a constant hypothesis) has identical z on
    every feature, and the multi-label fixture makes it the argmin — and a
    raw-double rank would then hang the cross-engine choice on ~1e-16
    summation-order bits.  Sub-1e-9 gaps collapse to the (feature,
    threshold) tiebreak, which compares stored values bit-identically;
    genuine gaps (measured 1e-5 on the single-label fixture) are
    unaffected.  The REPORTED z stays raw.

    Caveat (ADVICE r9): quantization is a PROBABILITY REDUCTION, not an
    elimination — two engines' z values ~1ulp apart can still straddle a
    1e-9 bucket boundary and flip the argmin.  The window shrinks from
    "any summation-order difference decides" to "only differences that
    cross a bucket edge decide" (~1e-16/1e-9 ≈ 1e-7 of key space per tie
    candidate); the fixtures' observed gap structure (exact ties or
    ≥1e-5) keeps the residual risk off both measured regimes.  A coarser
    bucket (1e-6) would provably clear cross-engine drift for the
    measured gaps but costs genuine sub-1e-6 distinctions on unseen data
    — 1e-9 is the chosen trade, not a guarantee."""
    zq = F.floor(F.col("z") * 1e9 + 0.5)
    return zs.orderBy(zq, "feature", "threshold").limit(1)


def fit_stump(
    weighted: DataFrame, feats: DataFrame, m: int, num_classes: int, t: int = 0
) -> Stump:
    """A3-A6 (reference: DecisionStumpAlgorithm.run [R]): find the best cut
    and its confidence-rated votes.

    ONE driver action per stump search: the argmin row is broadcast-joined
    back onto the class-weight frame, so (feature, threshold, z) and all K
    votes arrive in a single K-row collect. On a cluster every action is a
    job launch — per-round latency is action-count-bound, not data-bound,
    at the reference's data sizes."""
    cw = stump_class_weights(weighted, feats)
    best = best_stump_row(stump_z(cw))
    eps = 1.0 / (2.0 * m * num_classes)
    rows = (
        cw.join(F.broadcast(best), ["feature", "threshold"])
        .select(
            "feature",
            "threshold",
            "z",
            "class",
            (
                0.5
                * F.log(
                    (F.col("w_plus") + F.lit(eps)) / (F.col("w_minus") + F.lit(eps))
                )
            ).alias("v"),
        )
        .collect()  # bounded: K rows — one per class (model-sized)
    )
    votes = [0.0] * num_classes
    for r in rows:
        votes[r["class"]] = r["v"]
    return Stump(
        t=t,
        feature=int(rows[0]["feature"]),
        threshold=float(rows[0]["threshold"]),
        z=float(rows[0]["z"]),
        votes=votes,
    )


def stumps_to_df(spark: SparkSession, stumps: list[Stump]) -> DataFrame:
    """Model-as-table (SURVEY §1.2): (t, feature, threshold, z, votes).

    Built as a literal-expression plan (``session.local_df``, r14
    optimization round, guide §4.1/§6.3): the model is embedded in the
    PLAN, so every broadcast build, parquet write, and reload of the stump
    table is a 1-task JVM-only job with no Python-worker roundtrip — the
    old ``createDataFrame`` form's 32 parallelized slices each paid a
    pickle/worker exchange on EVERY materialization (A/B on the boosting
    family: q_a9_score_model CPU 15.1 → 1.2 s, q_a12 19.9 → 5.6 s,
    q_d7_estimator_scored 15.2 → 7.0 s; identical row signatures).  Model
    tables are ≤ num_rounds rows, so one partition is the correct layout
    at any scale."""
    from ..session import local_df

    return local_df(
        spark,
        [(s.t, s.feature, s.threshold, s.z, list(s.votes)) for s in stumps],
        "t INT, feature INT, threshold DOUBLE, z DOUBLE, votes ARRAY<DOUBLE>",
    )


def update_weights(
    weighted: DataFrame, feats: DataFrame, stump: Stump, spark: SparkSession
) -> DataFrame:
    """A8: w' = w exp(-y v_l phi(x)) / Z_norm, Z_norm a global scalar agg
    (the reference's per-round action boundary [R] AdaBoostMHAlgorithm.run)."""
    phi = feats.filter(F.col("feature") == stump.feature).select(
        "id",
        F.when(F.col("value") > stump.threshold, 1.0).otherwise(-1.0).alias("phi"),
    )
    votes_arr = F.array(*[F.lit(v) for v in stump.votes])
    unnorm = (
        weighted.join(phi, "id")
        .withColumn(
            "w_raw",
            F.col("weight")
            * F.exp(
                -F.col("y")
                * F.element_at(votes_arr, F.col("class") + 1)
                * F.col("phi")
            ),
        )
    )
    # Z_norm stays IN the plan as a broadcast scalar (no driver action):
    # the reference pulls it to the driver per round [R]; we let the
    # following eager localCheckpoint materialize everything in one job
    z_norm = unnorm.agg(F.sum("w_raw").alias("z_norm"))
    return unnorm.crossJoin(F.broadcast(z_norm)).select(
        "id", "class", "y", (F.col("w_raw") / F.col("z_norm")).alias("weight")
    )


def train(
    spark: SparkSession,
    emb: DataFrame,
    num_rounds: int = 10,
    num_classes: int = 10,
    sample_fraction: float | None = None,
    feature_fraction: float | None = None,
    seed: int = 42,
    label_set_col: str | None = None,
    sample_pred: Callable[[int], Column] | None = None,
) -> list[Stump]:
    """A10 (reference: AdaBoostMHAlgorithm.run [R]): the boosting loop.

    Driver-orchestrated like the reference, but all state lives in
    DataFrames; localCheckpoint per round truncates both RDD lineage and the
    Catalyst plan (SURVEY §4.2 item 1 — the one genuinely non-free part of
    DataFrame-native boosting). A12: optional instance/feature subsampling
    before each stump search.  ``label_set_col`` names an ARRAY<INT>
    multi-label column (BoosTexter label sets); None = single-label
    ``label``.

    ``sample_pred`` (VERDICT r10 item 2) is the DETERMINISTIC instance
    sampler: a callable ``t -> boolean Column over 'id'`` applied as a plain
    filter on the weighted frame before round t's stump search.  Unlike
    ``sample_fraction`` (seeded RNG, engine-specific), a pure-arithmetic
    predicate is expressible identically in SQL, making sampled training
    exactly oracle-checkable — and it is also the better 100-TB shape: a
    pushed-down filter instead of a sampled-id broadcast join.  Mutually
    exclusive with ``sample_fraction`` (predicate wins if both are set).
    """
    if label_set_col is not None:
        emb = emb.select(
            "vec_id", "embedding", F.col(label_set_col).alias("labels")
        ).persist()
        mlp = mlp_long_multi(emb, num_classes)
    else:
        emb = emb.select("vec_id", "embedding", "label").persist()
        mlp = mlp_long(emb, num_classes)
    m = emb.count()
    feats = explode_features(emb).persist()
    weighted = init_weights(mlp, m, num_classes)
    weighted = weighted.localCheckpoint(eager=True)

    stumps: list[Stump] = []
    # loop-invariant: feature count never changes between rounds, so the
    # one action that computes it runs once, not once per round
    n_feats = (
        feats.agg(F.max("feature")).collect()[0][0]  # bounded: 1-row max agg
        if feature_fraction is not None
        else None
    )
    for t in range(num_rounds):
        search_w, search_f = weighted, feats
        if sample_pred is not None:
            search_w = weighted.filter(sample_pred(t))
        elif sample_fraction is not None:
            ids = emb.select("vec_id").sample(sample_fraction, seed + t).select(
                F.col("vec_id").alias("id")
            )
            search_w = weighted.join(F.broadcast(ids), "id")
        if feature_fraction is not None:
            keep = max(1, int(n_feats * feature_fraction))
            # deterministic per-round rotation of the feature subset
            search_f = feats.filter(
                ((F.col("feature") + t) % n_feats) < keep
            )
        stump = fit_stump(search_w, search_f, m, num_classes, t)
        stumps.append(stump)
        weighted = update_weights(weighted, feats, stump, spark)
        weighted = weighted.localCheckpoint(eager=True)
    feats.unpersist()
    emb.unpersist()
    return stumps


def score_model(emb: DataFrame, stumps_df: DataFrame) -> DataFrame:
    """A9 (reference: AdaBoostMHModel.predict [R]): H(x)[l] = sum_t h_t(x)[l]
    via broadcast stump join + hash agg. Returns (id, class, score, pred)."""
    stump_long = stumps_df.select(
        "t", "feature", "threshold", F.posexplode("votes").alias("class", "v")
    )
    phi = emb.select(F.col("vec_id").alias("id"), "embedding").crossJoin(
        F.broadcast(stumps_df.select("t", "feature", "threshold"))
    ).select(
        "id",
        "t",
        F.when(
            F.element_at("embedding", F.col("feature")) > F.col("threshold"), 1.0
        )
        .otherwise(-1.0)
        .alias("phi"),
    )
    return (
        phi.join(F.broadcast(stump_long.select("t", "class", "v")), "t")
        .groupBy("id", "class")
        .agg(F.sum(F.col("v") * F.col("phi")).alias("score"))
        .select(
            "id",
            "class",
            "score",
            F.when(F.col("score") > 0, 1).otherwise(-1).alias("pred"),
        )
    )


def hamming_loss(scored: DataFrame, mlp: DataFrame) -> DataFrame:
    """A11: fraction of (i,l) pairs where sign(H) != y."""
    return (
        scored.join(mlp, ["id", "class"])
        .agg(
            F.round(
                F.avg(F.when(F.col("pred") != F.col("y"), 1.0).otherwise(0.0)), 6
            ).alias("hamming_loss"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
    )
