"""Streaming semantics tests (SURVEY.md §5.2 item 4): replay equivalence,
late-data handling, dedup, and stateful processing."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_multiboost_spark.registry import all_queries
from spark_multiboost_spark.session import load_tables


def test_c4_watermark_final_windows_match_batch(spark, sf_dir):
    """Windows finalized by the watermark must equal the batch C1 answer
    for those windows (replay in event-time order drops nothing)."""
    stream_out = all_queries()["q_c4_watermark_tumbling"].fn(spark, sf_dir)
    batch = (
        load_tables(spark, sf_dir)["events"]
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    s = {(r["window_start"], r["event_type"]): r["n"] for r in stream_out.collect()}
    b = {(r["window_start"], r["event_type"]): r["n"] for r in batch.collect()}
    # append mode withholds unfinalized windows; everything emitted must
    # match batch exactly
    assert len(s) > 0
    for k, v in s.items():
        assert b.get(k) == v, f"window {k}: stream={v} batch={b.get(k)}"


def test_c5_dedup_removes_injected_dupes(spark, sf_dir):
    out = all_queries()["q_c5_stream_dedup"].fn(spark, sf_dir)
    events = load_tables(spark, sf_dir)["events"]
    expected = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {r["event_type"]: r["n"] for r in out.collect()}
    assert got == expected  # duplicates fully removed


def test_c6_stateful_final_counts(spark, sf_dir):
    out = all_queries()["q_c6_stateful_sessions"].fn(spark, sf_dir)
    events = load_tables(spark, sf_dir)["events"]
    expected = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # update mode emits one row per user per batch; the max n_events per
    # user must equal the total batch count
    final = (
        out.groupBy("user_id").agg(F.max("n_events").alias("n_events")).collect()
    )
    got = {r["user_id"]: r["n_events"] for r in final}
    assert got == expected


def test_c4_true_late_row_dropped(spark, sf_dir, tmp_path):
    """A row arriving AFTER the watermark passed its window must be dropped
    in append mode — the actual late-data semantics, not just replay
    equivalence."""
    import os
    import shutil

    import pandas as pd

    from spark_multiboost_spark.streaming.jobs import (
        _read_stream,
        _replay_dir,
        _run_to_memory,
    )

    # the replay dir is sf-keyed and REUSED across queries (round 10):
    # inject the late file into this test's own copy, never in place
    src = _replay_dir(spark, sf_dir)
    path = str(tmp_path / "events_late")
    os.makedirs(path)
    files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    for f in files:
        shutil.copy(os.path.join(src, f), os.path.join(path, f))
    first = pd.read_parquet(os.path.join(src, files[0]))
    # craft a late event: timestamp at the very start of the stream, but
    # arriving in a file AFTER every on-time file (watermark long past it)
    late = first.iloc[[0]].copy()
    late["event_id"] = 999_999_999
    late.to_parquet(os.path.join(path, "part-zzzz-late.parquet"))
    late_window = late["ts"].dt.floor("h").iloc[0]
    late_type = late["event_type"].iloc[0]

    stream = _read_stream(spark, path)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    out = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in _run_to_memory(agg, mode="append").collect()
    }
    batch_without_late = (
        load_tables(spark, sf_dir)["events"]
        .filter(
            (F.date_trunc("hour", "ts") == F.lit(late_window))
            & (F.col("event_type") == late_type)
        )
        .count()
    )
    emitted = out.get((late_window.to_pydatetime(), late_type))
    # the late duplicate was NOT counted: emitted == on-time batch count
    assert emitted == batch_without_late


def test_c8_stream_stream_join_matches_batch(spark, sf_dir):
    """The watermarked stream-stream join must produce exactly the batch
    range-join pairs (replay is in event-time order, so nothing is late)."""
    out = all_queries()["q_c8_stream_stream_join"].fn(spark, sf_dir)
    ev = load_tables(spark, sf_dir)["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"),
        F.col("event_id").alias("purchase_id"),
    )
    batch = purchases.join(
        clicks,
        (F.col("cu") == F.col("pu"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("cts") < F.col("pts")),
    ).select("purchase_id", "click_id")
    got = {(r["purchase_id"], r["click_id"]) for r in out.collect()}
    want = {(r["purchase_id"], r["click_id"]) for r in batch.collect()}
    assert got == want


def test_c9_streaming_similarity_matches_batch(spark, sf_dir):
    """Per-micro-batch retrieval must equal the batch flagship's answer for
    the same query set (same scoring math, same tiebreaks)."""
    out = all_queries()["q_c9_streaming_similarity"].fn(spark, sf_dir)
    batch = all_queries()["q_d3_topk_cosine"].fn(spark, sf_dir)
    got = {(r["qid"], r["rank"]): (r["cid"], r["cos_sim"]) for r in out.collect()}
    want = {(r["qid"], r["rank"]): (r["cid"], r["cos_sim"]) for r in batch.collect()}
    assert got == want


def test_streaming_curation_matches_batch_gates(spark, sf_dir):
    """The streamed stateless gates + static near-dup probe must agree
    exactly with the same gates computed in batch."""
    from pyspark.sql import functions as F

    from spark_multiboost_spark.functions.dedup import minhash_lsh
    from spark_multiboost_spark.operators.composites import (
        PIPE_LANG_DROP,
        PIPE_MAX_TOK,
        PIPE_MIN_TOK,
    )
    from spark_multiboost_spark.registry import all_queries
    from spark_multiboost_spark.session import load_tables

    streamed = (
        all_queries()["q_c10_streaming_curation"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    d = load_tables(spark, sf_dir)["documents"]
    toks = F.split("text", " ")
    gs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("toks") - 2, F.lit(0))),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("toks"), i),
            F.element_at(F.col("toks"), i + 1),
            F.element_at(F.col("toks"), i + 2),
        ),
    )
    removed = (
        minhash_lsh(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("is_near_dup", F.lit(True))
    )
    batch = (
        d.select("doc_id", "lang", toks.alias("toks"))
        .select(
            "doc_id",
            "lang",
            F.size("toks").cast("bigint").alias("n_tokens"),
            F.when(
                F.size("toks") >= 3,
                (F.size(gs) - F.size(F.array_distinct(gs))).cast("double")
                / F.size(gs),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
        .join(removed, "doc_id", "left")
        .withColumn(
            "kept",
            (F.col("lang") != PIPE_LANG_DROP)
            & F.col("n_tokens").between(PIPE_MIN_TOK, PIPE_MAX_TOK)
            & (F.col("dup_frac") == 0)
            & F.col("is_near_dup").isNull(),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("kept").cast("int")).alias("n_kept"),
        )
        .toPandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    assert streamed.equals(batch)
    assert streamed["n_kept"].sum() > 0
    assert (streamed["n_kept"] < streamed["n_docs"]).any()


def test_streaming_curation_sink_lands_partitioned_lake(spark, sf_dir):
    """C11: the append-mode parquet sink must land per-doc decisions under
    lang=... partition directories, and the landed lake's rollup must equal
    the memory-sink rollup (q_c10) on the same corpus."""
    import glob

    from spark_multiboost_spark.registry import all_queries
    from spark_multiboost_spark.streaming import jobs

    sink_df = all_queries()["q_c11_streaming_curation_sink"].fn(spark, sf_dir)
    sink = sink_df.toPandas().sort_values("lang").reset_index(drop=True)
    mem = (
        all_queries()["q_c10_streaming_curation"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    assert list(sink["lang"]) == list(mem["lang"])
    assert list(sink["n_docs"]) == [int(x) for x in mem["n_docs"]]
    assert list(sink["n_kept"]) == [int(x) for x in mem["n_kept"]]
    # the lake really is lang-partitioned on disk — glob the ACTUAL lake
    # path the query just wrote (the old /tmp/smb_sink_* prefix glob kept
    # passing against stale dirs from earlier sessions after the round-12
    # scratch refactor moved the sink, then failed on a clean host)
    # ADVICE r12: resolve via the plan-derived per-invocation registry —
    # survives DataFrame copies/wrappers, unlike the old ad-hoc attribute
    lake = jobs.sink_lake_for(sink_df) or jobs.LAST_SINK_LAKE
    assert lake, "q_c11 did not record its lake path"
    lakes = sorted(glob.glob(os.path.join(lake, "lang=*")))
    assert lakes, "no lang=... partition directories found under the sink"


def test_streaming_cdc_merge_equals_batch_scd1(spark, sf_dir):
    """The micro-batched copy-on-write merge must converge to exactly the
    single-shot batch SCD1 result — keys, prices, and change labels."""
    from spark_multiboost_spark.registry import all_queries

    stream = (
        all_queries()["q_c12_streaming_cdc_merge"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    batch = (
        all_queries()["q_ext_upsert_scd1"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    assert stream.equals(batch)


def test_c6_final_state_equals_batch_totals(spark, sf_dir):
    # the stateful stream's LAST update per user must equal the batch
    # groupBy totals exactly — converts C6 from "ran" to verified semantics
    import pyspark.sql.functions as F

    from spark_multiboost_spark.registry import all_queries
    from spark_multiboost_spark.session import load_tables

    out = all_queries()["q_c6_stateful_sessions"].fn(spark, sf_dir).toPandas()
    final = (
        out.sort_values(["user_id", "n_events"])
        .groupby("user_id", as_index=False)
        .last()
    )
    batch = (
        load_tables(spark, sf_dir)["events"]
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("value").alias("max_value"),
        )
        .toPandas()
    )
    f = final.sort_values("user_id").reset_index(drop=True)
    b = batch.sort_values("user_id").reset_index(drop=True)
    assert list(f["user_id"]) == list(b["user_id"])
    assert list(f["n_events"]) == list(b["n_events"])
    assert [float(x) for x in f["max_value"]] == [float(x) for x in b["max_value"]]


def test_c6_rocksdb_state_store_equivalence(spark, sf_dir):
    """C6 on the RocksDB state store (VERDICT r8 item 5): the
    transformWithStateInPandas API stays registration-gated because this
    container has NO google.protobuf at all (12th probe, round 11:
    `import google.protobuf` -> ModuleNotFoundError: No module named
    'google'; no wheel exists on disk and installs are barred, so the
    Python-side state protocol cannot run).  The state BACKEND the gated
    query was meant to exercise is JVM-side, though — so this test runs the
    applyInPandasWithState job (Arrow state serde, no protobuf) on
    RocksDBStateStoreProvider and asserts its final per-user state equals
    both the default-provider run and the batch groupBy totals exactly."""

    def final_totals(pdf):
        return (
            pdf.sort_values(["user_id", "n_events"])
            .groupby("user_id", as_index=False)
            .last()
            .sort_values("user_id")
            .reset_index(drop=True)
        )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        rocks = final_totals(
            all_queries()["q_c6_stateful_sessions"].fn(spark, sf_dir).toPandas()
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    default = final_totals(
        all_queries()["q_c6_stateful_sessions"].fn(spark, sf_dir).toPandas()
    )
    batch = (
        load_tables(spark, sf_dir)["events"]
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("value").alias("max_value"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert len(rocks) > 0
    for other in (default, batch):
        assert list(rocks["user_id"]) == list(other["user_id"])
        assert list(rocks["n_events"]) == list(other["n_events"])
        assert [float(x) for x in rocks["max_value"]] == [
            float(x) for x in other["max_value"]
        ]


def test_c19_streaming_priority_sample_equals_batch(spark, sf_dir):
    """The streaming priority sample's FINAL per-source top-5 (rows at the
    max n_seen per source) must equal the batch q_d5_priority_sample
    exactly — priority sampling is order-independent, so micro-batch
    boundaries must not change the sample."""
    out = (
        all_queries()["q_c19_streaming_priority_sample"]
        .fn(spark, sf_dir)
        .toPandas()
    )
    final = out[
        out["n_seen"] == out.groupby("source")["n_seen"].transform("max")
    ].sort_values(["source", "rk"]).reset_index(drop=True)
    batch = (
        all_queries()["q_d5_priority_sample"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values(["source", "rk"])
        .reset_index(drop=True)
    )
    assert list(final["source"]) == list(batch["source"])
    assert list(final["doc_id"]) == list(batch["doc_id"])
    assert list(final["rk"]) == list(batch["rk"])
    assert [float(x) for x in final["priority"]] == [
        float(x) for x in batch["priority"]
    ]


def test_c20_streaming_budget_sample_equals_batch(spark, sf_dir):
    """The streaming budget sampler's FINAL per-language admitted set (rows
    at the max n_seen per lang) must equal the batch q_d5_budget_sample
    exactly — the quota table is static and priority admission is
    order-independent, so micro-batch boundaries must not change the
    sample.  Also pins the bounded-state contract: every language's final
    set is exactly its quota (each fixture language saturates or caps)."""
    out = (
        all_queries()["q_c20_streaming_budget_sample"]
        .fn(spark, sf_dir)
        .toPandas()
    )
    final = out[
        out["n_seen"] == out.groupby("lang")["n_seen"].transform("max")
    ].sort_values(["lang", "rk"]).reset_index(drop=True)
    batch = (
        all_queries()["q_d5_budget_sample"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values(["lang", "rk"])
        .reset_index(drop=True)
    )
    assert len(final) == len(batch) > 0
    assert list(final["lang"]) == list(batch["lang"])
    assert list(final["quota"]) == list(batch["quota"])
    assert list(final["rk"]) == list(batch["rk"])
    assert list(final["doc_id"]) == list(batch["doc_id"])
    assert [float(x) for x in final["priority"]] == [
        float(x) for x in batch["priority"]
    ]
    # bounded state: per-lang admitted rows == quota exactly
    sizes = final.groupby("lang").size()
    quotas = final.groupby("lang")["quota"].first()
    assert (sizes == quotas).all()


def test_c14_streaming_topk_equals_batch(spark, sf_dir):
    import pyspark.sql.functions as F

    from spark_multiboost_spark.registry import all_queries
    from spark_multiboost_spark.session import load_tables

    got = all_queries()["q_c14_streaming_topk"].fn(spark, sf_dir).toPandas()
    batch = (
        load_tables(spark, sf_dir)["events"]
        .groupBy("user_id")
        .agg(F.max("value").alias("max_value"))
        .orderBy(F.col("max_value").desc(), "user_id")
        .limit(10)
        .toPandas()
    )
    assert list(got["user_id"]) == list(batch["user_id"])
    assert [float(x) for x in got["max_value"]] == [
        float(x) for x in batch["max_value"]
    ]


def test_c15_ingestion_metrics_conserves_and_advances(spark, sf_dir):
    import pyspark.sql.functions as F

    from spark_multiboost_spark.registry import all_queries
    from spark_multiboost_spark.session import load_tables

    got = all_queries()["q_c15_ingestion_metrics"].fn(spark, sf_dir).toPandas()
    ev = load_tables(spark, sf_dir)["events"]
    total = ev.count()
    # conservation: every fixture row is accounted for exactly once
    assert int(got["n_rows"].sum()) == total
    # replay order == event-time order, so batch min_ts advances monotonically
    mins = list(got.sort_values("batch_id")["min_ts"])
    assert mins == sorted(mins)
    # exact-decimal ledger reconciles against the batch total
    batch_total = ev.agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
    ).collect()[0][0]
    assert abs(got["total_value"].sum() - batch_total) < 1e-6
    # within every batch the span is well-formed
    assert (got["min_ts"] <= got["max_ts"]).all()


def test_c16_query_progress_conserves_rows(spark, sf_dir):
    from spark_multiboost_spark.registry import all_queries
    from spark_multiboost_spark.session import load_tables

    got = all_queries()["q_c16_query_progress"].fn(spark, sf_dir).toPandas()
    assert len(got) >= 1
    total = load_tables(spark, sf_dir)["events"].count()
    # engine-reported input rows across batches account for every fixture row
    assert int(got["num_input_rows"].sum()) == total
    # the windowed aggregation keeps state; the engine must report it
    assert int(got["state_rows"].max()) > 0


def test_c17_streaming_gopher_gate_equals_batch(spark, sf_dir):
    """The streamed Gopher gate must agree EXACTLY with the batch
    q_d5_gopher_rules rollup — the gate decision is per-row and must not
    depend on micro-batch boundaries."""
    from spark_multiboost_spark.registry import all_queries

    qs = all_queries()
    streamed = (
        qs["q_c17_streaming_gopher_gate"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    batch = (
        qs["q_d5_gopher_rules"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert list(streamed.columns) == list(batch.columns)
    assert streamed.equals(batch)


def test_c18_streaming_contamination_equals_batch(spark, sf_dir):
    """The streamed contamination gate must agree EXACTLY with the batch
    q_d5_contamination overlap table — shingling is per-row and the join
    is stream-static, so micro-batch boundaries must not change counts."""
    from spark_multiboost_spark.registry import all_queries

    qs = all_queries()
    key = ["bench_doc", "doc_id"]
    streamed = (
        qs["q_c18_streaming_contamination"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    batch = (
        qs["q_d5_contamination"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert list(streamed.columns) == list(batch.columns)
    assert streamed.equals(batch)


def test_c20_rocksdb_state_store_equivalence(spark, sf_dir):
    """C20 on the RocksDB state store: the budget-admission operator's
    bounded per-language state (two quota-length arrays + counters) must
    survive the scalable JVM-side backend unchanged — final admitted sets
    on RocksDBStateStoreProvider equal the default provider's AND the
    batch waterfill sampler exactly (the c6 equivalence discipline applied
    to the round-12 operator)."""

    def final_set(pdf):
        return (
            pdf[pdf["n_seen"] == pdf.groupby("lang")["n_seen"].transform("max")]
            .sort_values(["lang", "rk"])
            .reset_index(drop=True)
        )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        rocks = final_set(
            all_queries()["q_c20_streaming_budget_sample"]
            .fn(spark, sf_dir)
            .toPandas()
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    batch = (
        all_queries()["q_d5_budget_sample"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values(["lang", "rk"])
        .reset_index(drop=True)
    )
    assert len(rocks) == len(batch) > 0
    for col in ("lang", "quota", "rk", "doc_id"):
        assert list(rocks[col]) == list(batch[col]), col
    assert [float(x) for x in rocks["priority"]] == [
        float(x) for x in batch["priority"]
    ]
