"""True Structured Streaming jobs (SURVEY.md §2 C4-C6) — rows-only checks.

Each query replays the events fixture through a REAL file-source stream
(micro-batched via maxFilesPerTrigger) and runs the streaming operator under
test with Trigger.AvailableNow, landing in a uniquely named memory sink; the
returned DataFrame reads that sink. tests/test_streaming.py asserts the
semantic properties (late-drop, dedup, state evolution) against batch
equivalents.
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import release_with
from ..registry import query
from ..session import load_tables, local_df, proc_tmpdir, sf_scratch

_EVENTS_DDL = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)

#: path of the most recent q_c11 parquet lake (set per invocation); the
#: on-disk-layout test reads this instead of globbing a /tmp prefix.
#: DOCUMENTED FALLBACK only — prefer :func:`sink_lake_for` (ADVICE r12)
LAST_SINK_LAKE: str | None = None

#: per-invocation registry of q_c11 lake paths, keyed by invocation
#: sequence (insertion-ordered); :func:`sink_lake_for` resolves a result
#: DataFrame back to ITS lake by matching the parquet scan in its plan
SINK_LAKES: dict[int, str] = {}


def sink_lake_for(df) -> str | None:
    """Resolve the parquet-lake path behind a ``q_c11`` result DataFrame.

    ADVICE r12: the old ad-hoc ``_smb_sink_lake`` attribute silently fell
    off any wrapper that copies/recreates the DataFrame (``cache()``,
    ``checkpoint()``, a Spark Connect rebuild).  This accessor is
    plan-derived instead: the q_c11 result aggregates a parquet scan of its
    lake, so ``df.inputFiles()`` names files under exactly one registered
    lake — match against the per-invocation registry (newest first, so
    interleaved calls in one process each resolve their own path).  Falls
    back to the newest registered lake, then the module global."""
    try:
        files = list(df.inputFiles())
    except Exception:
        files = []
    for _, lake in sorted(SINK_LAKES.items(), reverse=True):
        # inputFiles returns file:///... URIs; the posix path is a substring
        if any(lake in f for f in files):
            return lake
    if SINK_LAKES:
        return SINK_LAKES[max(SINK_LAKES)]
    return LAST_SINK_LAKE


def _replay_dir(spark: SparkSession, sf_dir: str, n_files: int = 4) -> str:
    """Write events as n time-ordered parquet files (micro-batch replay
    order = event-time order, so watermarks advance realistically)."""
    # sf-keyed scratch, REUSED across invocations (the content is a pure
    # deterministic function of (sf_dir, n_files)): one mkdtemp per call
    # leaked a replay copy of the table per streaming query per run.
    # Reuse keys on a _COMPLETE sentinel written AFTER the loop (ADVICE
    # r10): a raw file-count guard never matched when a tiny table yielded
    # fewer than n_files chunks (silent rebuild every call) and could not
    # tell a partially written final file from a complete layout.  The
    # underscore prefix makes Hadoop's hidden-file filter skip it, so the
    # streaming source never sees the marker.
    path = os.path.join(sf_scratch("stream", sf_dir), f"events_files_{n_files}")
    done = os.path.join(path, "_COMPLETE")
    if os.path.isfile(done):
        return path
    if os.path.isdir(path):  # sentinel missing => possibly partial; rebuild
        shutil.rmtree(path)
    t = load_tables(spark, sf_dir)
    events = t["events"].orderBy("ts", "event_id")
    n = events.count()
    per = max(1, n // n_files)
    # bounded: replay-fixture scaffolding — the sf-fixture events table is
    # materialized ONCE to cut the micro-batch input files; a production
    # stream reads files that already exist (no collect on any query path)
    pdf = events.toPandas()
    # keep µs precision: pandas defaults to ns, which round-trips to a
    # TIMESTAMP(NANOS) parquet column Spark's vectorized reader rejects
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    os.makedirs(path, exist_ok=True)
    for i in range(n_files):
        chunk = pdf.iloc[i * per : (i + 1) * per if i < n_files - 1 else n]
        if len(chunk):
            # zero-padded name: file listing order == replay order
            chunk.to_parquet(os.path.join(path, f"part-{i:04d}.parquet"))
    open(done, "w").close()
    return path


def _read_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(_EVENTS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def _run_to_memory(stream_df: DataFrame, mode: str = "append") -> DataFrame:
    name = f"smb_sink_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(300)
    if not finished:
        # reading the memory sink mid-stream would silently return partial
        # results that a rows-only check (count >= 0) cannot catch
        q.stop()
        raise RuntimeError(f"stream {name} did not finish within 300s")
    return stream_df.sparkSession.table(name)


@query("q_c4_watermark_tumbling", oracle=None, group="C")
def watermark_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: watermarked 1h tumbling aggregation over a file-replayed stream;
    append mode emits only watermark-finalized windows."""
    stream = _read_stream(spark, _replay_dir(spark, sf_dir))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    return _run_to_memory(agg, mode="append")


@query("q_c5_stream_dedup", oracle=None, group="C")
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: dropDuplicatesWithinWatermark on a stream with injected
    duplicate event_ids."""
    src = _replay_dir(spark, sf_dir)
    # inject the duplicate file into an own COPY of the replay dir: the
    # shared replay dir is reused across queries (sf_scratch), so mutating
    # it in place would feed every later stream the injected dupes.  The
    # leaf encodes the source layout (ADVICE r10 — the old hard-coded ==5
    # guard silently coupled to _replay_dir's default n_files) and reuse
    # keys on the same _COMPLETE sentinel as the source dirs.
    path = os.path.join(
        sf_scratch("stream", sf_dir), os.path.basename(src) + "_dup"
    )
    done = os.path.join(path, "_COMPLETE")
    if not os.path.isfile(done):
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)
        files = sorted(
            f for f in os.listdir(src) if f.endswith(".parquet")
        )
        for f in files:
            shutil.copy(os.path.join(src, f), os.path.join(path, f))
        dup = pd.read_parquet(os.path.join(src, files[0]))
        dup.to_parquet(os.path.join(path, "part-dup.parquet"))
        open(done, "w").close()
    stream = _read_stream(spark, path)
    deduped = stream.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    counted = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return _run_to_memory(counted, mode="complete")


@query("q_c6_stateful_sessions", oracle=None, group="C")
def stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6: custom stateful per-key processing via applyInPandasWithState —
    running per-user event count + max value carried across micro-batches
    (the hand-rolled analogue of mapGroupsWithState)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        total, vmax = (state.get if state.exists else (0, float("-inf")))
        for pdf in pdfs:
            total += len(pdf)
            if len(pdf):
                vmax = max(vmax, float(pdf["value"].max()))
        state.update((total, vmax))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [total], "max_value": [vmax]}
        )

    stream = _read_stream(spark, _replay_dir(spark, sf_dir))
    out = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id BIGINT, n_events BIGINT, max_value DOUBLE",
        stateStructType="n BIGINT, vmax DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(out, mode="update")


def _twst_available() -> bool:
    """transformWithStateInPandas drives its state protocol over protobuf;
    this container ships a broken google.protobuf (no pip install allowed),
    so the query registers only where the dependency actually works."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def transform_with_state_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 (Spark 4 API): the same per-user running totals via
    transformWithStateInPandas — the successor to applyInPandasWithState,
    with typed value state on the RocksDB state store (the state backend
    that scales past executor memory; changelog checkpointing at cluster
    scale). Kept alongside the GroupState version so both stateful APIs
    stay exercised."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n BIGINT, total_value DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (0, 0.0)
            if self._state.exists():
                n, total = self._state.get()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = _read_stream(spark, _replay_dir(spark, sf_dir))
        out = stream.groupBy("user_id").transformWithStateInPandas(
            RunningTotals(),
            outputStructType="user_id BIGINT, n_events BIGINT, total_value DOUBLE",
            outputMode="Update",
            timeMode="None",
        )
        return _run_to_memory(out, mode="update")
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


if _twst_available():
    query("q_c6_transform_with_state", oracle=None, group="C")(
        transform_with_state_totals
    )


@query("q_c8_stream_stream_join", oracle=None, group="C")
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 (beyond SURVEY's C1-C7): watermarked stream-stream inner join —
    purchases joined to the same user's clicks in the preceding 30 minutes.
    Both sides carry watermarks so the join state is bounded (Spark evicts
    rows older than watermark + range); the time-range predicate rides the
    user_id equi-key exactly like the batch range join (q_ext_range_join)."""
    path = _replay_dir(spark, sf_dir)
    clicks = (
        _read_stream(spark, path)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        _read_stream(spark, path)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "c_user = p_user AND c_ts >= p_ts - INTERVAL 30 MINUTES AND c_ts < p_ts"
        ),
    ).select("purchase_id", "p_user", "click_id")
    return _run_to_memory(joined, mode="append")


@query("q_c9_streaming_similarity", oracle=None, group="C")
def streaming_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 (beyond SURVEY's C1-C8; PAPERS.md streaming-similarity thread):
    continuous top-k retrieval — a stream of query vectors scored per
    micro-batch against the static corpus, which STAYS DISTRIBUTED.

    Shape (the serving-path shape at 100 TB, where the corpus is the big
    side): ``foreachBatch`` collects only the query micro-batch (small by
    definition — it is the arriving request set), ships it to every corpus
    partition via the shared ``build_scorer`` closure, and the corpus
    streams through the same Arrow blocked-matmul partial top-k as the
    batch flagship; a per-qid window finishes the exact global top-k.
    Round-1 `toPandas()`'d the whole corpus to the driver — fine as a
    local demo, wrong side collected at scale; this form never moves the
    corpus.  Results are identical to batch q_d3_topk_cosine for the same
    query set (asserted in tests) because candidate generation and the
    final comparator are literally the same code."""
    import numpy as np

    from pyspark.sql.window import Window

    from ..functions.similarity import CAND_SCHEMA, K, N_QUERIES, build_scorer

    emb = load_tables(spark, sf_dir)["embeddings"]
    corpus = emb.select("vec_id", "embedding", "label")

    # replay the query set as a 4-file stream (with labels so the shared
    # candidate schema is satisfied)
    qpd = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding", "label")
        .toPandas()  # bounded: the query SET (N_QUERIES rows), never the corpus
    )
    # fresh dir per invocation (replay semantics), nested under the
    # atexit-cleaned scratch root so it stops leaking
    path = os.path.join(
        tempfile.mkdtemp(prefix="qstream_", dir=proc_tmpdir("streamwork")),
        "queries",
    )
    os.makedirs(path, exist_ok=True)
    per = max(1, len(qpd) // 4)
    for i in range(4):
        chunk = qpd.iloc[i * per : (i + 1) * per if i < 3 else len(qpd)]
        if len(chunk):
            chunk.to_parquet(os.path.join(path, f"part-{i:04d}.parquet"))

    results: list[pd.DataFrame] = []

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        bq = batch_df.toPandas()  # bounded: the SMALL side — this trigger's queries
        if not len(bq):
            return
        Q = np.array([np.asarray(e, dtype=np.float64) for e in bq["embedding"]])
        q_ids = bq["vec_id"].to_numpy(np.int64)
        q_labels = bq["label"].to_numpy(np.int64)
        cand = corpus.mapInPandas(build_scorer(Q, q_ids, q_labels, K), CAND_SCHEMA)
        w = Window.partitionBy("qid").orderBy(F.col("cos_raw").desc(), F.col("cid"))
        top = (
            cand.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= K)
            .select("qid", "cid", "rank", F.round("cos_raw", 6).alias("cos_sim"))
        )
        results.append(top.toPandas())  # bounded: <= K rows per query this batch

    stream = (
        # the replay files come from the already-double-cast table
        spark.readStream.schema(
            "vec_id BIGINT, embedding ARRAY<DOUBLE>, label BIGINT"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        stream.writeStream.foreachBatch(process_batch)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError("streaming_similarity did not finish within 300s")
    out = pd.concat(results, ignore_index=True)
    return spark.createDataFrame(
        out, "qid bigint, cid bigint, rank bigint, cos_sim double"
    )


_DOCS_DDL = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


def _replay_docs_dir(spark: SparkSession, sf_dir: str, n_files: int = 4) -> str:
    """Write documents as n parquet files for file-source replay."""
    # sf-keyed + reused, like _replay_dir (content deterministic per args);
    # same _COMPLETE-sentinel reuse guard (ADVICE r10 — see _replay_dir)
    path = os.path.join(sf_scratch("stream", sf_dir), f"docs_files_{n_files}")
    done = os.path.join(path, "_COMPLETE")
    if os.path.isfile(done):
        return path
    if os.path.isdir(path):
        shutil.rmtree(path)
    docs = load_tables(spark, sf_dir)["documents"].orderBy("doc_id")
    # bounded: replay-fixture scaffolding — materialized once to cut the
    # documents-stream input files (see the events twin above)
    pdf = docs.toPandas()
    os.makedirs(path, exist_ok=True)
    per = max(1, len(pdf) // n_files)
    for i in range(n_files):
        chunk = pdf.iloc[i * per : (i + 1) * per if i < n_files - 1 else len(pdf)]
        if len(chunk):
            chunk.to_parquet(os.path.join(path, f"part-{i:04d}.parquet"))
    open(done, "w").close()
    return path


def _curation_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared gate stage for the streaming curation jobs: per-doc kept/drop
    decisions on a live document stream (stateless expressions + one
    stream-static near-dup membership join)."""
    from ..functions.dedup import minhash_lsh
    from ..operators.composites import PIPE_LANG_DROP, PIPE_MAX_TOK, PIPE_MIN_TOK

    path = _replay_docs_dir(spark, sf_dir)
    stream = spark.readStream.schema(_DOCS_DDL).option("maxFilesPerTrigger", 1).parquet(path)
    removed = (
        minhash_lsh(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("is_near_dup", F.lit(True))
    )
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
    gated = (
        stream.select("doc_id", "lang", toks.alias("toks"))
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
        .join(removed, "doc_id", "left")  # stream-static membership probe
        .withColumn(
            "kept",
            (F.col("lang") != PIPE_LANG_DROP)
            & F.col("n_tokens").between(PIPE_MIN_TOK, PIPE_MAX_TOK)
            & (F.col("dup_frac") == 0)
            & F.col("is_near_dup").isNull(),
        )
    )
    return gated.select("doc_id", "lang", "n_tokens", "dup_frac", "kept")


@query("q_c10_streaming_curation", oracle=None, group="C")
def streaming_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 (beyond SURVEY's C1-C9): the pretraining curation gates applied
    to a LIVE document stream — the ingest-time shape of
    q_comp_pretrain_pipeline.  Stateless gates (language, token-length
    band, trigram repetition) are per-row expressions that run unchanged
    on a stream; the near-dup gate joins the stream against the STATIC
    LSH-removed set (stream-static join: the dedup index is a periodically
    rebuilt batch artifact at 100 TB — the stream checks membership, it
    does not rebuild the index).  Per-(lang) kept/total counts in complete
    mode; tests assert exact equality with the batch gates on the same
    corpus."""
    gated = _curation_gated(spark, sf_dir)
    counted = gated.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("kept").cast("int")).alias("n_kept"),
    )
    return _run_to_memory(counted, mode="complete")


@query("q_c11_streaming_curation_sink", oracle=None, group="C")
def streaming_curation_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11: the SAME curation gates as q_c10, landed the way a production
    ingest actually lands them — an APPEND-mode streaming parquet sink,
    checkpointed, partitioned by ``lang`` (B3's partitioned layout under
    streaming).  The file sink's manifest log + the checkpoint give
    exactly-once appends across restarts; partitioning by the read-side
    filter key means downstream per-language jobs prune whole directories.

    Per-doc decisions append (no watermark needed: the gate stage is
    stateless plus one stream-static join); the rollup happens at READ time
    from the landed lake — at 100 TB the sink is the data lake and every
    consumer aggregates from it, not from the stream.  Returns the same
    per-lang kept/total shape as q_c10; tests assert the landed lake
    reproduces the batch gates exactly and the lang=... directories exist."""
    gated = _curation_gated(spark, sf_dir)
    # fresh sink+checkpoint per invocation (reuse would replay as
    # already-processed), nested under the atexit-cleaned scratch root
    out_dir = tempfile.mkdtemp(prefix="sink_", dir=proc_tmpdir("streamwork"))
    lake = os.path.join(out_dir, "lake")
    # recorded for the layout test: the round-12 scratch refactor moved the
    # sink off the fixed /tmp/smb_sink_* paths, and a glob against the old
    # prefix kept passing against STALE dirs from earlier sessions — expose
    # the live path instead of encoding the scheme in the test
    global LAST_SINK_LAKE
    LAST_SINK_LAKE = lake
    q = (
        gated.writeStream.format("parquet")
        .partitionBy("lang")
        .option("path", lake)
        .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError("streaming_curation_sink did not finish within 300s")
    landed = spark.read.parquet(lake)
    out = (
        landed.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("kept").cast("int")).cast("bigint").alias("n_kept"),
        )
        .orderBy("lang")
    )
    # ADVICE r12: register the path per invocation, keyed by sequence —
    # sink_lake_for(out) resolves it from the plan's parquet scan, which
    # survives wrappers that copy/recreate the DataFrame (the old ad-hoc
    # _smb_sink_lake attribute did not)
    SINK_LAKES[len(SINK_LAKES) + 1] = lake
    return out


@query("q_c12_streaming_cdc_merge", oracle=None, group="C")
def streaming_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12: CDC MERGE under streaming — the ingestion shape of a lakehouse
    table: a change stream applies onto a parquet warehouse snapshot via
    ``foreachBatch``, each micro-batch running the SAME full-outer merge
    as the batch SCD1 operator and committing a NEW snapshot directory
    (copy-on-write, exactly the Delta/Iceberg commit model — readers of
    the old snapshot are never disturbed, and a failed batch simply never
    advances the pointer).

    The warehouse is read, merged, and rewritten DISTRIBUTED in every
    batch — no driver materialization.  CDC batches partition the update
    set across micro-batches, so the final snapshot must equal the
    single-shot batch merge: tests assert row-for-row equality with
    q_ext_upsert_scd1 (prices and change classification).
    """
    o = load_tables(spark, sf_dir)["orders"]
    root = tempfile.mkdtemp(prefix="cdc_", dir=proc_tmpdir("streamwork"))
    base = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", F.col("o_totalprice").alias("price")
    )
    snap0 = os.path.join(root, "snap_0")
    base.write.mode("overwrite").parquet(snap0)
    state = {"path": snap0}

    # CDC replay files: the %3 update set split across micro-batches
    upd = (
        o.filter(F.col("o_orderkey") % 3 == 0)
        .select(
            "o_orderkey",
            (F.floor(F.col("o_totalprice") * 1.1 * 100 + 0.5) / 100).alias(
                "new_price"
            ),
        )
        .orderBy("o_orderkey")
    )
    cdc_dir = os.path.join(root, "cdc")
    os.makedirs(cdc_dir, exist_ok=True)
    updf = upd.toPandas()  # bounded: fixture replay scaffolding only (CDC is small)
    per = max(1, len(updf) // 4)
    for i in range(4):
        chunk = updf.iloc[i * per : (i + 1) * per if i < 3 else len(updf)]
        if len(chunk):
            chunk.to_parquet(os.path.join(cdc_dir, f"part-{i:04d}.parquet"))

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        wh = spark.read.parquet(state["path"])
        cdc = batch_df.select(
            F.col("o_orderkey").alias("u_orderkey"), "new_price"
        )
        merged = (
            wh.join(cdc, wh["o_orderkey"] == cdc["u_orderkey"], "full")
            .select(
                F.coalesce("o_orderkey", "u_orderkey").alias("o_orderkey"),
                F.coalesce("new_price", "price").alias("price"),
            )
        )
        nxt = os.path.join(root, f"snap_{batch_id + 1}")
        merged.write.mode("overwrite").parquet(nxt)
        state["path"] = nxt  # atomic pointer advance == the commit

    stream = (
        spark.readStream.schema("o_orderkey BIGINT, new_price DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .parquet(cdc_dir)
    )
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError("streaming_cdc_merge did not finish within 300s")

    final = spark.read.parquet(state["path"])
    ub = base.select(F.col("o_orderkey").alias("b_key"), F.col("price").alias("b_price"))
    return (
        final.join(ub, final["o_orderkey"] == ub["b_key"], "left")
        .select(
            "o_orderkey",
            "price",
            F.when(F.col("b_key").isNull(), "inserted")
            .when(F.col("price") != F.col("b_price"), "updated")
            .otherwise("kept")
            .alias("change"),
        )
        .orderBy("o_orderkey")
    )


@query("q_c13_stream_stream_left_join", oracle=None, group="C")
def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C13 (beyond C8): watermarked stream-stream LEFT OUTER join —
    purchases that did NOT follow a click surface with NULL click columns.
    Outer stream-stream joins are strictly harder than inner (C8): Spark
    can only emit the null-padded side once the watermark proves no match
    can still arrive, so results trail the watermark by the join range.
    The abandoned-cart / attribution report every event pipeline runs.

    Scale shape: both sides watermarked (state eviction at watermark +
    range); the time-range predicate rides the user_id equi-key so state
    is hash-partitioned by user — same bounded-state story as C8.  The
    final count-by-matched aggregation proves the null-padded rows arrive.
    """
    path = _replay_dir(spark, sf_dir)
    clicks = (
        _read_stream(spark, path)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        _read_stream(spark, path)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "c_user = p_user AND c_ts >= p_ts - INTERVAL 30 MINUTES AND c_ts < p_ts"
        ),
        "leftOuter",
    ).select("purchase_id", "p_user", "click_id")
    out = _run_to_memory(joined, mode="append")
    return (
        out.groupBy(F.col("click_id").isNotNull().alias("matched"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_purchases"))
        .orderBy("matched")
    )


@query("q_c14_streaming_topk", oracle=None, group="C")
def streaming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C14: GLOBAL TOP-K MAINTAINED ACROSS MICRO-BATCHES — each foreachBatch
    merges the batch's per-user value maxima into a running top-10 state
    table (merge-then-truncate, the streaming analogue of
    TakeOrderedAndProject's partial heaps).  Each batch is truncated to its
    own top-K EXECUTOR-SIDE before the collect, so both the driver transfer
    (<= K rows per batch) and the state (<= K entries) are bounded at any
    stream volume — this is how leaderboards ride a firehose without a
    full-history store.

    Rows-only by contract (true streaming), but the final table must equal
    the batch top-10 by construction; tests/test_streaming.py asserts it.
    """
    path = _replay_dir(spark, sf_dir)
    state: dict[int, float] = {}

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Executor-side pre-truncate: only the batch's OWN top-10 can alter
        # the merged top-10 (any user outside it is outranked by >= 10 users
        # whose global maxima are at least their batch maxima — max is
        # monotone across batches), so the collect is provably <= K rows per
        # micro-batch no matter how many distinct users the batch holds.
        rows = (
            batch_df.groupBy("user_id")
            .agg(F.max("value").alias("vmax"))
            .orderBy(F.col("vmax").desc(), F.col("user_id").asc())
            .limit(10)
            .collect()  # bounded: <= K rows by construction
        )
        for r in rows:
            u, v = int(r["user_id"]), float(r["vmax"])
            if u not in state or v > state[u]:
                state[u] = v
        # truncate to top-K (value desc, user asc) — keeps state bounded
        top = sorted(state.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        state.clear()
        state.update(top)

    stream = _read_stream(spark, path)
    q = stream.writeStream.outputMode("update").foreachBatch(merge_batch).start()
    q.processAllAvailable()
    q.stop()
    top = sorted(state.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    return local_df(
        spark, [(u, v) for u, v in top], "user_id bigint, max_value double"
    )


@query("q_c15_ingestion_metrics", oracle=None, group="C")
def ingestion_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C15: INGESTION OBSERVABILITY — per-micro-batch arrival accounting
    (row counts, distinct producers, event-time span, value total) the way
    a production rate-limited loader audits its firehose: maxFilesPerTrigger
    throttles the file source, and every micro-batch contributes ONE
    metrics row computed by a distributed narrow aggregate (the batch
    DataFrame never reaches the driver — only its 1-row summary does).

    The event-time span per batch is the lag/backlog signal: replay order
    is event-time order here, so min_ts must advance monotonically across
    batch_ids (tests/test_streaming.py asserts it, plus conservation:
    sum(n_rows) == fixture row count).

    At 100 TB: this is the pattern for per-batch data-quality gates (row
    budget, null-rate, freshness SLA) — a constant-size driver footprint
    regardless of stream volume; the decimal value total keeps the running
    ledger exact so restated backfills reconcile to the penny."""
    path = _replay_dir(spark, sf_dir)
    stream = _read_stream(spark, path)
    metrics: list[tuple] = []

    def audit_batch(batch_df: DataFrame, batch_id: int) -> None:
        r = batch_df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        ).collect()[0]  # bounded: 1-row aggregate per micro-batch
        if r["n_rows"]:
            metrics.append(
                (
                    int(batch_id),
                    int(r["n_rows"]),
                    int(r["n_users"]),
                    r["min_ts"],
                    r["max_ts"],
                    float(r["total_value"]),
                )
            )

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(audit_batch)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(300)
    if not finished:
        q.stop()
        raise RuntimeError("ingestion-metrics stream did not finish within 300s")
    return spark.createDataFrame(
        sorted(metrics),
        "batch_id bigint, n_rows bigint, n_users bigint, "
        "min_ts timestamp, max_ts timestamp, total_value double",
    )


@query("q_c16_query_progress", oracle=None, group="C")
def query_progress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C16: ENGINE-SIDE STREAMING TELEMETRY — the StreamingQueryListener
    companion to q_c15_ingestion_metrics: C15 audits the DATA per batch
    with its own aggregate; this captures what the ENGINE already measured
    (numInputRows, batch duration, state-store rows) from
    QueryProgressEvent, which is how production monitoring feeds
    dashboards/alerts without adding a single extra Spark job to the
    stream.

    The listener appends each progress event to a driver-side list
    (one row per micro-batch — constant footprint); the returned DataFrame
    is the progress log of a watermarked windowed aggregation replay.
    Rows-only by contract; tests assert conservation (sum of
    num_input_rows == fixture rows) and that every batch carries state
    metrics."""
    from pyspark.sql.streaming import StreamingQueryListener

    rows: list[tuple] = []

    class _Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            state_rows = sum(s.numRowsTotal for s in p.stateOperators)
            # record the source query id so events from any OTHER stream
            # running (or draining asynchronously) in this session can be
            # filtered out before the conservation check
            rows.append(
                (
                    str(p.id),
                    p.batchId,
                    int(p.numInputRows),
                    float(p.durationMs.get("triggerExecution", 0)),
                    int(state_rows),
                )
            )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = _Capture()
    spark.streams.addListener(listener)
    try:
        stream = _read_stream(spark, _replay_dir(spark, sf_dir))
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.format("noop")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        qid = str(q.id)
        finished = q.awaitTermination(300)
        if not finished:
            q.stop()
            raise RuntimeError("progress-capture stream did not finish within 300s")
        # listener events are delivered asynchronously; drain until the
        # event stream quiesces (2 consecutive unchanged polls) so a
        # partially-delivered tail can't break conservation checks
        import time as _time

        deadline = _time.time() + 30
        stable, last = 0, -1
        while _time.time() < deadline and (stable < 2 or not rows):
            cur = sum(1 for r in rows if r[0] == qid)
            stable = stable + 1 if (cur == last and cur > 0) else 0
            last = cur
            _time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)
    mine = sorted(r[1:] for r in rows if r[0] == qid)
    return local_df(
        spark,
        mine,
        "batch_id bigint, num_input_rows bigint, trigger_ms double, state_rows bigint",
    )


@query("q_c18_streaming_contamination", oracle=None, group="C")
def streaming_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C18: BENCHMARK-CONTAMINATION GATE ON A LIVE DOCUMENT STREAM — the
    ingest-time twin of q_d5_contamination: the held-out benchmark trigram
    set is built ONCE on the static side (benchmark-sized by definition ->
    broadcast), each arriving document shingles with the same stateless
    expressions the batch query uses (split/transform/distinct are
    execution-mode agnostic), and contaminated (bench_doc, doc_id) pairs
    accumulate through one stream-static broadcast join + complete-mode
    count.  A benchmark leak shows up within one micro-batch of the
    contaminated document landing — instead of at the nightly decontam
    re-scan.

    Rows-only by contract (true streaming); tests/test_streaming.py
    asserts EXACT equality with the batch q_d5_contamination output on
    the same corpus — overlap counts must not depend on micro-batch
    boundaries.  At 100 TB: per-doc shingling scales with ingest
    parallelism and the broadcast side stays benchmark-sized; the
    complete-mode state here is |contaminated pairs| (fine for a gate
    dashboard) — a pipeline that must persist every pair switches the
    sink to update mode + an idempotent merge, same plan upstream."""
    from ..functions.dedup import _shingled
    from ..functions.parity import bcount

    d = load_tables(spark, sf_dir)["documents"]
    bench = (
        _shingled(d)
        .select("doc_id", F.explode("shingles").alias("g"))
        .filter(F.col("doc_id") % 97 == 0)
        .select(F.col("doc_id").alias("bench_doc"), "g")
    )
    path = _replay_docs_dir(spark, sf_dir)
    stream = (
        spark.readStream.schema(_DOCS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    ex = _shingled(stream).select("doc_id", F.explode("shingles").alias("g"))
    hits = (
        ex.join(F.broadcast(bench), "g")
        .filter(F.col("doc_id") != F.col("bench_doc"))
        .groupBy("bench_doc", "doc_id")
        .agg(bcount().alias("n_shared"))
    )
    return _run_to_memory(hits, mode="complete").orderBy("bench_doc", "doc_id")


@query("q_c17_streaming_gopher_gate", oracle=None, group="C")
def streaming_gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C17: the GOPHER QUALITY GATE ON A LIVE DOCUMENT STREAM — the
    ingest-time twin of q_d5_gopher_rules: the same per-row rule
    expressions (_gopher_flag_cols — word-count bounds, mean-word-length
    window, alpha fraction, stopword floor) run UNCHANGED on a
    file-replayed document stream, because stateless Catalyst expressions
    are execution-mode agnostic; only the final per-source rollup needs
    streaming state (complete-mode counts).

    This is how a production pipeline gates documents the moment they
    land instead of re-scanning the lake nightly: the per-rule failure
    counters double as the live data-quality dashboard, and a rule-
    threshold regression shows up within one micro-batch.

    Rows-only by contract (true streaming); tests/test_streaming.py
    asserts EXACT equality with the batch q_d5_gopher_rules output on the
    same corpus — the gate decision must not depend on micro-batch
    boundaries.  At 100 TB: per-row expressions scale with ingest
    parallelism; the complete-mode state is |sources| rows."""
    from ..functions.parity import bcount
    from ..functions.text import _gopher_flag_cols

    path = _replay_docs_dir(spark, sf_dir)
    stream = (
        spark.readStream.schema(_DOCS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    flags = stream.select("source", *_gopher_flag_cols())
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    agg = flags.groupBy("source").agg(
        bcount().alias("n_docs"),
        cnt(F.col("keep")).alias("n_kept"),
        (
            F.floor(
                F.sum(F.when(F.col("keep"), 1).otherwise(0))
                * F.lit(1.0)
                / F.count(F.lit(1))
                * 1e6
                + 0.5
            )
            / 1e6
        ).alias("kept_frac"),
        cnt(~F.col("ok_words")).alias("n_fail_words"),
        cnt(~F.col("ok_mwl")).alias("n_fail_mwl"),
        cnt(~F.col("ok_alpha")).alias("n_fail_alpha"),
        cnt(~F.col("ok_stops")).alias("n_fail_stops"),
    )
    return _run_to_memory(agg, mode="complete").orderBy("source")


@query("q_c19_streaming_priority_sample", oracle=None, group="C")
def streaming_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C19: PRIORITY SAMPLING AT INGEST — the streaming twin of
    q_d5_priority_sample: each arriving document computes the SAME
    deterministic Duffield-Lund-Thorup priority (text.priority_col — an
    exact-integer IEEE division on an md5 coin, execution-mode agnostic)
    and a per-source applyInPandasWithState keeps the running TOP-5 as
    BOUNDED state (two 5-element arrays per source) — the streaming-top-k
    state pattern neither the complete-mode aggs (c14/c17/c18) nor the
    running-totals state (c6) exercise: state size is O(k), independent of
    stream length, which is what makes a weighted sample maintainable over
    an unbounded ingest feed.

    Each micro-batch emits the source's current top-5 plus the monotone
    n_seen counter, so the FINAL sample per source = rows at max(n_seen);
    tests/test_streaming.py asserts that final state equals the batch
    query's output EXACTLY — the sample must not depend on micro-batch
    boundaries (priority sampling is order-independent by construction:
    the top-5 of a union is the top-5 of the per-part top-5s).

    Rows-only by contract (true streaming).  At 100 TB: the priority is a
    map-side scan expression, state is k rows per source, and the shuffle
    is one hash partition per source key — ingest-parallel everywhere but
    the per-source reducer, which holds 5 rows."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..functions.text import priority_col

    path = _replay_docs_dir(spark, sf_dir)
    stream = (
        spark.readStream.schema(_DOCS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    scored = stream.select(
        "doc_id", "source", priority_col().alias("priority")
    )

    def update(key, pdfs, state: GroupState):
        ids: list[int] = []
        pris: list[float] = []
        n_seen = 0
        if state.exists:
            ids, pris, n_seen = state.get
            ids, pris = list(ids), list(pris)
        for pdf in pdfs:
            n_seen += len(pdf)
            ids.extend(int(x) for x in pdf["doc_id"])
            pris.extend(float(x) for x in pdf["priority"])
        # keep the top-5 by (priority DESC, doc_id ASC) — the batch
        # query's exact ordering
        top = sorted(zip(ids, pris), key=lambda t: (-t[1], t[0]))[:5]
        ids = [t[0] for t in top]
        pris = [t[1] for t in top]
        state.update((ids, pris, n_seen))
        yield pd.DataFrame(
            {
                "source": [key[0]] * len(top),
                "doc_id": ids,
                "rk": [i + 1 for i in range(len(top))],
                "priority": [
                    math.floor(p * 1e6 + 0.5) / 1e6 for p in pris
                ],
                "n_seen": [n_seen] * len(top),
            }
        )

    out = scored.groupBy("source").applyInPandasWithState(
        update,
        outputStructType=(
            "source STRING, doc_id BIGINT, rk BIGINT, priority DOUBLE, "
            "n_seen BIGINT"
        ),
        stateStructType="ids ARRAY<BIGINT>, pris ARRAY<DOUBLE>, n_seen BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(out, mode="update").orderBy("source", "n_seen", "rk")


@query("q_c20_streaming_budget_sample", oracle=None, group="C")
def streaming_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C20: BUDGET-CONSTRAINED ADMISSION AT INGEST — the streaming twin of
    q_d5_budget_sample (VERDICT r9 item 3, the one breadth item left): the
    mix plan (per-language quota = min(supply, waterfill level L)) is a
    BATCH artifact — computed offline from corpus counts by the same
    closed-form integer waterfill (text.budget_quota), exactly how a
    deployment ships a data-mix plan — broadcast onto the stream via a
    stream-static join; each arriving document computes the deterministic
    Duffield-Lund-Thorup priority (text.priority_col) and a per-LANGUAGE
    applyInPandasWithState admits it iff it beats the language's current
    quota-th best, keeping the running admitted set as BOUNDED state:
    two quota-length arrays per language — O(L) rows, independent of
    stream length, the per-key heap the E89 top-5 pattern generalizes to a
    plan-driven per-key k.

    Each micro-batch emits the language's current admitted set plus the
    monotone n_seen counter, so the final sample per language = rows at
    max(n_seen); tests/test_streaming.py asserts that final state equals
    the batch query EXACTLY — admission must not depend on micro-batch
    boundaries (the top-q of a union is the top-q of the per-part top-qs).

    Rows-only by contract (true streaming).  At 100 TB: the quota table is
    |languages|-sized static state, the priority a map-side expression; the
    shuffle is one hash partition per language, and each reducer holds L
    rows — admission-at-ingest instead of land-everything-then-sample."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..functions.text import budget_quota, priority_col

    path = _replay_docs_dir(spark, sf_dir)
    quota, qcnt = budget_quota(load_tables(spark, sf_dir)["documents"])
    stream = (
        spark.readStream.schema(_DOCS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    scored = stream.select(
        "doc_id", "lang", priority_col().alias("priority")
    ).join(F.broadcast(quota), "lang")

    def update(key, pdfs, state: GroupState):
        ids: list[int] = []
        pris: list[float] = []
        n_seen, q = 0, 0
        if state.exists:
            ids, pris, n_seen, q = state.get
            ids, pris = list(ids), list(pris)
        for pdf in pdfs:
            n_seen += len(pdf)
            if len(pdf):
                # every row carries the static plan's quota for this lang
                q = int(pdf["quota"].iloc[0])
            ids.extend(int(x) for x in pdf["doc_id"])
            pris.extend(float(x) for x in pdf["priority"])
        # admit the top-quota by (priority DESC, doc_id ASC) — the batch
        # query's exact ordering
        top = sorted(zip(ids, pris), key=lambda t: (-t[1], t[0]))[:q]
        ids = [t[0] for t in top]
        pris = [t[1] for t in top]
        state.update((ids, pris, n_seen, q))
        # skip the yield when nothing is admitted (ADVICE r10): an
        # all-empty-list frame has object dtype per column, which the
        # Arrow conversion can reject against the declared BIGINT/DOUBLE
        # output schema — unreachable on the 3/4-budget fixtures (every
        # language's quota is >=1) but latent if the budget ever shrinks
        if top:
            yield pd.DataFrame(
                {
                    "lang": [key[0]] * len(top),
                    "quota": [q] * len(top),
                    "rk": [i + 1 for i in range(len(top))],
                    "doc_id": ids,
                    "priority": [
                        math.floor(p * 1e6 + 0.5) / 1e6 for p in pris
                    ],
                    "n_seen": [n_seen] * len(top),
                }
            )

    out = scored.groupBy("lang").applyInPandasWithState(
        update,
        outputStructType=(
            "lang STRING, quota BIGINT, rk BIGINT, doc_id BIGINT, "
            "priority DOUBLE, n_seen BIGINT"
        ),
        stateStructType=(
            "ids ARRAY<BIGINT>, pris ARRAY<DOUBLE>, n_seen BIGINT, q BIGINT"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return release_with(
        _run_to_memory(out, mode="update").orderBy("lang", "n_seen", "rk"),
        qcnt,
    )
