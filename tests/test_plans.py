"""Physical-plan shape assertions (the 100 TB posture, verified): pushed
filters, broadcast joins, map-side window group limits, partial aggregation.
A query that silently regresses to a bad plan fails here even though its
results stay correct."""

from __future__ import annotations

import re

import pytest

from spark_multiboost_spark.registry import all_queries


def _plan(spark, name, sf_dir) -> str:
    df = all_queries()[name].fn(spark, sf_dir)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_b01_scan_pushdown(spark, sf_dir):
    plan = _plan(spark, "q_b01_scan_projection", sf_dir)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45" in plan
    # column pruning: only the 4 projected columns in ReadSchema
    assert "l_shipdate" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_b06_broadcast_join(spark, sf_dir):
    plan = _plan(spark, "q_b06_broadcast_join_brand_volume", sf_dir)
    assert "BroadcastHashJoin" in plan


def test_b20_window_group_limit(spark, sf_dir):
    plan = _plan(spark, "q_b20_topk_per_group", sf_dir)
    assert "WindowGroupLimit" in plan  # map-side partial top-k


def test_d3_flagship_plan(spark, sf_dir):
    plan = _plan(spark, "q_d3_topk_cosine", sf_dir)
    # corpus streams through an Arrow-batched blocked-matmul partial top-k;
    # the global window then touches only #batches x q x k candidate rows
    assert "MapInPandas" in plan
    # rank <= k over row_number still rewritten to a group-limit
    assert "WindowGroupLimit" in plan


def test_b11_partial_aggregation(spark, sf_dir):
    plan = _plan(spark, "q_b11_pricing_summary", sf_dir)
    # two HashAggregate nodes (partial + final) around the exchange
    assert plan.count("HashAggregate") >= 2
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_comp_q3_broadcasts_dim(spark, sf_dir):
    plan = _plan(spark, "q_comp_shipping_priority", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan


def test_b19_take_ordered(spark, sf_dir):
    plan = _plan(spark, "q_b19_topk_orders", sf_dir)
    assert "TakeOrderedAndProject" in plan  # no global sort for ORDER BY+LIMIT


def test_comp_q6_full_pushdown(spark, sf_dir):
    plan = _plan(spark, "q_comp_forecast_revenue", sf_dir)
    # every conjunct reaches the parquet scan
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({frag})" in plan or frag in plan.split("PushedFilters")[1].split("]")[0]
    # only the 4 needed columns are read
    read = plan.split("ReadSchema")[1].split("\n")[0]
    assert "l_extendedprice" in read and "l_returnflag" not in read


def test_bucketed_join_no_shuffle(spark, sf_dir):
    """Co-located bucketed join: neither side shuffles — the 100 TB
    join-in-place pattern."""
    from spark_multiboost_spark.sources.writers import bucketed_join_tables

    li_name, o_name = bucketed_join_tables(spark, sf_dir)
    import pyspark.sql.functions as F

    li, o = spark.table(li_name), spark.table(o_name)
    # at fixture scale the planner rightly prefers broadcast (and disables
    # bucketing); force the 100 TB strategy (sort-merge) to assert the
    # bucket layout replaces both shuffle exchanges
    joined = li.hint("merge").join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "o_orderpriority", "l_quantity"
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # bucket layout replaces both shuffles


def test_ivf_broadcast_probe(spark, sf_dir):
    # q_d3_ivf_ann now ships the Arrow implementation (see
    # test_ivf_arrow_single_scan); the declarative twin keeps the
    # broadcast-probe plan shape this test was written for.
    plan = _plan(spark, "q_d3_ivf_ann_catalyst", sf_dir)
    # centroid table broadcast on both assignment sides
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_ivf_arrow_single_scan(spark, sf_dir):
    """The Arrow IVF rebuild: centroids ship in the closure, cell
    assignment + probe masking + partial top-k all happen inside ONE
    mapInPandas pass — no crossJoin, no probe join, and no exchange before
    the candidate merge window (exactly one, for the global top-k)."""
    # q_d3_ivf_ann IS the Arrow implementation since the r5 headline swap
    # (the duplicate q_d3_ivf_ann_arrow registration was dropped in r7).
    plan = _plan(spark, "q_d3_ivf_ann", sf_dir)
    assert "MapInPandas" in plan
    assert "Join" not in plan
    # one exchange for the candidate-merge window + one range partition for
    # the presentation ORDER BY — nothing touches the corpus before the merge
    assert plan.count("Exchange (") <= 2
    assert "WindowGroupLimit" in plan


def test_warm_cache_parity(spark, sf_dir):
    """The bench warm-cache tier (repartition + persist) must not change any
    result: the decimal aggregate path is accumulation-order independent and
    every window has a unique tiebreaker. Compare a representative agg,
    window, and pipeline query before/after warming."""
    from spark_multiboost_spark import session as S

    names = ["q_b11_pricing_summary", "q_b16_ranking", "q_comp_docpipe"]
    qs = all_queries()

    def snap(name):
        return sorted(map(str, qs[name].fn(spark, sf_dir).collect()))

    before = {n: snap(n) for n in names}
    try:
        S.warm_cache(spark, sf_dir, min_bytes=1)  # cache EVERY table
        after = {n: snap(n) for n in names}
        assert before == after
    finally:
        _, _, tables = S._TABLE_CACHE.pop(id(spark))
        for df in tables.values():
            try:
                df.unpersist()
            except Exception:
                pass


def test_funnel_single_keyed_shuffle(spark, sf_dir):
    """Conditional-aggregation funnel: one exchange for the user_id groupBy
    + one for the global rollup — the no-self-join property that keeps it
    viable at scale."""
    plan = _plan(spark, "q_ext_funnel", sf_dir)
    # "Exchange (" matches the tree form once per node (details render as
    # "(7) Exchange" and don't match)
    assert plan.count("Exchange (") <= 2
    assert "Join" not in plan  # no self-joins


def test_docpipe_bounded_shuffles(spark, sf_dir):
    """Pipeline composite: md5-window + lang-agg + output sort — at most
    three exchanges end to end."""
    plan = _plan(spark, "q_comp_docpipe", sf_dir)
    assert plan.count("Exchange (") <= 3


def test_d4_token_tf_take_ordered(spark, sf_dir):
    """Top-20 vocabulary must be a TakeOrderedAndProject (per-partition
    heaps), never a whole-vocabulary single-partition rank window — the
    round-2 judge's scale-killer finding."""
    plan = _plan(spark, "q_d4_token_tf", sf_dir)
    assert "TakeOrderedAndProject" in plan
    # the rank window runs over the 20 surviving rows with a defined
    # (constant) partition — the plan keeps a Window node but no global sort
    # feeds it the full token table
    assert plan.index("TakeOrderedAndProject") > plan.index("Window")


def test_dedup_no_cartesian(spark, sf_dir):
    # the round-1 judge flagged both of these as all-pairs scale-killers;
    # the banded/blocked rewrites must never regress to a cartesian
    for name in (
        "q_d2_embedding_neardup",
        "q_d2_ngram_jaccard",
        "q_d2_chunk_dedup",
        "q_d2_minhash_lsh",
    ):
        plan = _plan(spark, name, sf_dir)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # semantic dedup: the only BNLJs allowed are the broadcasts of the
    # 16-row centroid table for cell assignment (the assignment subtree is
    # duplicated across the two sides of the self-join, so it appears
    # twice); the within-cell pair join must stay an equi-join on cell id
    plan = _plan(spark, "q_d2_semantic_dedup", sf_dir)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin (") <= 2


def test_semantic_dedup_arrow_single_shuffle(spark, sf_dir):
    """The Arrow SemDeDup rebuild: cell assignment inside mapInPandas
    (centroids in the closure) + ONE groupBy(cell) exchange feeding the
    within-cell applyInPandas screen — no crossJoin, no self-join, and no
    exchange before the cell grouping."""
    plan = _plan(spark, "q_d2_semantic_dedup_arrow", sf_dir)
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan
    # one exchange for groupBy(cell) + one range partition for the
    # presentation ORDER BY
    assert plan.count("Exchange (") <= 2


def test_pq_encode_zero_corpus_shuffle(spark, sf_dir):
    """PQ encode: the codebook packs into ONE broadcast row and all M
    argmins are array_min expressions — the corpus is never expanded,
    aggregated, windowed, or sort-aggregated.  The only exchanges are the
    model-sized codebook build and the presentation ORDER BY."""
    plan = _plan(spark, "q_d3_pq_encode", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan  # single-row codebook join
    assert "Window" not in plan
    assert "SortAggregate" not in plan
    assert plan.count("Exchange (") <= 3


def test_pq_adc_single_scan(spark, sf_dir):
    """PQ-ADC top-k: codebook + query distance tables ship in the closure;
    the corpus is touched once through mapInPandas with zero pre-candidate
    shuffles, then one exchange merges partial top-ks."""
    plan = _plan(spark, "q_d3_pq_adc_topk", sf_dir)
    assert "MapInPandas" in plan
    assert "Join" not in plan
    assert plan.count("Exchange (") <= 2
    assert "WindowGroupLimit" in plan


def test_ivfpq_single_scan(spark, sf_dir):
    """IVF-PQ: the full index (centroids + codebooks + probe masks + ADC
    tables) ships in the closure; the corpus is touched once, zero
    pre-candidate shuffles, one merge exchange."""
    plan = _plan(spark, "q_d3_ivfpq_topk", sf_dir)
    assert "MapInPandas" in plan
    assert "Join" not in plan
    assert plan.count("Exchange (") <= 2
    assert "WindowGroupLimit" in plan


def test_important_brands_single_scan(spark, sf_dir):
    """Fraction-of-total HAVING: the scalar total must come from a window
    over the 25-row aggregate, not a second corpus aggregation — exactly
    one lineitem scan in the plan."""
    plan = _plan(spark, "q_comp_important_brands", sf_dir)
    assert plan.count("lineitem.parquet") <= 1 or plan.count("Scan parquet") <= 2


def test_order_count_distribution_outer_preserved(spark, sf_dir):
    """Q13 shape: the priority filter must not convert the LEFT join to
    inner (zero-order customers are the point of the query)."""
    plan = _plan(spark, "q_comp_order_count_distribution", sf_dir)
    assert "LeftOuter" in plan


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """Runtime filtering: with a selective dim predicate and a shuffle
    join, Spark injects a Bloom filter built from the dim keys and applies
    it to the fact scan — at 100 TB this prunes most fact rows before the
    exchange. Thresholds are tuned for fixture sizes (creation side must
    be UNDER creationSideThreshold, application side OVER the scan-size
    threshold); semantics are unchanged — only the plan is asserted."""
    import pyspark.sql.functions as F

    from spark_multiboost_spark.session import load_tables

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        t = load_tables(spark, sf_dir)
        j = (
            t["lineitem"]
            .join(
                t["part"].filter(F.col("p_size") == 1),
                F.col("l_partkey") == F.col("p_partkey"),
            )
            .groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = spark._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan  # the filter applied on the fact side
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_retrieval_plans(spark, sf_dir):
    # BM25: the df join must broadcast, the top-k must be a per-partition
    # heap, the doc-length intermediate must be computed once (cached), and
    # the only nested-loop is the 1-row corpus-stats broadcast
    plan = _plan(spark, "q_d3_bm25_topk", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan

    # PMI: the token-pair self-join must be an equi-join on doc_id, never
    # an all-pairs product; vocabulary selection is a per-partition heap
    plan = _plan(spark, "q_d4_pmi_cooccur", sf_dir)
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan

    # inverted index: vocab = TakeOrderedAndProject, postings window is
    # partition-defined (by token), and the vocab filter is a broadcast
    # semi-join — never a shuffle of the full distinct token table
    plan = _plan(spark, "q_d4_inverted_index", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_segment_dedup_single_scan(spark, sf_dir):
    # one corpus tokenize feeds both the segment shuffle and the rebuild
    plan = _plan(spark, "q_d2_segment_dedup", sf_dir)
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1
    assert "CartesianProduct" not in plan


def test_equidepth_hist_no_global_sort(spark, sf_dir):
    # the scalable equi-depth form: percentile agg + broadcast boundaries;
    # the naive ntile-over-global-ORDER-BY single-partition window must
    # never appear (the final 10-row orderBy is the only range exchange)
    plan = _plan(spark, "q_ext_equidepth_hist", sf_dir)
    # NB: can't grep bare "ntile" — "percentile" (the agg we WANT) contains it
    assert "Window" not in plan.split("\n\n")[0]
    assert "CartesianProduct" not in plan


def test_bigram_lm_model_broadcast(spark, sf_dir):
    # the LM tables (cb/cu/V) broadcast into the scoring join — the corpus
    # bigram stream must never shuffle on (w1, w2) to meet the model
    plan = _plan(spark, "q_d5_bigram_lm_ppl", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_lateral_decorrelates(spark, sf_dir):
    # LATERAL (ORDER BY ... LIMIT) must decorrelate to a broadcast join +
    # per-key WindowGroupLimit — never a per-row re-execution / cartesian
    plan = _plan(spark, "q_b30_lateral_topk", sf_dir)
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan


def test_interleave_prefilters_global_rank(spark, sf_dir):
    # the intra<=40 filter must sit BELOW the global rank window so the
    # single-partition window only ever sees <=40*n_sources rows
    from spark_multiboost_spark.registry import all_queries

    df = all_queries()["q_d4_interleave"].fn(spark, sf_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    tree = plan.split("\n\n")[0]
    # Catalyst pushes the intra<=40 filter into a map-side WindowGroupLimit
    # below the shuffle, and the global rank sees a TakeOrderedAndProject
    assert "WindowGroupLimit" in tree
    assert "TakeOrderedAndProject" in tree


def test_snapshot_asof_single_shuffle(spark, sf_dir):
    # the top-1 and version-count windows share ONE user_id exchange (the
    # n_versions count needs every row, so a group-limit can't apply; what
    # matters is that both windows ride the same sort+shuffle)
    plan = _plan(spark, "q_ext_snapshot_asof_read", sf_dir)
    tree = plan.split("\n\n")[0]
    assert tree.count("Window (") == 2
    # one keyed exchange + the final presentation sort exchange
    assert tree.count("Exchange (") <= 2


def test_nprobe_sweep_single_probe_join(spark, sf_dir):
    # candidates materialize once; sweep levels are a filter, and the
    # centroid pack rides broadcast — no cartesian anywhere
    plan = _plan(spark, "q_d3_ivf_nprobe_sweep", sf_dir)
    assert "CartesianProduct" not in plan


def test_round6_no_cartesian(spark, sf_dir):
    """Round-6 additions: none may fall back to CartesianProduct /
    BroadcastNestedLoopJoin (the triangle self-joins and the pagerank
    iteration joins are the risk spots)."""
    for name in [
        "q_comp_late_lines_by_flag",
        "q_comp_dominant_suppliers",
        "q_comp_waiting_orders",
        "q_ext_pagerank",
        "q_d2_repeated_ngrams",
    ]:
        plan = _plan(spark, name, sf_dir)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # triangle_count: the ONLY tolerated nested-loop is the final scalar
    # attach (1-row triangle agg x 1-row edge-count agg) — assert it's the
    # single occurrence, i.e. the graph joins themselves are equi-joins
    plan = _plan(spark, "q_ext_triangle_count", sf_dir)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin Cross") <= 1


def test_priority_sample_window_group_limit(spark, sf_dir):
    """Weighted sampling must keep the map-side partial top-k shape (no
    full per-group sort of the corpus)."""
    plan = _plan(spark, "q_d5_priority_sample", sf_dir)
    assert "WindowGroupLimit" in plan


def test_quantized_unit_sums_stay_integer(spark, sf_dir):
    """The round-16 decimal-tax fix, pinned: the hot per-edge/per-doc
    aggregations in the pagerank family and the per-doc LM scorers sum
    BIGINT 1e-9/1e-6 units — a regression back to a per-row
    decimal(18,*) cast + decimal128 sum re-pays the ~2.7x CPU tax the
    interleaved A/B measured (SCALING §8s).  Corpus-level rollups keep
    decimal BY DESIGN (2^53 unit-exactness bound), so this checks only
    the named hot paths: no decimal literal may appear anywhere in their
    plans (none of these seven plans has a legitimate decimal site left —
    q_d5_ppl_buckets is deliberately absent, its per-tile rollup is a
    legitimate decimal)."""
    for name in [
        "q_ext_pagerank",
        "q_ext_pagerank_weighted",
        "q_ext_pagerank_personalized",
        "q_ext_ppr_multiseed",
        "q_d5_bigram_lm_ppl",
        "q_d5_trigram_backoff_ppl",
        "q_d4_token_entropy",
    ]:
        plan = _plan(spark, name, sf_dir)
        assert not re.search(r"decimal\(18,\s*[69]\)", plan), name


def test_repeated_ngrams_topk_not_full_sort(spark, sf_dir):
    """The top-20 repeated grams must come from TakeOrderedAndProject
    (partial heaps), never a global Sort of the gram table."""
    plan = _plan(spark, "q_d2_repeated_ngrams", sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_term_scrub_single_scan_no_shuffle_before_rollup(spark, sf_dir):
    """Redaction is a map-side expression: exactly one exchange (the
    5-row per-source rollup) in the whole plan."""
    plan = _plan(spark, "q_d5_term_scrub", sf_dir)
    # formatted plans mention each node twice (tree + details): <=4 counts
    # == <=2 exchanges (the agg shuffle + the final ordering exchange)
    assert plan.count("Exchange") <= 4


def test_skyline_no_quadratic_probe(spark, sf_dir):
    """The skyline must run the sorted-cummax form — no self-join dominance
    probe (the oracle's NOT EXISTS would appear as a nested-loop join)."""
    plan = _plan(spark, "q_ext_skyline", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_round7_graph_plans(spark, sf_dir):
    """Round-7 additions: iteration/peel/wedge joins must stay equi-joins;
    the only tolerated nested loops are broadcast attaches of model-sized
    frames (seed table / min-degree scalar / per-round merge literals)."""
    for name in [
        "q_ext_ppr_multiseed",
        "q_ext_onion_layers",
        "q_ext_simrank1",
        "q_ext_kcore_bucketed",
        "q_d5_coverage_select",
        "q_d4_bpe_encode",
        "q_d3_graph_ann",
        "q_d3_nn_descent",
        "q_d3_hnsw_descent",
        "q_d3_hnsw_multilayer",
        "q_d3_beam_width_sweep",
        "q_d3_graph_insert",
        "q_d3_graph_delete",
        "q_d3_graph_pq_search",
    ]:
        plan = _plan(spark, name, sf_dir)
        assert "CartesianProduct" not in plan, name
        # every nested-loop must be the broadcast flavor (bounded side)
        import re

        assert not re.search(r"(?<!Broadcast)NestedLoopJoin", plan), name


def test_mmr_rerank_bounded_plan(spark, sf_dir):
    """Round-8 addition, r13-optimization update: the MMR greedy must stay
    per-qid local — no cartesian/nested-loop blowup (candidate generation
    is checkpointed out of the returned plan), and the K-round greedy now
    runs as ONE cogrouped Arrow stage (FlatMapCoGroupsInPandas) instead of
    K-1 chained window rounds — exactly one Python-boundary node, no
    pickled-row BatchEvalPython."""
    plan = _plan(spark, "q_d3_mmr_rerank", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # present at least once; not pinned to the formatted-explain layout's
    # print count (ADVICE r13: tree + detail section each print the node
    # today, but that is an explain-formatting incidental, not a plan fact)
    assert "FlatMapCoGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_round8_scan_pass_aggs(spark, sf_dir):
    """Round-8 curation additions must stay join-free single-scan shapes:
    gopher_rules and prefix_dup are one partial+final hash-agg pair (plus
    the output sort) with no join of any kind."""
    for name in ("q_d5_gopher_rules", "q_d2_prefix_dup"):
        plan = _plan(spark, name, sf_dir)
        for node in ("Join", "CartesianProduct"):
            assert node not in plan, f"{name}: unexpected {node}"
        assert "HashAggregate" in plan


def test_rrf_single_pair_shuffle(spark, sf_dir):
    """RRF fusion scores both arms in one projection and ranks over one
    qid shuffle — no sort-merge join may appear (the only join is the
    broadcast query-side pair generation), and both rankings must ride
    Window nodes over the shared exchange."""
    plan = _plan(spark, "q_d3_rrf_fusion", sf_dir)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_round9_allocation_scan_pass(spark, sf_dir):
    """Round-9 allocation additions must stay one-corpus-scan shapes: the
    epoch mix is join-free (scan -> hash-agg -> #sources scalar math);
    the waterfill fixpoint's K rounds operate on the persisted #sources
    frame (no corpus rescan after the first agg), so its plan may carry
    the round joins against 1-row reducers but never a shuffle join."""
    plan = _plan(spark, "q_d5_mix_epochs", sf_dir)
    for node in ("SortMergeJoin", "CartesianProduct", "ShuffledHashJoin"):
        assert node not in plan
    assert "HashAggregate" in plan
    plan = _plan(spark, "q_d5_waterfill_fixpoint", sf_dir)
    for node in ("SortMergeJoin", "CartesianProduct", "ShuffledHashJoin"):
        assert node not in plan


def test_zipf_window_group_limit(spark, sf_dir):
    """The Zipf fit must prune to top-R per source map-side
    (WindowGroupLimit), and the regression sums must be join-free."""
    plan = _plan(spark, "q_d4_zipf_slope", sf_dir)
    assert "WindowGroupLimit" in plan
    for node in ("SortMergeJoin", "CartesianProduct"):
        assert node not in plan


def test_pruned_lm_single_holdout_pass(spark, sf_dir):
    """The pruning sweep must score every cutoff from ONE holdout pass,
    with the cutoffs as conditional-sum COLUMNS over that single stream
    (r14: no x|cutoffs| row replication through a thresholds cross-join),
    and the holdout documents scan must appear at most once."""
    plan = _plan(spark, "q_d5_pruned_trigram_lm", sf_dir)
    assert "CartesianProduct" not in plan
    # one per-cutoff decimal sum column per threshold, all in ONE aggregate
    for t in (1, 2, 3, 5):
        assert f"s_{t}#" in plan, f"missing conditional-sum column s_{t}"
    scans = [
        ln
        for ln in plan.splitlines()
        if "Scan parquet" in ln and "documents" in ln
    ]
    # tokenize is persisted (InMemoryRelation), so the parquet scan of
    # documents appears at most once however many branches read it
    assert len(scans) <= 1, f"expected <=1 documents scan, got {len(scans)}"


def test_round10_additions_plans(spark, sf_dir):
    """Round-10 additions: the churn gauge's two assignment passes are
    broadcast expressions (no cartesian, no corpus expansion join), and the
    incremental-LSH candidate join must be a broadcast hash join on
    (band, band_hash) with the DELTA side as the build side."""
    import re

    plan = _plan(spark, "q_d3_ivf_reassign_churn", sf_dir)
    assert "CartesianProduct" not in plan
    assert not re.search(r"(?<!Broadcast)NestedLoopJoin", plan)

    plan = _plan(spark, "q_d2_incremental_lsh", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_d5_budget_sample_plan(spark, sf_dir):
    plan = _plan(spark, "q_d5_budget_sample", sf_dir)
    # the |languages|-sized quota table broadcasts onto the ranked scan
    assert "BroadcastHashJoin" in plan
    # waterfill scalars ride broadcast nested loops, never a cartesian
    assert "CartesianProduct" not in plan


def test_d3_adaptive_beam_plan(spark, sf_dir):
    plan = _plan(spark, "q_d3_adaptive_beam", sf_dir)
    # per-hop frames are checkpointed, so the visible tail must be the
    # bounded stop/pick machinery: broadcast joins over query-set-sized
    # frames, no cartesian anywhere
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_b34_hash_sample_plan(spark, sf_dir):
    plan = _plan(spark, "q_b34_hash_sample", sf_dir)
    # the multiplicative-congruential selector evaluates scan-stage, BELOW
    # the one groupBy exchange — the zero-state shape that makes hash
    # sampling reproducible at any scale / partitioning (SCALING §8r)
    assert plan.count("+- Exchange") == 1  # tree node (details repeat the word)
    # formatted-plan ids number leaves upward: the Filter executes below it
    f_id = int(re.search(r"Filter \((\d+)\)", plan).group(1))
    x_id = int(re.search(r"Exchange \((\d+)\)", plan).group(1))
    assert f_id < x_id
    assert "2654435761" in plan  # the selector really is in the Filter node
    # partial + final agg around the exchange (map-side combine)
    assert plan.count("HashAggregate") >= 2
    # column pruning: only the 4 referenced columns reach the scan
    read = plan.split("ReadSchema")[1].split("\n")[0]
    assert "l_shipdate" not in read and "l_partkey" not in read
