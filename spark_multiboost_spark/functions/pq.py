"""D3 (cont.) — product quantization (PQ) for ANN at the 100 TB tier.

IVF prunes *which* vectors a query scores; PQ shrinks *how much data* each
scored vector costs: a 64-dim float64 vector (512 B) becomes M=4 one-byte
codes, so the scan side of similarity search drops ~128x and the distance
computation becomes table lookups (ADC — asymmetric distance computation).
At 100 TB the un-quantized corpus cannot be rescanned per query batch; the
PQ-coded corpus fits in a fraction of the cluster's memory.

Codebooks here are deterministic seed slices (sub-vectors of the first
PQ_K corpus vectors), standing in for per-subspace k-means exactly like the
IVF seed centroids (`similarity.py` N_CELLS) — swapping trained codebooks
changes only the codebook table, not the plan.

Float discipline: every per-subspace distance is a full ``l2_distance``
(sqrt form) so each term bit-matches DuckDB's ``list_distance``; the ADC
score adds the M per-subspace terms in explicit left-to-right order on BOTH
engines (d0+d1+d2+d3), keeping the sum IEEE-identical — no list_sum /
SUM-over-group whose association order an engine could pick freely.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import hamming_packed, sign_bits
from ..registry import query
from ..session import load_tables, local_df

PQ_M = 4  # subspaces
SUB_D = 16  # dims per subspace (fixture embeddings are 64-dim)
PQ_K = 16  # codes per subspace (codebook = sub-slices of vec_id < PQ_K)
PQ_TOPK = 5
PQ_N_QUERIES = 100

_CB_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), ms AS (
  SELECT * FROM (VALUES (0), (1), (2), (3)) t(m)
), cb AS (
  SELECT ms.m, vec_id AS code,
         list_slice(emb, ms.m * {SUB_D} + 1, (ms.m + 1) * {SUB_D}) AS cemb
  FROM e CROSS JOIN ms WHERE vec_id < {PQ_K}
), sub AS (
  SELECT vec_id, ms.m,
         list_slice(emb, ms.m * {SUB_D} + 1, (ms.m + 1) * {SUB_D}) AS semb
  FROM e CROSS JOIN ms
), assign AS (
  SELECT vec_id, sub.m, code,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id, sub.m
           ORDER BY list_distance(semb, cemb), code) AS rk
  FROM sub JOIN cb ON sub.m = cb.m
), enc AS (
  SELECT vec_id,
         MAX(CASE WHEN m = 0 THEN code END) AS code_0,
         MAX(CASE WHEN m = 1 THEN code END) AS code_1,
         MAX(CASE WHEN m = 2 THEN code END) AS code_2,
         MAX(CASE WHEN m = 3 THEN code END) AS code_3
  FROM assign WHERE rk = 1 GROUP BY vec_id
)
"""

_ENCODE_ORACLE = _CB_SQL + "SELECT * FROM enc ORDER BY vec_id"


@query("q_d3_pq_encode", oracle=_ENCODE_ORACLE, group="D")
def pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode, pure Catalyst: every corpus vector -> M one-byte codes.

    Plan shape (ZERO corpus shuffles): the PQ_M x PQ_K codebook is packed
    into ONE broadcast row (collect_list over a model-sized table — built
    inside the plan, no driver collect), and all M argmins are per-row
    EXPRESSIONS: ``array_min`` over struct(dist, code) arrays compares
    lexicographically, giving the exact ORDER BY dist, code tie rule.  The
    corpus is never expanded, never joined row-per-code, never aggregated
    — encode is scan -> broadcast -> project.  At 100 TB that is the ideal
    shape: the only data movement is the output itself."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    ms = F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("m")
    sl = lambda c: F.slice(F.col(c), F.col("m") * SUB_D + 1, SUB_D)  # noqa: E731
    cbrow = F.broadcast(
        e.filter(F.col("vec_id") < PQ_K)
        .select(F.col("vec_id").alias("code"), "emb", ms)
        .select("m", "code", sl("emb").alias("cemb"))
        .groupBy()
        .agg(F.collect_list(F.struct("m", "code", "cemb")).alias("cbs"))
    )

    def d2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def code_for(i: int):
        sub = F.slice(F.col("emb"), i * SUB_D + 1, SUB_D)
        scored = F.transform(
            F.filter("cbs", lambda c: c["m"] == F.lit(i)),
            lambda c: F.struct(
                F.sqrt(d2(sub, c["cemb"])).alias("dist"), c["code"].alias("code")
            ),
        )
        return F.array_min(scored)["code"].alias(f"code_{i}")

    return (
        e.crossJoin(cbrow)
        .select("vec_id", *[code_for(i) for i in range(PQ_M)])
        .orderBy("vec_id")
    )


_ADC_ORACLE = _CB_SQL + f""", q AS (
  SELECT vec_id AS qid, emb FROM e WHERE vec_id < {PQ_N_QUERIES}
), qd AS (
  SELECT qid, cb.m, code,
         list_distance(list_slice(emb, cb.m * {SUB_D} + 1, (cb.m + 1) * {SUB_D}),
                       cemb) AS d
  FROM q CROSS JOIN cb
), pairs AS (
  SELECT q.qid, enc.vec_id AS cid,
         ((d0.d + d1.d) + d2.d) + d3.d AS adc
  FROM q JOIN enc ON enc.vec_id <> q.qid
  JOIN qd d0 ON d0.qid = q.qid AND d0.m = 0 AND d0.code = enc.code_0
  JOIN qd d1 ON d1.qid = q.qid AND d1.m = 1 AND d1.code = enc.code_1
  JOIN qd d2 ON d2.qid = q.qid AND d2.m = 2 AND d2.code = enc.code_2
  JOIN qd d3 ON d3.qid = q.qid AND d3.m = 3 AND d3.code = enc.code_3
), ranked AS (
  SELECT qid, cid, adc,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, cid) AS rank
  FROM pairs
)
SELECT qid, cid, CAST(rank AS BIGINT) AS rank, ROUND(adc, 6) AS adc_dist
FROM ranked WHERE rank <= {PQ_TOPK} ORDER BY qid, rank
"""


@query("q_d3_pq_adc_topk", oracle=_ADC_ORACLE, group="D")
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC top-k, Arrow path: approximate nearest neighbors where the
    corpus side is touched only through its PQ codes.

    The codebook and the per-query distance tables (PQ_N_QUERIES x PQ_K
    per subspace — KBs) ship in the task closure; each Arrow batch

    1. encodes its rows in-batch (per-subspace blocked argmin — identical
       tie rule to the encode query: lowest code wins),
    2. scores every row against every query by table lookup: the ADC score
       is dt[0][code0] + dt[1][code1] + dt[2][code2] + dt[3][code3],
       accumulated in fixed subspace order on both engines,
    3. emits a partial top-k per query via the shared tie-expanding
       selector.

    One corpus pass, zero pre-candidate shuffles, and the only per-pair
    work is M additions — no d-dim dot product ever happens against the
    corpus.  That lookup-table trick is what makes 100 TB ANN affordable:
    the scan cost is proportional to CODE bytes, not vector bytes.  The
    sqrt-form per-subspace distances keep every term bit-identical to
    DuckDB's list_distance, so even this approximate search is
    exact-oracle-checked."""
    from .similarity import _partial_topk_frame, _seq_l2_sq

    emb = load_tables(spark, sf_dir)["embeddings"]
    cpd = (
        emb.filter(F.col("vec_id") < PQ_K)
        .select("vec_id", "embedding")
        .toPandas()  # bounded: PQ_K codebook seed vectors (model-sized)
        .sort_values("vec_id")  # ascending code => argmin ties pick lowest
    )
    cb_full = np.array([np.asarray(e, dtype=np.float64) for e in cpd["embedding"]])
    cbs = [cb_full[:, m * SUB_D : (m + 1) * SUB_D] for m in range(PQ_M)]

    qpd = (
        emb.filter(F.col("vec_id") < PQ_N_QUERIES)
        .select("vec_id", "embedding")
        .toPandas()  # bounded: the query SET (PQ_N_QUERIES rows)
        .sort_values("vec_id")
    )
    Q = np.array([np.asarray(e, dtype=np.float64) for e in qpd["embedding"]])
    q_ids = qpd["vec_id"].to_numpy(np.int64)
    # per-subspace ADC lookup tables: dt[m][j, k] = ||sub_m(q_j) - cb_m[k]||
    dt = [
        np.sqrt(_seq_l2_sq(Q[:, m * SUB_D : (m + 1) * SUB_D], cbs[m]))
        for m in range(PQ_M)
    ]
    q_zeros = np.zeros(Q.shape[0], dtype=np.int64)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.array([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
            cid = pdf["vec_id"].to_numpy(np.int64)
            # in-batch encode: argmin on squared distances == argmin on
            # rooted (monotone), first-min == lowest code
            codes = [
                np.argmin(_seq_l2_sq(C[:, m * SUB_D : (m + 1) * SUB_D], cbs[m]), axis=1)
                for m in range(PQ_M)
            ]
            # ADC by lookup, fixed m order => ((d0+d1)+d2)+d3 both engines
            S = dt[0][:, codes[0]].T.copy()
            for m in range(1, PQ_M):
                S += dt[m][:, codes[m]].T
            S = -S  # shared selector ranks DESCENDING; negate distances
            S[cid[:, None] == q_ids[None, :]] = -np.inf  # exclude self
            c_zeros = np.zeros(len(cid), dtype=np.int64)
            yield _partial_topk_frame(S, cid, c_zeros, q_ids, q_zeros, PQ_TOPK)

    from .similarity import CAND_SCHEMA

    cand = emb.select("vec_id", "embedding").mapInPandas(score, CAND_SCHEMA)
    w = Window.partitionBy("qid").orderBy(F.col("cos_raw").desc(), F.col("cid"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("qid", "cid", "rank", F.round(-F.col("cos_raw"), 6).alias("adc_dist"))
        .orderBy("qid", "rank")
    )


_IVFPQ_ORACLE = _CB_SQL + f""", cent AS (
  SELECT vec_id AS cent_id, emb AS cemb FROM e WHERE vec_id < 16
), cassign AS (
  SELECT vec_id, cent_id,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id ORDER BY list_distance(emb, cemb), cent_id) AS rk
  FROM e CROSS JOIN cent
), cells AS (
  SELECT vec_id, cent_id AS cell FROM cassign WHERE rk = 1
), q AS (
  SELECT vec_id AS qid, emb FROM e WHERE vec_id < {PQ_N_QUERIES}
), probes AS (
  SELECT qid, cent_id AS cell,
         ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY list_distance(emb, cemb), cent_id) AS prk
  FROM q CROSS JOIN cent
), qd AS (
  SELECT qid, cb.m, code,
         list_distance(list_slice(emb, cb.m * {SUB_D} + 1, (cb.m + 1) * {SUB_D}),
                       cemb) AS d
  FROM q CROSS JOIN cb
), pairs AS (
  SELECT q.qid, enc.vec_id AS cid,
         ((d0.d + d1.d) + d2.d) + d3.d AS adc
  FROM q JOIN enc ON enc.vec_id <> q.qid
  JOIN cells ON cells.vec_id = enc.vec_id
  JOIN probes ON probes.qid = q.qid AND probes.cell = cells.cell
             AND probes.prk <= {{n_probe}}
  JOIN qd d0 ON d0.qid = q.qid AND d0.m = 0 AND d0.code = enc.code_0
  JOIN qd d1 ON d1.qid = q.qid AND d1.m = 1 AND d1.code = enc.code_1
  JOIN qd d2 ON d2.qid = q.qid AND d2.m = 2 AND d2.code = enc.code_2
  JOIN qd d3 ON d3.qid = q.qid AND d3.m = 3 AND d3.code = enc.code_3
), ranked AS (
  SELECT qid, cid, adc,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, cid) AS rank
  FROM pairs
)
SELECT qid, cid, CAST(rank AS BIGINT) AS rank, ROUND(adc, 6) AS adc_dist
FROM ranked WHERE rank <= {PQ_TOPK} ORDER BY qid, rank
""".format(n_probe=2)


@query("q_d3_ivfpq_topk", oracle=_IVFPQ_ORACLE, group="D")
def ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the production ANN index shape (FAISS ``IVFx,PQy`` with
    ``by_residual=false``) — IVF decides WHICH vectors each query scores
    (N_PROBE=2 of 16 cells), PQ decides WHAT each scored vector costs
    (M=4 code lookups instead of a 64-dim dot product).  Composition of
    the two registered primitives, still exact-oracle-checked.

    One Arrow corpus pass, zero pre-candidate shuffles: centroids, PQ
    codebooks, per-query probe masks, and per-query ADC tables all ship in
    the task closure (KBs — they are the "index"); each batch assigns its
    rows to cells, encodes them, looks up ADC distances, masks rows whose
    cell the query doesn't probe, and emits partial top-k.  At 100 TB the
    probe mask removes (1 - N_PROBE/N_CELLS) of the scan and PQ removes
    ~128x of the remaining bytes — multiplicative savings, which is why
    this shape IS large-scale vector search."""
    from .similarity import CAND_SCHEMA, N_PROBE, _partial_topk_frame, _seq_l2_sq

    emb = load_tables(spark, sf_dir)["embeddings"]
    cpd = (
        emb.filter(F.col("vec_id") < PQ_K)
        .select("vec_id", "embedding")
        .toPandas()  # bounded: PQ_K codebook/centroid seeds (model-sized)
        .sort_values("vec_id")
    )
    cb_full = np.array([np.asarray(e, dtype=np.float64) for e in cpd["embedding"]])
    cbs = [cb_full[:, m * SUB_D : (m + 1) * SUB_D] for m in range(PQ_M)]
    cent = cb_full  # first 16 vectors double as the IVF centroids

    qpd = (
        emb.filter(F.col("vec_id") < PQ_N_QUERIES)
        .select("vec_id", "embedding")
        .toPandas()  # bounded: the query SET (PQ_N_QUERIES rows)
        .sort_values("vec_id")
    )
    Q = np.array([np.asarray(e, dtype=np.float64) for e in qpd["embedding"]])
    q_ids = qpd["vec_id"].to_numpy(np.int64)
    dt = [
        np.sqrt(_seq_l2_sq(Q[:, m * SUB_D : (m + 1) * SUB_D], cbs[m]))
        for m in range(PQ_M)
    ]
    # probe mask: allowed[cell, j] = "query j probes cell" (ties -> low id)
    qdist = _seq_l2_sq(Q, cent)
    allowed = np.zeros((cent.shape[0], Q.shape[0]), dtype=bool)
    for j in range(Q.shape[0]):
        order = np.lexsort((np.arange(cent.shape[0]), qdist[j]))
        allowed[order[:N_PROBE], j] = True
    q_zeros = np.zeros(Q.shape[0], dtype=np.int64)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.array([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
            cid = pdf["vec_id"].to_numpy(np.int64)
            cell = np.argmin(_seq_l2_sq(C, cent), axis=1)
            codes = [
                np.argmin(_seq_l2_sq(C[:, m * SUB_D : (m + 1) * SUB_D], cbs[m]), axis=1)
                for m in range(PQ_M)
            ]
            S = dt[0][:, codes[0]].T.copy()
            for m in range(1, PQ_M):
                S += dt[m][:, codes[m]].T
            S = -S
            S[~allowed[cell, :]] = -np.inf  # probe mask == the cell equi-join
            S[cid[:, None] == q_ids[None, :]] = -np.inf
            c_zeros = np.zeros(len(cid), dtype=np.int64)
            yield _partial_topk_frame(S, cid, c_zeros, q_ids, q_zeros, PQ_TOPK)

    cand = emb.select("vec_id", "embedding").mapInPandas(score, CAND_SCHEMA)
    w = Window.partitionBy("qid").orderBy(F.col("cos_raw").desc(), F.col("cid"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("qid", "cid", "rank", F.round(-F.col("cos_raw"), 6).alias("adc_dist"))
        .orderBy("qid", "rank")
    )


_PQ_RECALL_ORACLE = _ADC_ORACLE.replace(
    f"SELECT qid, cid, CAST(rank AS BIGINT) AS rank, ROUND(adc, 6) AS adc_dist\nFROM ranked WHERE rank <= {PQ_TOPK} ORDER BY qid, rank",
    f""", adc_top AS (
  SELECT qid, cid FROM ranked WHERE rank <= {PQ_TOPK}
), exact AS (
  SELECT qid, cid FROM (
    SELECT q.qid, e2.vec_id AS cid,
           ROW_NUMBER() OVER (
             PARTITION BY q.qid
             ORDER BY list_distance(q.emb, e2.emb), e2.vec_id) AS rank
    FROM q JOIN e e2 ON e2.vec_id <> q.qid
  ) WHERE rank <= {PQ_TOPK}
)
SELECT x.qid,
       CAST(COUNT(a.cid) AS BIGINT) AS n_hits,
       ROUND(CAST(COUNT(a.cid) AS DOUBLE) / {PQ_TOPK}, 6) AS recall_at_k
FROM exact x LEFT JOIN adc_top a ON x.qid = a.qid AND x.cid = a.cid
GROUP BY x.qid ORDER BY x.qid
""",
)


@query("q_d3_pq_recall", oracle=_PQ_RECALL_ORACLE, group="D")
def pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of PQ-ADC against the exact L2 top-k — the tuning gauge
    for M/PQ_K, mirroring :func:`..functions.similarity.ivf_recall` for
    the quantized path (every approximate index ships with its recall
    measurement).  The exact side is a broadcast-queries brute-force with
    the same WindowGroupLimit partial top-k shape as the cosine flagship;
    the comparison join touches two k-row-per-query result sets only."""
    from ..functions.vector import l2_distance

    emb = load_tables(spark, sf_dir)["embeddings"]
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    q = F.broadcast(
        e.filter(F.col("vec_id") < PQ_N_QUERIES).select(
            F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
        )
    )
    w = Window.partitionBy("qid").orderBy("dist", "cid")
    exact = (
        e.select(F.col("vec_id").alias("cid"), "emb")
        .crossJoin(q)
        .filter(F.col("cid") != F.col("qid"))
        .withColumn("dist", l2_distance(F.col("qemb"), F.col("emb")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("qid", "cid")
    )
    adc = pq_adc_topk(spark, sf_dir).select(
        F.col("qid").alias("a_qid"), F.col("cid").alias("a_cid")
    )
    return (
        exact.join(
            adc,
            (exact["qid"] == adc["a_qid"]) & (exact["cid"] == adc["a_cid"]),
            "left",
        )
        .groupBy("qid")
        .agg(F.count("a_cid").cast("bigint").alias("n_hits"))
        .select(
            "qid",
            "n_hits",
            F.round(F.col("n_hits").cast("double") / PQ_TOPK, 6).alias("recall_at_k"),
        )
        .orderBy("qid")
    )


PQ_TRAIN_ITERS = 4


def _pq_lloyd(
    spark: SparkSession, sf_dir: str, iters: int = PQ_TRAIN_ITERS
) -> tuple[list, dict]:
    """Per-subspace Lloyd's k-means for PQ codebooks — all PQ_M subspaces
    train in the SAME pass over the corpus each iteration (one assignment
    projection + one update aggregation), not PQ_M separate jobs.

    Scale shape mirrors the IVF trainer (`similarity._lloyd`), with the
    round-4 argmin pattern: codebooks ride ONE broadcast row, per-subspace
    assignment is an array_min expression (zero corpus shuffle), and the
    update explodes each row into (m, code, pos, value) — at most
    PQ_M x PQ_K x SUB_D groups leave the map-side partial agg, so the only
    shuffle is KBs regardless of corpus size.  Means and inertia
    accumulate in DECIMAL (parity.py discipline) for partition-order
    independence."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).persist()
    seed = (
        emb.filter(F.col("vec_id") < PQ_K)
        .select("vec_id", "embedding")
        .toPandas()  # bounded: PQ_K codebook seed vectors (model-sized)
        .sort_values("vec_id")
    )
    full = [
        [float(x) for x in v] for v in seed["embedding"]
    ]
    cb = {
        (m, k): full[k][m * SUB_D : (m + 1) * SUB_D]
        for m in range(PQ_M)
        for k in range(PQ_K)
    }
    history = []
    try:
        for it in range(iters):
            cbrow = F.broadcast(
                local_df(
                    spark,
                    [(m, k, v) for (m, k), v in sorted(cb.items())],
                    "m int, code int, cemb array<double>",
                )
                .groupBy()
                .agg(F.collect_list(F.struct("m", "code", "cemb")).alias("cbs"))
            )

            def d2(a, b):
                return F.aggregate(
                    F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )

            def best(i):
                sub = F.slice(F.col("emb"), i * SUB_D + 1, SUB_D)
                return F.array_min(
                    F.transform(
                        F.filter("cbs", lambda c: c["m"] == F.lit(i)),
                        lambda c: F.struct(
                            d2(sub, c["cemb"]).alias("d2"), c["code"].alias("code")
                        ),
                    )
                ).alias(f"b{i}")

            assigned = e.crossJoin(cbrow).select(
                "vec_id", "emb", *[best(i) for i in range(PQ_M)]
            )
            total_d2 = sum(F.col(f"b{i}.d2") for i in range(PQ_M))
            inertia = float(
                assigned.agg(
                    F.sum(total_d2.cast("decimal(30,12)")).alias("x")
                ).collect()[0]["x"]  # bounded: 1-row inertia sum
            )
            subs = F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("m"),
                            F.col(f"b{i}.code").alias("code"),
                            F.slice(F.col("emb"), i * SUB_D + 1, SUB_D).alias("sub"),
                        )
                        for i in range(PQ_M)
                    ]
                )
            ).alias("a")
            upd = (
                assigned.select(subs)
                .select("a.m", "a.code", F.posexplode("a.sub").alias("pos", "v"))
                .groupBy("m", "code", "pos")
                .agg(
                    (F.sum(F.col("v").cast("decimal(30,15)")) / F.count(F.lit(1)))
                    .cast("double")
                    .alias("mean_v")
                )
                .collect()  # bounded: PQ_M x PQ_K x SUB_D codebook-update rows (model-sized)
            )
            acc: dict = {}
            for r in upd:
                acc.setdefault((r["m"], r["code"]), [0.0] * SUB_D)[r["pos"]] = r[
                    "mean_v"
                ]
            n_active = len(acc)
            cb.update(acc)  # codes with no members keep their old center
            history.append((it, round(inertia, 6), n_active))
    finally:
        e.unpersist()
    return history, cb


@query("q_d3_pq_train", oracle=None, group="D")
def pq_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codebook trainer — per-iteration inertia history (rows-only, like
    the A10 boosting loop and q_d3_kmeans_train; pytest asserts the
    inertia curve never rises and that trained codebooks beat the seed
    codebooks on recall)."""
    history, _ = _pq_lloyd(spark, sf_dir)
    return local_df(
        spark, history, "iter int, inertia double, n_active_codes bigint"
    )


@query("q_d3_pq_trained_recall", oracle=None, group="D")
def pq_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train -> index -> measure for PQ (the q_d3_ivf_trained_recall
    counterpart): run per-subspace Lloyd's, rebuild the ADC tables on the
    trained codebooks, and report recall@k against the exact L2 top-k.
    Rows-only (iterative trainer upstream); the seed-codebook recall gauge
    (q_d3_pq_recall) stays the oracle-checked twin."""
    from .similarity import CAND_SCHEMA, _partial_topk_frame, _seq_l2_sq
    from ..functions.vector import l2_distance

    _, cb = _pq_lloyd(spark, sf_dir)
    cbs = [
        np.array([cb[(m, k)] for k in range(PQ_K)], dtype=np.float64)
        for m in range(PQ_M)
    ]
    emb = load_tables(spark, sf_dir)["embeddings"]
    qpd = (
        emb.filter(F.col("vec_id") < PQ_N_QUERIES)
        .select("vec_id", "embedding")
        .toPandas()  # bounded: the query SET (PQ_N_QUERIES rows)
        .sort_values("vec_id")
    )
    Q = np.array([np.asarray(x, dtype=np.float64) for x in qpd["embedding"]])
    q_ids = qpd["vec_id"].to_numpy(np.int64)
    dt = [
        np.sqrt(_seq_l2_sq(Q[:, m * SUB_D : (m + 1) * SUB_D], cbs[m]))
        for m in range(PQ_M)
    ]
    q_zeros = np.zeros(Q.shape[0], dtype=np.int64)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.array([np.asarray(x, dtype=np.float64) for x in pdf["embedding"]])
            cid = pdf["vec_id"].to_numpy(np.int64)
            codes = [
                np.argmin(_seq_l2_sq(C[:, m * SUB_D : (m + 1) * SUB_D], cbs[m]), axis=1)
                for m in range(PQ_M)
            ]
            S = dt[0][:, codes[0]].T.copy()
            for m in range(1, PQ_M):
                S += dt[m][:, codes[m]].T
            S = -S
            S[cid[:, None] == q_ids[None, :]] = -np.inf
            c_zeros = np.zeros(len(cid), dtype=np.int64)
            yield _partial_topk_frame(S, cid, c_zeros, q_ids, q_zeros, PQ_TOPK)

    cand = emb.select("vec_id", "embedding").mapInPandas(score, CAND_SCHEMA)
    w = Window.partitionBy("qid").orderBy(F.col("cos_raw").desc(), F.col("cid"))
    adc = (
        cand.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("qid", F.col("cid").alias("a_cid"))
    )

    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    qb = F.broadcast(
        e.filter(F.col("vec_id") < PQ_N_QUERIES).select(
            F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
        )
    )
    we = Window.partitionBy("qid").orderBy("dist", "cid")
    exact = (
        e.select(F.col("vec_id").alias("cid"), "emb")
        .crossJoin(qb)
        .filter(F.col("cid") != F.col("qid"))
        .withColumn("dist", l2_distance(F.col("qemb"), F.col("emb")))
        .withColumn("rank", F.row_number().over(we))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("qid", "cid")
    )
    return (
        exact.join(
            adc,
            (exact["qid"] == adc["qid"]) & (exact["cid"] == adc["a_cid"]),
            "left",
        )
        .select(exact["qid"].alias("qid"), "a_cid")
        .groupBy("qid")
        .agg(F.count("a_cid").cast("bigint").alias("n_hits"))
        .select(
            "qid",
            "n_hits",
            F.round(F.col("n_hits").cast("double") / PQ_TOPK, 6).alias("recall_at_k"),
        )
        .orderBy("qid")
    )


_RESIDUAL_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), cent AS (
  SELECT vec_id AS cent_id, emb AS cemb FROM e WHERE vec_id < 16
), cassign AS (
  SELECT vec_id, cent_id,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id ORDER BY list_distance(emb, cemb), cent_id) AS rk
  FROM e CROSS JOIN cent
), cells AS (
  SELECT vec_id, cent_id AS cell FROM cassign WHERE rk = 1
), resid AS (
  SELECT e.vec_id, cells.cell,
         list_transform(list_zip(e.emb, cent.cemb), x -> x[1] - x[2]) AS remb
  FROM e JOIN cells ON cells.vec_id = e.vec_id
  JOIN cent ON cent.cent_id = cells.cell
), ms AS (
  SELECT * FROM (VALUES (0), (1), (2), (3)) t(m)
), cb AS (
  SELECT ms.m, r.vec_id - {PQ_K} AS code,
         list_slice(r.remb, ms.m * {SUB_D} + 1, (ms.m + 1) * {SUB_D}) AS cbemb
  FROM resid r CROSS JOIN ms
  WHERE r.vec_id >= {PQ_K} AND r.vec_id < {2 * PQ_K}
), rsub AS (
  SELECT r.vec_id, r.cell, ms.m,
         list_slice(r.remb, ms.m * {SUB_D} + 1, (ms.m + 1) * {SUB_D}) AS semb
  FROM resid r CROSS JOIN ms
), rassign AS (
  SELECT vec_id, cell, rsub.m, code,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id, rsub.m
           ORDER BY list_distance(semb, cbemb), code) AS rk
  FROM rsub JOIN cb ON rsub.m = cb.m
), enc AS (
  SELECT vec_id, cell,
         MAX(CASE WHEN m = 0 THEN code END) AS code_0,
         MAX(CASE WHEN m = 1 THEN code END) AS code_1,
         MAX(CASE WHEN m = 2 THEN code END) AS code_2,
         MAX(CASE WHEN m = 3 THEN code END) AS code_3
  FROM rassign WHERE rk = 1 GROUP BY vec_id, cell
), q AS (
  SELECT vec_id AS qid, emb FROM e WHERE vec_id < {PQ_N_QUERIES}
), probes AS (
  SELECT qid, cent_id AS cell,
         ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY list_distance(emb, cemb), cent_id) AS prk
  FROM q CROSS JOIN cent
), qres AS (
  SELECT q.qid, p.cell,
         list_transform(list_zip(q.emb, cent.cemb), x -> x[1] - x[2]) AS qremb
  FROM q JOIN probes p ON p.qid = q.qid AND p.prk <= 2
  JOIN cent ON cent.cent_id = p.cell
), qd AS (
  SELECT qid, qres.cell, cb.m, code,
         list_distance(list_slice(qremb, cb.m * {SUB_D} + 1, (cb.m + 1) * {SUB_D}),
                       cbemb) AS d
  FROM qres CROSS JOIN cb
), pairs AS (
  SELECT qr.qid, enc.vec_id AS cid,
         ((d0.d + d1.d) + d2.d) + d3.d AS adc
  FROM qres qr
  JOIN enc ON enc.cell = qr.cell AND enc.vec_id <> qr.qid
  JOIN qd d0 ON d0.qid = qr.qid AND d0.cell = qr.cell AND d0.m = 0 AND d0.code = enc.code_0
  JOIN qd d1 ON d1.qid = qr.qid AND d1.cell = qr.cell AND d1.m = 1 AND d1.code = enc.code_1
  JOIN qd d2 ON d2.qid = qr.qid AND d2.cell = qr.cell AND d2.m = 2 AND d2.code = enc.code_2
  JOIN qd d3 ON d3.qid = qr.qid AND d3.cell = qr.cell AND d3.m = 3 AND d3.code = enc.code_3
), ranked AS (
  SELECT qid, cid, adc,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, cid) AS rank
  FROM pairs
)
SELECT qid, cid, CAST(rank AS BIGINT) AS rank, ROUND(adc, 6) AS adc_dist
FROM ranked WHERE rank <= {PQ_TOPK} ORDER BY qid, rank
"""


@query("q_d3_ivfpq_residual_topk", oracle=_RESIDUAL_ORACLE, group="D")
def ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ (FAISS's ``by_residual=true`` DEFAULT): vectors are
    PQ-coded on their residual v - centroid(cell(v)), which concentrates
    the codebook's dynamic range on within-cell variation — the reason
    FAISS defaults to it.  The cost: the query's ADC tables become
    per-(probed cell, query) — the query residual q - centroid(cell)
    differs per cell — so the closure ships N_CELLS x Q x PQ_K lookup
    entries per subspace instead of Q x PQ_K (still KBs; recomputed per
    centroid refresh, never per corpus row).

    Codebooks are residuals of vectors PQ_K..2*PQ_K-1 (the first PQ_K ARE
    the centroids — their residuals are zero and would degenerate).  Same
    single-corpus-pass / zero-pre-candidate-shuffle plan as q_d3_ivfpq_topk;
    every distance term and the fixed-order ADC sum stay bit-identical to
    the DuckDB oracle, so the FAISS-default index form is ALSO
    exact-oracle-checked."""
    from .similarity import CAND_SCHEMA, N_PROBE, _partial_topk_frame, _seq_l2_sq

    emb = load_tables(spark, sf_dir)["embeddings"]
    spd = (
        emb.filter(F.col("vec_id") < 2 * PQ_K)
        .select("vec_id", "embedding")
        .toPandas()  # bounded: 2*PQ_K seed vectors (model-sized)
        .sort_values("vec_id")
    )
    seed = np.array([np.asarray(x, dtype=np.float64) for x in spd["embedding"]])
    cent = seed[:PQ_K]
    # codebook source vectors: residuals of vec_id in [PQ_K, 2*PQ_K)
    src = seed[PQ_K:]
    src_cell = np.argmin(_seq_l2_sq(src, cent), axis=1)
    src_resid = src - cent[src_cell]
    cbs = [src_resid[:, m * SUB_D : (m + 1) * SUB_D] for m in range(PQ_M)]

    qpd = (
        emb.filter(F.col("vec_id") < PQ_N_QUERIES)
        .select("vec_id", "embedding")
        .toPandas()  # bounded: the query SET (PQ_N_QUERIES rows)
        .sort_values("vec_id")
    )
    Q = np.array([np.asarray(x, dtype=np.float64) for x in qpd["embedding"]])
    q_ids = qpd["vec_id"].to_numpy(np.int64)
    # per-(cell, query) ADC tables on the QUERY residual for that cell
    dt = []
    for m in range(PQ_M):
        t = np.zeros((cent.shape[0], Q.shape[0], PQ_K), dtype=np.float64)
        for c in range(cent.shape[0]):
            qres = Q - cent[c]
            t[c] = np.sqrt(
                _seq_l2_sq(qres[:, m * SUB_D : (m + 1) * SUB_D], cbs[m])
            )
        dt.append(t)
    qdist = _seq_l2_sq(Q, cent)
    allowed = np.zeros((cent.shape[0], Q.shape[0]), dtype=bool)
    for j in range(Q.shape[0]):
        order = np.lexsort((np.arange(cent.shape[0]), qdist[j]))
        allowed[order[:N_PROBE], j] = True
    q_zeros = np.zeros(Q.shape[0], dtype=np.int64)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.array([np.asarray(x, dtype=np.float64) for x in pdf["embedding"]])
            cid = pdf["vec_id"].to_numpy(np.int64)
            cell = np.argmin(_seq_l2_sq(C, cent), axis=1)
            R = C - cent[cell]
            codes = [
                np.argmin(_seq_l2_sq(R[:, m * SUB_D : (m + 1) * SUB_D], cbs[m]), axis=1)
                for m in range(PQ_M)
            ]
            # ADC with per-(cell, query) tables, fixed m order
            S = dt[0][cell, :, codes[0]].copy()  # advanced indexing -> (b, Q)
            for m in range(1, PQ_M):
                S += dt[m][cell, :, codes[m]]
            S = -S
            S[~allowed[cell, :]] = -np.inf
            S[cid[:, None] == q_ids[None, :]] = -np.inf
            c_zeros = np.zeros(len(cid), dtype=np.int64)
            yield _partial_topk_frame(S, cid, c_zeros, q_ids, q_zeros, PQ_TOPK)

    cand = emb.select("vec_id", "embedding").mapInPandas(score, CAND_SCHEMA)
    w = Window.partitionBy("qid").orderBy(F.col("cos_raw").desc(), F.col("cid"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("qid", "cid", "rank", F.round(-F.col("cos_raw"), 6).alias("adc_dist"))
        .orderBy("qid", "rank")
    )


_SQ8_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), dims AS (
  SELECT i.i AS pos, MIN(emb[i.i]) AS mn, MAX(emb[i.i]) AS mx
  FROM e CROSS JOIN generate_series(1, {PQ_M * SUB_D}) i(i)
  GROUP BY i.i
), stats AS (
  SELECT LIST(mn ORDER BY pos) AS mn, LIST(mx ORDER BY pos) AS mx FROM dims
), coded AS (
  SELECT vec_id,
         list_transform(generate_series(1, {PQ_M * SUB_D}),
           i -> CASE WHEN mx[i] = mn[i] THEN 0.0
                ELSE FLOOR((emb[i] - mn[i]) * 255 / (mx[i] - mn[i]) + 0.5) END)
           AS code
  FROM e CROSS JOIN stats
), deq AS (
  SELECT vec_id,
         list_transform(generate_series(1, {PQ_M * SUB_D}),
           i -> mn[i] + code[i] * (mx[i] - mn[i]) / 255) AS demb
  FROM coded CROSS JOIN stats
), q AS (
  SELECT vec_id AS qid, emb FROM e WHERE vec_id < {PQ_N_QUERIES}
), ranked AS (
  SELECT q.qid, d.vec_id AS cid, list_distance(q.emb, d.demb) AS dist,
         ROW_NUMBER() OVER (
           PARTITION BY q.qid
           ORDER BY list_distance(q.emb, d.demb), d.vec_id) AS rank
  FROM q JOIN deq d ON d.vec_id <> q.qid
)
SELECT qid, cid, CAST(rank AS BIGINT) AS rank, ROUND(dist, 6) AS sq_dist
FROM ranked WHERE rank <= {PQ_TOPK} ORDER BY qid, rank
"""


@query("q_d3_sq8_topk", oracle=_SQ8_ORACLE, group="D")
def sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar quantization (SQ8) top-k — the third member of the
    quantization family (SQ8 / PQ / IVF-PQ): every dimension is linearly
    mapped to a uint8 against per-dimension corpus min/max, cutting the
    float64 corpus 8x with no codebook at all.  Queries stay full
    precision and score against the DEQUANTIZED corpus (asymmetric, like
    ADC) — the standard FAISS SQ8 search.

    Plan (Arrow rebuild, round 9): per-dim min/max is ONE aggregation
    collected as a bounded 2x64 stats row and shipped in the scorer
    closure with the (tiny) full-precision query block; the corpus then
    streams through ONE mapInPandas pass that dequantizes each Arrow
    batch elementwise and scores it as a blocked seq-accumulated L2
    (:func:`similarity._seq_l2_sq`), emitting a map-side partial top-k of
    q x {PQ_TOPK} rows per batch — the exact flagship's plan shape.  The
    prior pure-Catalyst form paid a 64-step interpreted HOF fold per
    PAIR (HOFs are excluded from codegen) and measured 5.3 s at sf0.1 /
    44.8 s at sf1.0; the blocked pass does the identical arithmetic in d
    fused vector ops per batch (sub-second / ~1 s).

    Float discipline: quantize/dequantize are per-element scalar ops
    (bit-identical under vectorization); the distance accumulates strictly
    left-to-right over dims, matching DuckDB's list_distance fold — the
    lossy path still hash-matches exactly."""
    from .similarity import _seq_l2_sq

    D = PQ_M * SUB_D
    emb = load_tables(spark, sf_dir)["embeddings"]
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    stats_row = (
        e.select(F.posexplode("emb").alias("pos0", "v"))
        .groupBy("pos0")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .orderBy("pos0")
        .collect()  # bounded: one row per dimension (64)
    )
    mn = np.array([r["mn"] for r in stats_row], dtype=np.float64)
    mx = np.array([r["mx"] for r in stats_row], dtype=np.float64)
    qpd = e.filter(F.col("vec_id") < PQ_N_QUERIES).toPandas()
    Q = np.array([np.asarray(x, dtype=np.float64) for x in qpd["emb"]])
    q_ids = qpd["vec_id"].to_numpy(np.int64)
    k = PQ_TOPK
    span = mx - mn

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.array([np.asarray(x, dtype=np.float64) for x in pdf["emb"]])
            cids = pdf["vec_id"].to_numpy(np.int64)
            # same scalar arithmetic as the oracle, per element:
            # code = floor((v - mn) * 255 / (mx - mn) + 0.5); 0 where mx == mn
            with np.errstate(divide="ignore", invalid="ignore"):
                code = np.floor((C - mn) * 255 / span + 0.5)
            code = np.where(span == 0, 0.0, code)
            demb = mn + code * span / 255
            D2 = _seq_l2_sq(demb, Q)  # (b x q) squared L2, seq-accumulated
            out_q, out_c, out_d = [], [], []
            for qi in range(len(q_ids)):
                d2 = D2[:, qi]
                mask = cids != q_ids[qi]
                idx = np.flatnonzero(mask)
                if not len(idx):
                    continue
                order = np.lexsort((cids[idx], d2[idx]))[:k]
                pick = idx[order]
                out_q.extend([q_ids[qi]] * len(pick))
                out_c.extend(cids[pick])
                out_d.extend(np.sqrt(d2[pick]))
            yield pd.DataFrame(
                {"qid": out_q, "cid": out_c, "dist": out_d}
            ).astype({"qid": "int64", "cid": "int64", "dist": "float64"})

    cand = e.mapInPandas(score, "qid bigint, cid bigint, dist double")
    w = Window.partitionBy("qid").orderBy("dist", "cid")
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("qid", "cid", "rank", F.round("dist", 6).alias("sq_dist"))
        .orderBy("qid", "rank")
    )


_BQ_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), q AS (
  SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < {PQ_N_QUERIES}
), ranked AS (
  SELECT q.qid, e.vec_id AS cid,
         list_sum(list_transform(generate_series(1, {PQ_M * SUB_D}),
           i -> CASE WHEN (qemb[i] >= 0) <> (emb[i] >= 0) THEN 1 ELSE 0 END))
           AS hamming,
         ROW_NUMBER() OVER (
           PARTITION BY q.qid
           ORDER BY list_sum(list_transform(generate_series(1, {PQ_M * SUB_D}),
             i -> CASE WHEN (qemb[i] >= 0) <> (emb[i] >= 0) THEN 1 ELSE 0 END)),
             e.vec_id) AS rank
  FROM q JOIN e ON e.vec_id <> q.qid
)
SELECT qid, cid, CAST(rank AS BIGINT) AS rank, CAST(hamming AS BIGINT) AS hamming
FROM ranked WHERE rank <= {PQ_TOPK} ORDER BY qid, rank
"""


@query("q_d3_binary_hamming_topk", oracle=_BQ_ORACLE, group="D")
def binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary quantization (1 bit/dim) + Hamming top-k — the cheapest end
    of the quantization spectrum (1-bit BQ / 8-bit SQ / PQ / IVF-PQ):
    each vector collapses to its sign bits (512x vs float64) and distance
    is a popcount-of-xor, which modern vector stores use as the
    first-stage filter before exact re-rank.  Integer distances are exact
    in any engine, so even ranking (ties broken by cid — Hamming ties are
    common at d=64) hash-matches the oracle.

    Plan: the broadcast-queries WindowGroupLimit shape of the exact
    flagship, with the packed-bitmap column REAL (vector.sign_bits): each
    side packs its sign bits into one BIGINT per vector up front, so the
    per-pair distance is a single codegen'd bit_count(xor) — not a
    64-step interpreted higher-order fold (HOFs are excluded from
    whole-stage codegen).  At 100 TB / wider dims the packed column is
    ceil(d/64) words and the fold a handful of XOR+popcounts per pair."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    e = emb.select(
        "vec_id",
        sign_bits(F.col("embedding").cast("array<double>")).alias("bits"),
    )
    qb = F.broadcast(
        e.filter(F.col("vec_id") < PQ_N_QUERIES).select(
            F.col("vec_id").alias("qid"), F.col("bits").alias("qbits")
        )
    )
    w = Window.partitionBy("qid").orderBy("hamming", "cid")
    return (
        e.select(F.col("vec_id").alias("cid"), "bits")
        .crossJoin(qb)
        .filter(F.col("cid") != F.col("qid"))
        .withColumn(
            "hamming", hamming_packed(F.col("qbits"), F.col("bits")).cast("bigint")
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("qid", "cid", "rank", "hamming")
        .orderBy("qid", "rank")
    )


BQ_SHORTLIST = 50


_BQ_RERANK_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), q AS (
  SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < {PQ_N_QUERIES}
), shortlist AS (
  SELECT qid, cid, qemb, cemb FROM (
    SELECT q.qid, e.vec_id AS cid, q.qemb, e.emb AS cemb,
           ROW_NUMBER() OVER (
             PARTITION BY q.qid
             ORDER BY list_sum(list_transform(generate_series(1, {PQ_M * SUB_D}),
               i -> CASE WHEN (qemb[i] >= 0) <> (emb[i] >= 0) THEN 1 ELSE 0 END)),
               e.vec_id) AS hrank
    FROM q JOIN e ON e.vec_id <> q.qid
  ) WHERE hrank <= {BQ_SHORTLIST}
), ranked AS (
  SELECT qid, cid, list_cosine_similarity(qemb, cemb) AS cos_raw,
         ROW_NUMBER() OVER (
           PARTITION BY qid
           ORDER BY list_cosine_similarity(qemb, cemb) DESC, cid) AS rank
  FROM shortlist
)
SELECT qid, cid, CAST(rank AS BIGINT) AS rank, ROUND(cos_raw, 6) AS cos_sim
FROM ranked WHERE rank <= {PQ_TOPK} ORDER BY qid, rank
"""


@query("q_d3_bq_rerank_topk", oracle=_BQ_RERANK_ORACLE, group="D")
def bq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval — the shape every production vector store ships:
    a cheap 1-bit Hamming filter shortlists BQ_SHORTLIST candidates per
    query, then exact cosine re-ranks ONLY the shortlist.  The expensive
    distance touches corpus*(K'/corpus) pairs instead of the whole corpus;
    at 100 TB the filter stage runs on packed bitmaps (XOR+popcount) and
    the re-rank fetches full vectors for ~50 rows per query.

    Both stages keep unique tie-breaking (hamming, cid / cos DESC, cid),
    so the whole cascade stays exact-oracle-checked."""
    from ..functions.vector import cosine

    emb = load_tables(spark, sf_dir)["embeddings"]
    # full vectors ride along for the stage-2 exact re-rank; the stage-1
    # filter itself runs on packed sign bits (one bit_count(xor) per pair,
    # codegen'd — see q_d3_binary_hamming_topk)
    e = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("emb"),
        sign_bits(F.col("embedding").cast("array<double>")).alias("bits"),
    )
    qb = F.broadcast(
        e.filter(F.col("vec_id") < PQ_N_QUERIES).select(
            F.col("vec_id").alias("qid"),
            F.col("emb").alias("qemb"),
            F.col("bits").alias("qbits"),
        )
    )
    wh = Window.partitionBy("qid").orderBy("hamming", "cid")
    shortlist = (
        e.select(F.col("vec_id").alias("cid"), "emb", "bits")
        .crossJoin(qb)
        .filter(F.col("cid") != F.col("qid"))
        .withColumn("hamming", hamming_packed(F.col("qbits"), F.col("bits")))
        .withColumn("hrank", F.row_number().over(wh))
        .filter(F.col("hrank") <= BQ_SHORTLIST)
    )
    wc = Window.partitionBy("qid").orderBy(F.col("cos_raw").desc(), F.col("cid"))
    return (
        shortlist.withColumn("cos_raw", cosine(F.col("qemb"), F.col("emb")))
        .withColumn("rank", F.row_number().over(wc).cast("bigint"))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("qid", "cid", "rank", F.round("cos_raw", 6).alias("cos_sim"))
        .orderBy("qid", "rank")
    )


@query("q_d3_opq_rotated_recall", oracle=None, group="D")
def opq_rotated_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parametric OPQ (OPQ-P, Ge et al.): learn an orthonormal rotation
    that balances variance across PQ subspaces, then measure rotated-PQ
    recall — rows-only (eigendecomposition upstream), mirroring the other
    train->index->measure pairs.

    The distributed part is the COVARIANCE: sum_x and sum_x_xT accumulate
    via posexplode -> (i, j) hash-agg in DECIMAL — D + D^2 groups leave
    the map-side combine (model-sized at any corpus size; the same
    exact-and-order-independent recipe as the centroid updates).  Only
    the D x D matrix reaches the driver; numpy eigh runs there, columns
    sign-canonicalized, eigenvectors dealt to subspaces round-robin by
    descending eigenvalue (the OPQ-P allocation — plain PCA ordering
    would dump all variance into subspace 0 and starve the rest).
    Rotation is applied in-batch (numpy matmul) before the standard PQ
    encode/ADC; recall is against the exact top-k in the ROTATED space,
    which equals the original-space top-k up to float error because R is
    orthogonal.

    Measured honestly: on THIS fixture the rotation does not help
    (0.108 vs 0.116 plain at sf0.001, 0.084 vs 0.106 at sf0.01) — the
    synthetic embeddings are near-isotropic, so PCA finds no correlated
    structure to balance and the rotated basis loses the axis alignment
    the seed codebook happened to have.  OPQ earns its keep on real
    embedding distributions with strongly anisotropic covariance; the
    machinery (distributed moments, allocation, rotated index) is what
    this query demonstrates."""
    from .similarity import CAND_SCHEMA, _partial_topk_frame, _seq_l2_sq

    D = PQ_M * SUB_D
    emb = load_tables(spark, sf_dir)["embeddings"]
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))

    # distributed moments: mean vector + raw second-moment matrix, decimal-exact
    n = e.count()
    pos = e.select(F.posexplode("emb").alias("i", "v"))
    mean = np.zeros(D)
    for r in (
        pos.groupBy("i").agg(F.sum(F.col("v").cast("decimal(30,15)")).alias("s")).collect()  # bounded: one row per dimension (D)
    ):
        mean[r["i"]] = float(r["s"]) / n
    pairs = e.select(
        F.explode(
            F.expr(
                "flatten(transform(emb, (x, i) -> "
                "transform(emb, (y, j) -> struct(i AS i, j AS j, x * y AS xy))))"
            )
        ).alias("p")
    ).select("p.i", "p.j", "p.xy")
    M = np.zeros((D, D))
    for r in (
        pairs.groupBy("i", "j")
        .agg(F.sum(F.col("xy").cast("decimal(30,12)")).alias("s"))
        .collect()  # bounded: D x D moment entries (model-sized)
    ):
        M[r["i"], r["j"]] = float(r["s"])
    cov = M / n - np.outer(mean, mean)

    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    for c in range(D):  # sign canonicalization: largest-|.| entry positive
        k = int(np.argmax(np.abs(vecs[:, c])))
        if vecs[k, c] < 0:
            vecs[:, c] = -vecs[:, c]
    # OPQ-P eigenvalue allocation: deal components to subspaces round-robin
    # by descending eigenvalue so each subspace gets comparable variance
    cols = []
    for m in range(PQ_M):
        cols.extend(range(m, D, PQ_M))
    perm = np.empty(D, dtype=np.int64)
    for slot, comp in enumerate(cols):
        perm[slot] = comp
    R = vecs[:, perm]  # x_rot = x @ R

    spd = (
        emb.filter(F.col("vec_id") < PQ_K).select("vec_id", "embedding").toPandas().sort_values("vec_id")  # bounded: PQ_K codebook seed vectors (model-sized)
    )
    seed_rot = (
        np.array([np.asarray(x, dtype=np.float64) for x in spd["embedding"]]) @ R
    )
    cbs = [seed_rot[:, m * SUB_D : (m + 1) * SUB_D] for m in range(PQ_M)]
    qpd = (
        emb.filter(F.col("vec_id") < PQ_N_QUERIES).select("vec_id", "embedding").toPandas().sort_values("vec_id")  # bounded: the query SET (PQ_N_QUERIES rows)
    )
    Q = np.array([np.asarray(x, dtype=np.float64) for x in qpd["embedding"]]) @ R
    q_ids = qpd["vec_id"].to_numpy(np.int64)
    dt = [
        np.sqrt(_seq_l2_sq(Q[:, m * SUB_D : (m + 1) * SUB_D], cbs[m]))
        for m in range(PQ_M)
    ]
    q_zeros = np.zeros(Q.shape[0], dtype=np.int64)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            C = (
                np.array([np.asarray(x, dtype=np.float64) for x in pdf["embedding"]])
                @ R
            )
            cid = pdf["vec_id"].to_numpy(np.int64)
            codes = [
                np.argmin(_seq_l2_sq(C[:, m * SUB_D : (m + 1) * SUB_D], cbs[m]), axis=1)
                for m in range(PQ_M)
            ]
            S = dt[0][:, codes[0]].T.copy()
            for m in range(1, PQ_M):
                S += dt[m][:, codes[m]].T
            S = -S
            S[cid[:, None] == q_ids[None, :]] = -np.inf
            c_zeros = np.zeros(len(cid), dtype=np.int64)
            yield _partial_topk_frame(S, cid, c_zeros, q_ids, q_zeros, PQ_TOPK)

    cand = emb.select("vec_id", "embedding").mapInPandas(score, CAND_SCHEMA)
    w = Window.partitionBy("qid").orderBy(F.col("cos_raw").desc(), F.col("cid"))
    adc = (
        cand.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("qid", F.col("cid").alias("a_cid"))
    )

    # exact top-k in the rotated space (== original space: R is orthogonal)
    def exact_score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            C = (
                np.array([np.asarray(x, dtype=np.float64) for x in pdf["embedding"]])
                @ R
            )
            cid = pdf["vec_id"].to_numpy(np.int64)
            S = -np.sqrt(
                np.maximum(
                    _seq_l2_sq(C, Q),
                    0.0,
                )
            )
            S[cid[:, None] == q_ids[None, :]] = -np.inf
            c_zeros = np.zeros(len(cid), dtype=np.int64)
            yield _partial_topk_frame(S, cid, c_zeros, q_ids, q_zeros, PQ_TOPK)

    ecand = emb.select("vec_id", "embedding").mapInPandas(exact_score, CAND_SCHEMA)
    exact = (
        ecand.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= PQ_TOPK)
        .select("qid", "cid")
    )
    return (
        exact.join(
            adc, (exact["qid"] == adc["qid"]) & (exact["cid"] == adc["a_cid"]), "left"
        )
        .select(exact["qid"].alias("qid"), "a_cid")
        .groupBy("qid")
        .agg(F.count("a_cid").cast("bigint").alias("n_hits"))
        .select(
            "qid",
            "n_hits",
            F.round(F.col("n_hits").cast("double") / PQ_TOPK, 6).alias("recall_at_k"),
        )
        .orderBy("qid")
    )


_PACKED_ORACLE = _CB_SQL + """
SELECT vec_id,
       CAST(code_0 + code_1 * 16 + code_2 * 256 + code_3 * 4096 AS BIGINT)
           AS packed
FROM enc ORDER BY vec_id
"""


@query("q_d3_pq_packed_codes", oracle=_PACKED_ORACLE, group="D")
def pq_packed_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ code PACKING: with PQ_K=16 each code is 4 bits, so all M=4 codes
    pack into one 16-bit integer — the physical storage form (a 512-byte
    float64 vector becomes 2 bytes; the scan side of ADC reads a single
    short column).  Pure bit arithmetic over the encode query:
    ``c0 | c1<<4 | c2<<8 | c3<<12``, written as exact integer
    multiply-adds so both engines agree trivially.  Unpacking in ADC is
    shift+mask per subspace — free next to the lookup itself."""
    enc = pq_encode(spark, sf_dir)
    packed = (
        F.col("code_0")
        + F.col("code_1") * 16
        + F.col("code_2") * 256
        + F.col("code_3") * 4096
    ).cast("bigint")
    return enc.select("vec_id", packed.alias("packed")).orderBy("vec_id")

# ---------------------------------------------------------------------------
# PQ-guided GRAPH search (round 11): ADC scores steer the beam, exact
# cosine only re-ranks the final shortlist — the memory-bound deployment
# where codes live in RAM and full vectors are only fetched for the top-R.
# ---------------------------------------------------------------------------

GPQ_RERANK = 10  # exact-rerank shortlist per query (2x the output top-k)


def _graph_pq_oracle() -> str:
    from .similarity import (
        GANN_B,
        GANN_ENTRIES,
        GANN_HOPS,
        GANN_M,
        K,
        N_QUERIES,
        _nnd_edges_sql,
    )

    parts = [
        f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
), {_nnd_edges_sql("gp_edges", GANN_M)}
, ms AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(m)
), cb AS (
  SELECT ms.m, vec_id AS code,
         list_slice(embedding, ms.m * {SUB_D} + 1, (ms.m + 1) * {SUB_D}) AS cemb
  FROM e CROSS JOIN ms WHERE vec_id < {PQ_K}
), sub AS (
  SELECT vec_id, ms.m,
         list_slice(embedding, ms.m * {SUB_D} + 1, (ms.m + 1) * {SUB_D}) AS semb
  FROM e CROSS JOIN ms
), assign AS (
  SELECT vec_id, sub.m, code,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id, sub.m
           ORDER BY list_distance(semb, cemb), code) AS rk
  FROM sub JOIN cb ON sub.m = cb.m
), enc AS MATERIALIZED (
  SELECT vec_id,
         MAX(CASE WHEN m = 0 THEN code END) AS code_0,
         MAX(CASE WHEN m = 1 THEN code END) AS code_1,
         MAX(CASE WHEN m = 2 THEN code END) AS code_2,
         MAX(CASE WHEN m = 3 THEN code END) AS code_3
  FROM assign WHERE rk = 1 GROUP BY vec_id
), q AS (SELECT vec_id AS qid, embedding FROM e WHERE vec_id < {N_QUERIES}
), qd AS MATERIALIZED (
  SELECT qid, cb.m, code,
         list_distance(
           list_slice(q.embedding, cb.m * {SUB_D} + 1, (cb.m + 1) * {SUB_D}),
           cemb) AS d
  FROM q CROSS JOIN cb
), gp_v0 AS (
  SELECT q.qid, en.vec_id AS cid
  FROM q CROSS JOIN (SELECT vec_id FROM e WHERE vec_id < {GANN_ENTRIES}) en
)"""
    ]
    adc_score = """
  SELECT v.qid, v.cid, ((d0.d + d1.d) + d2.d) + d3.d AS adc
  FROM {src} v JOIN enc ON enc.vec_id = v.cid
  JOIN qd d0 ON d0.qid = v.qid AND d0.m = 0 AND d0.code = enc.code_0
  JOIN qd d1 ON d1.qid = v.qid AND d1.m = 1 AND d1.code = enc.code_1
  JOIN qd d2 ON d2.qid = v.qid AND d2.m = 2 AND d2.code = enc.code_2
  JOIN qd d3 ON d3.qid = v.qid AND d3.m = 3 AND d3.code = enc.code_3"""
    for h in range(GANN_HOPS):
        parts.append(
            f""", gp_s{h} AS ({adc_score.format(src=f"gp_v{h}")}
), gp_b{h} AS (
  SELECT qid, cid FROM (
    SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, cid) AS rk
    FROM gp_s{h}) WHERE rk <= {GANN_B}
), gp_v{h + 1} AS (
  SELECT DISTINCT qid, cid FROM (
    SELECT qid, cid FROM gp_v{h}
    UNION ALL
    SELECT b.qid, ed.dst AS cid FROM gp_b{h} b JOIN gp_edges ed ON ed.src = b.cid)
)"""
        )
    parts.append(
        f""", gp_fin AS ({adc_score.format(src=f"gp_v{GANN_HOPS}")}
  WHERE v.qid <> v.cid
), short AS (
  SELECT qid, cid, adc FROM (
    SELECT qid, cid, adc,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, cid) AS rk
    FROM gp_fin) WHERE rk <= {GPQ_RERANK}
), rer AS (
  SELECT s.qid, s.cid, s.adc,
         list_cosine_similarity(eq.embedding, ec.embedding) AS cos
  FROM short s JOIN e eq ON eq.vec_id = s.qid JOIN e ec ON ec.vec_id = s.cid
)
SELECT qid, cid, CAST(rk AS BIGINT) AS rank,
       FLOOR(cos * 1e6 + 0.5) / 1e6 AS cos,
       FLOOR(adc * 1e6 + 0.5) / 1e6 AS adc_dist
FROM (
  SELECT qid, cid, adc, cos,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
  FROM rer) WHERE rk <= {K}
ORDER BY qid, rank
"""
    )
    return "".join(parts)


@query("q_d3_graph_pq_search", oracle=_graph_pq_oracle(), group="D")
def graph_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-GUIDED GRAPH SEARCH — the memory-bound ANN deployment shape
    (HNSW-PQ / DiskANN): the beam traverses the kNN graph scoring
    candidates by ASYMMETRIC PQ DISTANCE ONLY (each query precomputes its
    {PQ_M}x{PQ_K} subspace distance table; a candidate costs 4 table
    lookups against its byte codes — no full vector is read during
    traversal), then the final top-{GPQ_RERANK} shortlist per query is
    re-ranked by EXACT cosine for the returned top-5.  At 100 TB this is
    why graph+PQ wins: the traversal working set is codes (n·{PQ_M} bytes)
    + the edge list, both orders of magnitude smaller than the vectors,
    which are touched only {GPQ_RERANK} rows per query at the end.

    Plan shape: the per-query distance table (queries x {PQ_M} x {PQ_K}
    entries) rides as ONE map column per query, broadcast to every hop's
    scoring join — a candidate costs one code-table equi-join + one
    broadcast probe + 4 map lookups; the graph comes from the session
    index cache; exact re-rank is a {GPQ_RERANK}-rows-per-query equi-join
    against the vector table.  Both engines sum subspace distances in the
    same fixed order, the discipline q_d3_pq_adc_topk established."""
    from pyspark.sql import Window

    from .similarity import (
        GANN_B,
        GANN_ENTRIES,
        GANN_HOPS,
        GANN_M,
        K,
        N_QUERIES,
        _nnd_graph,
    )
    from .vector import dot, norm

    emb = load_tables(spark, sf_dir)["embeddings"]
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    v = emb.select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    edges = _nnd_graph(spark, sf_dir, v, GANN_M, tag="full")
    enc = pq_encode(spark, sf_dir)
    # per-query subspace distance table: queries x PQ_M x PQ_K rows
    ms = F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("m")
    cbl = (
        e.filter(F.col("vec_id") < PQ_K)
        .select(F.col("vec_id").alias("code"), "emb", ms)
        .select(
            "m", "code", F.slice(F.col("emb"), F.col("m") * SUB_D + 1, SUB_D).alias("cemb")
        )
    )

    def d2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, vv: acc + vv,
        )

    qe = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("q_emb")
    )
    qd = qe.crossJoin(cbl).select(
        "qid",
        "m",
        "code",
        F.sqrt(
            d2(F.slice(F.col("q_emb"), F.col("m") * SUB_D + 1, SUB_D), F.col("cemb"))
        ).alias("d"),
    )
    # ONE row per query (r13 optimization round): the (m, code) -> d table
    # packed into a map keyed m*PQ_K + code.  Scoring was 4 hash joins per
    # call (one per subspace) x 4 calls; now each call is one broadcast
    # probe on qid + 4 element_at lookups.  The d values and the
    # ((d0+d1)+d2)+d3 order are unchanged, so ADC is bit-identical
    # (paired A/B wall 0.79x, CPU 0.81x; oracle MATCH x3 SFs).
    qtab = F.broadcast(
        qd.groupBy("qid")
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (
                                F.col("m").cast("bigint") * PQ_K + F.col("code")
                            ).alias("k"),
                            F.col("d"),
                        )
                    )
                )
            ).alias("dm")
        )
        .localCheckpoint(eager=True)  # model-sized (q rows); reused per hop
    )

    def adc_score(pairs: DataFrame) -> DataFrame:
        out = pairs.join(enc, pairs["cid"] == enc["vec_id"]).select(
            "qid", "cid", "code_0", "code_1", "code_2", "code_3"
        )
        out = out.join(qtab, "qid")
        el = [
            F.element_at(
                "dm", (F.lit(m * PQ_K) + F.col(f"code_{m}")).cast("bigint")
            )
            for m in range(PQ_M)
        ]
        return out.select(
            "qid", "cid", (((el[0] + el[1]) + el[2]) + el[3]).alias("adc")
        )

    wa = Window.partitionBy("qid").orderBy(F.col("adc").asc(), "cid")
    entries = v.filter(F.col("vec_id") < GANN_ENTRIES).select(
        F.col("vec_id").alias("cid")
    )
    visited = qe.select("qid").crossJoin(F.broadcast(entries))
    for _ in range(GANN_HOPS):
        bm = (
            adc_score(visited)
            .withColumn("rk", F.row_number().over(wa))
            .filter(F.col("rk") <= GANN_B)
            .select("qid", "cid")
        )
        ed = edges.select(F.col("src").alias("e_src"), F.col("dst").alias("e_dst"))
        grown = bm.join(ed, bm["cid"] == ed["e_src"]).select(
            "qid", F.col("e_dst").alias("cid")
        )
        visited = visited.unionAll(grown).distinct()
    short = (
        adc_score(visited.filter(F.col("qid") != F.col("cid")))
        .withColumn("rk", F.row_number().over(wa))
        .filter(F.col("rk") <= GPQ_RERANK)
        .select("qid", "cid", "adc")
    )
    qv = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("r_emb"),
        F.col("nrm").alias("r_n"),
    )
    cv = v.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_n"),
    )
    wr = Window.partitionBy("qid").orderBy(F.col("cos").desc(), "cid")
    return (
        short.join(F.broadcast(qv), "qid")
        .join(cv, "cid")
        .withColumn(
            "cos",
            dot(F.col("r_emb"), F.col("c_emb"))
            / F.nullif(F.col("r_n") * F.col("c_n"), F.lit(0.0)),
        )
        .withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rank") <= K)
        .select(
            "qid",
            "cid",
            "rank",
            (F.floor(F.col("cos") * 1e6 + 0.5) / 1e6).alias("cos"),
            (F.floor(F.col("adc") * 1e6 + 0.5) / 1e6).alias("adc_dist"),
        )
        .orderBy("qid", "rank")
    )

_PQ_REFRESH_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
), ms AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(m)
), cb AS (
  SELECT ms.m, vec_id AS code,
         list_slice(embedding, ms.m * {SUB_D} + 1, (ms.m + 1) * {SUB_D}) AS cemb
  FROM e CROSS JOIN ms WHERE vec_id < {PQ_K}
), sub AS (
  SELECT vec_id, ms.m,
         list_slice(embedding, ms.m * {SUB_D} + 1, (ms.m + 1) * {SUB_D}) AS semb
  FROM e CROSS JOIN ms
), a0 AS MATERIALIZED (
  SELECT vec_id, m, semb, code AS code0 FROM (
    SELECT sub.vec_id, sub.m, sub.semb, cb.code,
           ROW_NUMBER() OVER (
             PARTITION BY sub.vec_id, sub.m
             ORDER BY list_distance(semb, cemb), code) AS rk
    FROM sub JOIN cb ON sub.m = cb.m) WHERE rk = 1
), dims AS (
  SELECT m, code0, g.i AS dim, semb[g.i] AS val
  FROM a0, UNNEST(GENERATE_SERIES(1, {SUB_D})) AS g(i)
), cm AS (
  SELECT m, code0, dim, FLOOR(AVG(val) * 1e6 + 0.5) / 1e6 AS cv
  FROM dims GROUP BY m, code0, dim
), cb1 AS MATERIALIZED (
  SELECT m, code0 AS code, LIST(cv ORDER BY dim) AS cemb
  FROM cm GROUP BY m, code0
), a1 AS MATERIALIZED (
  SELECT vec_id, m, code0, code AS code1 FROM (
    SELECT a.vec_id, a.m, a.code0, c.code,
           ROW_NUMBER() OVER (
             PARTITION BY a.vec_id, a.m
             ORDER BY list_distance(a.semb, c.cemb), c.code) AS rk
    FROM a0 a JOIN cb1 c ON a.m = c.m) WHERE rk = 1
), before AS (
  SELECT m, code0 AS code, CAST(COUNT(*) AS BIGINT) AS n_before,
         CAST(SUM(CASE WHEN code0 = code1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_stayed
  FROM a1 GROUP BY m, code0
), after AS (
  SELECT m, code1 AS code, CAST(COUNT(*) AS BIGINT) AS n_after
  FROM a1 GROUP BY m, code1
)
SELECT b.m, b.code, b.n_before,
       CAST(COALESCE(a.n_after, 0) AS BIGINT) AS n_after, b.n_stayed,
       FLOOR((1.0 - CAST(b.n_stayed AS DOUBLE) / b.n_before) * 1e6 + 0.5)
         / 1e6 AS churn_frac
FROM before b LEFT JOIN after a ON a.m = b.m AND a.code = b.code
ORDER BY b.m, b.code
"""


@query("q_d3_pq_refresh_churn", oracle=_PQ_REFRESH_ORACLE, group="D")
def pq_refresh_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ CODEBOOK-REFRESH GAUGE — q_d3_ivf_reassign_churn's maintenance
    question asked of the PRODUCT QUANTIZER: after one Lloyd step per
    subspace (each sub-centroid moves to the 6dp-quantized mean of its
    assigned sub-vectors), how many corpus CODES change per (subspace,
    code) cell?  A code change means the stored byte codes are stale —
    high churn after a codebook retrain forces a corpus re-encode (a full
    write pass over n·M bytes), near-zero churn means the old codes still
    serve; this is the number that decides whether the retrain ships.
    Unlike the IVF gauge (one 64-dim codebook of {N_CELLS} cells), the
    PQ refresh is {PQ_M} independent {SUB_D}-dim problems of {PQ_K} cells
    — churn is reported per (m, code) so a single drifting subspace is
    visible on its own.

    Scale shape: both assignment passes are broadcast one-row codebook
    expressions over the exploded (vec_id, m) sub-slices (corpus-linear,
    no shuffle for assignment); the Lloyd step is one hash-agg keyed on
    (m, code, dim) — {PQ_M}·{PQ_K}·{SUB_D} rows of state.  Determinism:
    assignment ranks on (dist, code) via lexicographic array_min both
    engines; updated sub-centroids quantized to 6dp before the second
    assignment (the E84 discipline)."""
    from .vector import l2_distance

    emb = load_tables(spark, sf_dir)["embeddings"]
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    ms = F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("m")
    sub = e.select("vec_id", "emb", ms).select(
        "vec_id", "m", F.slice(F.col("emb"), F.col("m") * SUB_D + 1, SUB_D).alias("semb")
    )
    cb0 = (
        e.filter(F.col("vec_id") < PQ_K)
        .select(F.col("vec_id").alias("code"), "emb", ms)
        .select(
            "m", "code",
            F.slice(F.col("emb"), F.col("m") * SUB_D + 1, SUB_D).alias("cemb"),
        )
    )

    def assign(side: DataFrame, cbs: DataFrame, out: str) -> DataFrame:
        row = F.broadcast(
            cbs.groupBy().agg(
                F.collect_list(F.struct("m", "code", "cemb")).alias("cbs")
            )
        )
        scored = F.transform(
            F.filter("cbs", lambda c: c["m"] == F.col("m")),
            lambda c: F.struct(
                l2_distance(F.col("semb"), c["cemb"]).alias("dist"),
                c["code"].alias("code"),
            ),
        )
        return (
            side.crossJoin(row)
            .withColumn(out, F.array_min(scored)["code"])
            .drop("cbs")
        )

    a0 = assign(sub, cb0, "code0").localCheckpoint(eager=True)
    cm = (
        a0.select("m", "code0", F.posexplode("semb").alias("dim", "val"))
        .groupBy("m", "code0", "dim")
        .agg((F.floor(F.avg("val") * 1e6 + 0.5) / 1e6).alias("cv"))
    )
    cb1 = cm.groupBy("m", "code0").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cv"))), lambda s: s["cv"]
        ).alias("cemb")
    ).select("m", F.col("code0").alias("code"), "cemb")
    a1 = assign(a0, cb1, "code1")
    # r13 optimization (same finding as q_d3_ivf_reassign_churn): aggregate
    # once to the (m, code0, code1) transition table — PQ_M·PQ_K^2 rows max
    # — and derive both rollups from it, so the branches share one pairs
    # subtree (deduplicated by exchange/stage reuse at runtime) and the
    # rollups read a codes^2-row table instead of two corpus passes.  No
    # persist: the paired A/B showed a cache here only added build cost.
    # Exact integer regrouping.
    pairs = (
        a1.groupBy("m", "code0", "code1")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    before = pairs.groupBy("m", F.col("code0").alias("code")).agg(
        F.sum("n").cast("bigint").alias("n_before"),
        F.sum(F.when(F.col("code0") == F.col("code1"), F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_stayed"),
    )
    after = pairs.groupBy("m", F.col("code1").alias("code")).agg(
        F.sum("n").cast("bigint").alias("n_after")
    )
    return (
        before.join(after, ["m", "code"], "left")
        .select(
            "m",
            "code",
            "n_before",
            F.coalesce(F.col("n_after"), F.lit(0)).cast("bigint").alias("n_after"),
            "n_stayed",
            (
                F.floor(
                    (1.0 - F.col("n_stayed").cast("double") / F.col("n_before"))
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("churn_frac"),
        )
        .orderBy("m", "code")
    )

