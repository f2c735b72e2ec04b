"""Multimodal columns (SURVEY.md §2 D6): image/audio/video as opaque BINARY
columns with typed metadata structs, decoded/feature-extracted via Arrow-
batched mapInPandas.

The container has no image/audio codecs, so the decode step is a clearly
marked deterministic STUB (`_fake_decode`) — but everything Spark-side is
real and load-bearing: the binary column, the metadata StructType, the
mapInPandas batch iteration, the output schema, and the partitioning all
match what a production decode pipeline needs (swap `_fake_decode` for a
PIL/ffmpeg call and nothing else changes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans import release_with
from ..registry import query
from ..session import load_tables

DECODE_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, first_byte INT, "
    "width INT, height INT, mean_intensity DOUBLE"
)


def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decoder: deterministic features from raw bytes. A real pipeline
    would decode image bytes here (PIL/torchvision); not available in this
    container — NotImplementedError intentionally NOT raised because the
    fake keeps the pipeline testable end-to-end."""
    for pdf in batches:
        blobs = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": blobs.map(len).astype("int64"),
                "first_byte": blobs.map(lambda b: b[0] if len(b) else -1).astype(
                    "int32"
                ),
                "width": pdf["width"],
                "height": pdf["height"],
                # stand-in for decoded pixel stats: mean byte value.
                # pandas .round (half-even) is safe HERE ONLY because the
                # decode queries are rows-only checked — on any oracle-
                # compared output use floor(x*1e6+0.5)/1e6 (NEXT.md ban)
                "mean_intensity": blobs.map(
                    lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                ).round(6),
            }
        )


def _with_payload(d: DataFrame) -> DataFrame:
    """documents.text re-cast as an opaque binary payload + metadata struct
    (the fixture's stand-in for image bytes)."""
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            F.lit("fake/raw").alias("format"),
        ).alias("meta"),
    )


@query("q_d6_decode_features", oracle=None, group="D")
def decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: binary payload -> mapInPandas decode stub -> typed features.
    Rows-only (the decode is a stub; the plumbing is the deliverable)."""
    d = load_tables(spark, sf_dir)["documents"]
    frames = _with_payload(d).select(
        "doc_id", "payload", F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return frames.mapInPandas(_fake_decode, schema=DECODE_SCHEMA)


@query(
    "q_d6_binary_length",
    oracle="""
SELECT doc_id,
       CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
       CAST(n_chars % 640 AS INT) AS width,
       CAST(n_chars % 480 AS INT) AS height
FROM documents ORDER BY doc_id
""",
    group="D",
)
def binary_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: binary payload byte length + metadata projection — the
    SQL-checkable slice of the multimodal path (no stub involved)."""
    d = load_tables(spark, sf_dir)["documents"]
    p = _with_payload(d)
    return p.select(
        "doc_id",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    ).orderBy("doc_id")


@query("q_d6_frame_sample", oracle=None, group="D")
def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: 'frame sampling' over the binary payload — chunk the blob into
    fixed-size frames and emit every k-th (the video-pipeline access
    pattern: byte-range extraction without full decode)."""
    d = load_tables(spark, sf_dir)["documents"]
    p = _with_payload(d)
    frame_size, stride = 32, 4
    frames = p.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.octet_length("payload") / frame_size).cast("int") - 1,
                        F.lit(0),
                    ),
                ),
                lambda i: F.substring(
                    F.col("payload").cast("string"), i * frame_size + 1, frame_size
                ),
            )
        ).alias("frame_no", "frame_text"),
    )
    return frames.filter(F.col("frame_no") % stride == 0).select(
        "doc_id",
        F.col("frame_no").cast("bigint").alias("frame_no"),
        F.md5("frame_text").alias("frame_digest"),
    )


EMBED_DIM = 8

_EMBED_SCHEMA = "doc_id BIGINT, embedding ARRAY<DOUBLE>"


def _fake_embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB embedding model: deterministic EMBED_DIM-dim vector from byte
    statistics of fixed-size chunks (a real pipeline runs the vision/audio
    encoder here; swap this function, nothing else changes)."""
    for pdf in batches:
        def vec(b: bytes) -> list[float]:
            if not len(b):
                return [0.0] * EMBED_DIM
            step = max(1, len(b) // EMBED_DIM)
            return [
                round(float(sum(b[i * step : (i + 1) * step]))
                      / max(1, len(b[i * step : (i + 1) * step])) / 255.0, 6)
                for i in range(EMBED_DIM)
            ]
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "embedding": pdf["payload"].map(vec)}
        )


@query("q_d6_embed_similarity", oracle=None, group="D")
def embed_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 -> D3 composition, the full multimodal retrieval shape: binary
    payload -> Arrow-batched embedding stub -> cosine top-3 neighbors for
    the first 20 docs. The embedding stage and the similarity stage are the
    same operators a production image-retrieval pipeline would run; only
    the encoder body is a stub. Rows-only (stubbed features)."""
    from pyspark.sql import Window

    d = load_tables(spark, sf_dir)["documents"]
    emb = _with_payload(d).select("doc_id", "payload").mapInPandas(
        _fake_embed, schema=_EMBED_SCHEMA
    )
    q = emb.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    dot = F.aggregate(
        F.zip_with("q_emb", "c_emb", lambda x, y: x * y),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.zip_with(c, c, lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v
        )
    )
    pairs = (
        emb.select(F.col("doc_id").alias("cid"), F.col("embedding").alias("c_emb"))
        .join(F.broadcast(q), F.col("qid") != F.col("cid"))
        .withColumn(
            "cos",
            dot / F.nullif(norm(F.col("q_emb")) * norm(F.col("c_emb")), F.lit(0.0)),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), "cid")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
        .select("qid", "cid", "rank", F.round("cos", 6).alias("cos_sim"))
        .orderBy("qid", "rank")
    )


BINFILE_MOD = 13  # sample: every 13th doc becomes a standalone blob file


@query(
    "q_d6_binaryfile_source",
    oracle=f"""
SELECT doc_id,
       CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
       MD5(text) AS content_md5
FROM documents
WHERE doc_id % {BINFILE_MOD} = 0
ORDER BY doc_id
""",
    group="D",
)
def binaryfile_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 (cont.): ingestion through Spark's REAL ``binaryFile`` source —
    the way image/audio corpora actually arrive (a directory of blob files
    on object storage).  The fixture docs stand in for blobs: each sampled
    doc is materialized as ``<doc_id>.bin`` whose bytes are the utf-8 text,
    then read back via ``format("binaryFile")`` which yields (path,
    modificationTime, length, content); doc_id is recovered from the file
    name and the oracle recomputes length + md5 from the source table, so
    the whole blob round-trip is hash-checked.

    Scale notes: binaryFile scans parallelize across files (one task per
    file up to maxPartitionBytes); the per-file setup here is fixture
    scaffolding — in production the files already exist, and the read +
    regexp_extract + md5 is the entire plan (no shuffle until the sort)."""
    import os
    import tempfile

    d = load_tables(spark, sf_dir)["documents"]
    pdf = (
        d.filter(F.col("doc_id") % BINFILE_MOD == 0)
        .select("doc_id", "text")
        # bounded: fixture scaffolding — a 1/BINFILE_MOD subset materialized
        # once to create the blob files the binaryFile source then reads
        .toPandas()
    )
    blob_dir = tempfile.mkdtemp(prefix="smb_blobs_")
    for _, row in pdf.iterrows():
        with open(os.path.join(blob_dir, f"{int(row.doc_id)}.bin"), "wb") as f:
            f.write(row.text.encode("utf-8"))
    files = spark.read.format("binaryFile").load(blob_dir)
    return (
        files.select(
            F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("length").alias("n_bytes"),
            F.md5("content").alias("content_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_d6_cas_report",
    oracle="""
WITH blobs AS (
  -- DuckDB md5() is VARCHAR-only; the payload IS the UTF-8 encoding of
  -- text, so MD5(text) equals Spark's md5 over the binary payload
  SELECT doc_id, source, MD5(text) AS payload_hash,
         OCTET_LENGTH(ENCODE(text)) AS n_bytes
  FROM documents
), canon AS (
  SELECT source, n_bytes,
         ROW_NUMBER() OVER (PARTITION BY payload_hash ORDER BY doc_id) AS rn
  FROM blobs
)
SELECT source,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(CASE WHEN rn = 1 THEN n_bytes ELSE 0 END) AS BIGINT)
           AS stored_bytes,
       ROUND(1.0 - CAST(SUM(CASE WHEN rn = 1 THEN n_bytes ELSE 0 END) AS DOUBLE)
             / SUM(n_bytes), 6) AS dedup_ratio
FROM canon GROUP BY source ORDER BY source
""",
    group="D",
)
def cas_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 (cont.): content-addressable-storage accounting for binary
    payloads — what a blob store saves by keying media on its digest
    (images/audio repeat heavily in crawled corpora: same logo, same
    stock photo, same intro jingle).  The CAS is GLOBAL (a digest stores
    once, canonical copy = lowest doc_id, the D1 keep rule); the report
    attributes raw vs stored bytes to each source.

    Scale shape: digest+length are per-row projections (the payload never
    leaves its task — only the 16-byte digest shuffles); one hash shuffle
    on the digest for the canonical window (uniform key, the D1 plan),
    then a tiny per-source rollup.  The multimodal counterpart of D1
    exact dedup, on BINARY instead of text."""
    from pyspark.sql import Window

    d = load_tables(spark, sf_dir)["documents"]
    blobs = _with_payload(d).join(d.select("doc_id", "source"), "doc_id").select(
        "doc_id",
        "source",
        F.md5("payload").alias("payload_hash"),
        F.length("payload").cast("bigint").alias("n_bytes"),
    )
    w = Window.partitionBy("payload_hash").orderBy("doc_id")
    canon = blobs.withColumn("rn", F.row_number().over(w))
    stored = F.sum(F.when(F.col("rn") == 1, F.col("n_bytes")).otherwise(0))
    return (
        canon.groupBy("source")
        .agg(
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            stored.cast("bigint").alias("stored_bytes"),
        )
        .select(
            "source",
            "total_bytes",
            "stored_bytes",
            F.round(
                F.lit(1.0) - F.col("stored_bytes").cast("double") / F.col("total_bytes"),
                6,
            ).alias("dedup_ratio"),
        )
        .orderBy("source")
    )


SHARD_BYTES = 32768  # target shard size (WebDataset-style tar shards)
SHARD_BUCKET = 100  # doc_ids per prefix-sum bucket (see q_d4_sequence_pack)


@query(
    "q_d6_shard_manifest",
    oracle=f"""
WITH blobs AS (
  SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS n_bytes FROM documents
), placed AS (
  SELECT doc_id, n_bytes,
         COALESCE(SUM(n_bytes) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
  FROM blobs
)
SELECT CAST(start_off // {SHARD_BYTES} AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_blobs,
       CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
       CAST(MAX(doc_id) AS BIGINT) AS last_doc
FROM placed GROUP BY start_off // {SHARD_BYTES} ORDER BY shard
""",
    group="D",
)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 (cont.): WebDataset-style SHARD MANIFEST — assign every binary
    payload to a ~SHARD_BYTES tar shard by its byte offset in the
    deterministic doc_id stream, and emit the per-shard packing list.
    This is the layout step of multimodal training-data prep: samples are
    grouped into fixed-size shards so dataloaders stream sequential reads.

    Scale shape: the byte-offset prefix sum is the two-stage bucketed form
    (per-bucket cumsums partitioned on bucket, only bucket TOTALS through
    the tiny global window — same recipe as q_d4_sequence_pack, which also
    proves a 3-level nesting for 100 TB).  The oracle states the naive
    single-window spec; the Spark plan never funnels rows through one task.
    """
    d = load_tables(spark, sf_dir)["documents"]
    blobs = d.select(
        "doc_id",
        F.octet_length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
        F.floor(F.col("doc_id") / SHARD_BUCKET).alias("bucket"),
    ).persist()  # narrow (3 ints/blob); both prefix-sum stages read it
    per_bucket = blobs.groupBy("bucket").agg(F.sum("n_bytes").alias("bucket_bytes"))
    wb = Window.partitionBy(F.lit(1)).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )  # bucket totals only — tiny by construction; defined partition, no warn
    offsets = per_bucket.select(
        "bucket", F.coalesce(F.sum("bucket_bytes").over(wb), F.lit(0)).alias("base")
    )
    wi = Window.partitionBy("bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    placed = (
        blobs.join(F.broadcast(offsets), "bucket")
        .withColumn("cum", F.sum("n_bytes").over(wi))
        .withColumn("start_off", F.col("base") + F.col("cum") - F.col("n_bytes"))
    )
    return release_with(
        placed.select(
            F.floor(F.col("start_off") / SHARD_BYTES).cast("bigint").alias("shard"),
            "n_bytes",
            "doc_id",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_blobs"),
            F.sum("n_bytes").cast("bigint").alias("shard_bytes"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.max("doc_id").cast("bigint").alias("last_doc"),
        )
        .orderBy("shard"),
        blobs,
    )


AHASH_CHUNKS = 8  # 8-bit perceptual hash from 8 byte-chunks
AHASH_CHUNK_LEN = 8


def _ahash_exprs() -> tuple[str, str]:
    """Shared-dialect SQL for the 8-bit average-hash over the payload's
    first 64 bytes: bit i = (mean byte of chunk i) > (mean byte of all 64).
    The payload IS UTF-8 text in the fixture, so per-byte access is
    ASCII(SUBSTR(text, pos, 1)) in both engines; a real image aHash does
    exactly this over downsampled pixels."""
    chunk_means = []
    for c in range(AHASH_CHUNKS):
        terms = " + ".join(
            f"ASCII(SUBSTR(text, {c * AHASH_CHUNK_LEN + j + 1}, 1))"
            for j in range(AHASH_CHUNK_LEN)
        )
        chunk_means.append(f"(({terms}) / {AHASH_CHUNK_LEN}.0)")
    total_mean = "((" + " + ".join(chunk_means) + f") / {AHASH_CHUNKS}.0)"
    bits = " + ".join(
        f"(CASE WHEN {chunk_means[c]} > {total_mean} THEN {1 << c} ELSE 0 END)"
        for c in range(AHASH_CHUNKS)
    )
    return bits, total_mean


_AHASH_BITS, _ = _ahash_exprs()

_PHASH_ORACLE = f"""
WITH hashed AS (
  SELECT doc_id, CAST({_AHASH_BITS} AS BIGINT) AS ahash
  FROM documents WHERE LENGTH(text) >= {AHASH_CHUNKS * AHASH_CHUNK_LEN}
), pairs AS (
  SELECT a.ahash, a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM hashed a JOIN hashed b
    ON a.ahash = b.ahash AND a.doc_id < b.doc_id
)
SELECT CAST(ahash AS BIGINT) AS ahash,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(MIN(doc_a) AS BIGINT) AS first_doc
FROM pairs GROUP BY ahash ORDER BY ahash
"""


@query("q_d6_phash_neardup", oracle=_PHASH_ORACLE, group="D")
def phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 (cont.): PERCEPTUAL-HASH near-dup over binary payloads — the
    image-dedup shape (aHash/pHash bucketing) on the fixture's stand-in
    bytes: an 8-bit average-hash (chunk mean > global mean per bit) over
    the first 64 payload bytes, exact-bucket pair counts per hash.  A
    real pipeline swaps the byte window for downsampled pixels; the
    bucket-join dedup topology is identical — and identical to D2's
    SimHash path: hash is map-side, candidates come from ONE equi-join on
    the hash, never all-pairs.

    The shared-dialect ASCII/SUBSTR arithmetic makes the perceptual hash
    itself oracle-checkable — both engines compute the same 8 bits."""
    d = load_tables(spark, sf_dir)["documents"]
    hashed = (
        d.filter(F.length("text") >= AHASH_CHUNKS * AHASH_CHUNK_LEN)
        .selectExpr("doc_id", f"CAST({_AHASH_BITS} AS BIGINT) AS ahash")
    )
    a = hashed.select(F.col("doc_id").alias("doc_a"), "ahash")
    b = hashed.select(F.col("doc_id").alias("doc_b"), "ahash")
    pairs = a.join(b, "ahash").filter(F.col("doc_a") < F.col("doc_b"))
    return (
        pairs.groupBy(F.col("ahash").cast("bigint").alias("ahash"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.min("doc_a").cast("bigint").alias("first_doc"),
        )
        .orderBy("ahash")
    )


THUMB_PIXELS = 64  # 8x8 thumbnail: fixed output size regardless of input


@query(
    "q_d6_resize_thumb",
    oracle=f"""
WITH p AS (
  SELECT doc_id, text AS s, CAST(LENGTH(text) AS BIGINT) AS src_w
  FROM documents
)
SELECT doc_id, src_w,
       MD5(ARRAY_TO_STRING(
         LIST_TRANSFORM(GENERATE_SERIES(0, {THUMB_PIXELS - 1}),
           j -> SUBSTRING(s, CAST(FLOOR(j * src_w / {THUMB_PIXELS}.0) AS INT) + 1, 1)),
         '')) AS thumb_digest
FROM p ORDER BY doc_id
""",
    group="D",
)
def resize_thumb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 (cont.): RESIZE — nearest-neighbor resample of every payload to a
    fixed {THUMB_PIXELS}-sample thumbnail (the image-pipeline resize access
    pattern on the 1-D byte stand-in: output position j reads source
    position floor(j*src_w/{THUMB_PIXELS}), downsampling long payloads and
    repeating samples for short ones — exactly how NN image resize indexes
    a pixel grid).  The digest of the resampled bytes is the checkable
    artifact; a real pipeline swaps the byte indexing for PIL's
    Image.resize inside the same projection and keys CAS dedup or phash on
    the thumbnail (small images dedup far better than full-size).

    This is the SQL-checkable slice: the indexing arithmetic is a pure
    per-row Catalyst expression (fixture text is ASCII so char positions ==
    byte offsets).  Scale shape: one scan, zero shuffles before the
    presentation sort — resize cost is output-size-bounded per row
    ({THUMB_PIXELS} lookups) no matter how large the source payload."""
    d = load_tables(spark, sf_dir)["documents"]
    p = d.select(
        "doc_id",
        F.col("text").alias("s"),
        F.length("text").cast("bigint").alias("src_w"),
    )
    thumb = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), F.lit(THUMB_PIXELS - 1)),
            lambda j: F.col("s").substr(
                F.floor(j * F.col("src_w") / F.lit(float(THUMB_PIXELS))).cast(
                    "int"
                )
                + 1,
                F.lit(1),
            ),
        ),
    )
    return p.select(
        "doc_id", "src_w", F.md5(thumb).alias("thumb_digest")
    ).orderBy("doc_id")
