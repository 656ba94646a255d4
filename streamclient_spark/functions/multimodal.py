"""Multimodal (binary) column support (SURVEY.md §2B B-L5).

Images/audio/video are treated as opaque ``binary`` payload columns
with a typed metadata struct beside them — the layout
``spark.read.format('binaryFile')`` produces and every large-scale
multimodal pipeline uses (payload bytes + sidecar metadata, never
parsed rows).

The container has no image/audio codecs, so the *decode* step is a
deterministic stub (byte statistics standing in for pixel statistics);
everything around it — BinaryType schema, Arrow batch transfer through
``mapInPandas``, batch-shaped feature extraction, partition behavior —
is the real plumbing a decoder would ride on. Swapping the stub body
for PIL/ffmpeg is a one-function change (marked below).

Scale notes (100 TB): payloads dominate bytes; the rule is to keep them
out of shuffles. Both queries here are shuffle-free single passes —
metadata extraction is a projection, and feature extraction is
``mapInPandas`` (per-partition Arrow batches, no repartitioning). On a
real corpus you would store payloads in their own parquet column so
row-group pruning on metadata never drags payload I/O.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from streamclient_spark.plans.registry import register
from streamclient_spark.tables import load

_FORMATS = ("png", "jpeg", "wav")


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the multimodal layout from ``documents``: the utf-8
    bytes of ``text`` stand in for an encoded media payload, plus a
    deterministic typed metadata struct (format/width/height). This is
    the fixture analog of a ``binaryFile`` read."""
    d = load(spark, sf_dir, "documents")
    fmt = F.element_at(
        F.array(*[F.lit(x) for x in _FORMATS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            fmt.alias("format"),
            (64 + (F.col("doc_id") % 7) * 32).alias("width"),
            (64 + (F.col("doc_id") % 5) * 32).alias("height"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# q_multimodal_meta — payload + metadata projection (B-L5)
# ---------------------------------------------------------------------------


@register(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           hex(encode(text)) AS payload_hex,
           md5(text) AS payload_md5,
           octet_length(encode(text)) AS n_bytes,
           ['png', 'jpeg', 'wav'][CAST(doc_id % 3 AS INT) + 1] AS format,
           64 + (doc_id % 7) * 32 AS width,
           64 + (doc_id % 5) * 32 AS height
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-L5: binary payload with typed metadata — digest, byte length,
    and the flattened metadata fields. Pure projection; the payload
    bytes flow through untouched (the scan never decodes them). The
    result ships the payload hex-encoded: the differential harness
    canonicalizes by sorting values and raw bytearrays are unhashable
    there (CORRECTNESS_r02), so binary result columns are always
    emitted as hex — the same contract q_multimodal_frames uses."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        F.hex("payload").alias("payload_hex"),
        F.md5("payload").alias("payload_md5"),
        F.octet_length("payload").alias("n_bytes"),
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


# ---------------------------------------------------------------------------
# q_multimodal_features — mapInPandas decode stub (B-L5)
# ---------------------------------------------------------------------------

_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("max_byte", LongType()),
        StructField("head_hex", StringType()),
    ]
)


def _decode_and_featurize(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched decode + feature extraction.

    DECODE STUB: byte statistics stand in for decoded-media features
    (the container ships no codecs). A real deployment replaces the
    body of this loop with e.g. ``PIL.Image.open(io.BytesIO(payload))``
    and keeps the batch shape identical.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len),
                "mean_byte": payloads.map(
                    lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                ),
                "max_byte": payloads.map(lambda b: max(b) if len(b) else 0),
                "head_hex": payloads.map(lambda b: bytes(b[:8]).hex()),
            }
        )


@register("q_multimodal_features", oracle=None)  # binary UDF path → rows-only
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-L5: feature extraction over binary payloads via ``mapInPandas``
    — payload bytes cross to Python once per partition as Arrow batches,
    features come back columnar. Deterministic stub decode (see
    :func:`_decode_and_featurize`); correctness is pinned by a unit test
    against independently computed byte statistics."""
    m = media_table(spark, sf_dir)
    return m.select("doc_id", "payload").mapInPandas(
        _decode_and_featurize, schema=_FEATURE_SCHEMA
    )


# ---------------------------------------------------------------------------
# q_multimodal_resize — decode → resize → re-encode stub (B-L5)
# ---------------------------------------------------------------------------

THUMB_W = 32
THUMB_H = 32

_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_w", LongType()),
        StructField("out_h", LongType()),
        StructField("thumb_md5", StringType()),
        StructField("thumb_mean", DoubleType()),
    ]
)


def _resize_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched decode → nearest-neighbor resize → digest.

    DECODE STUB: the payload bytes are interpreted as a row-major
    ``height × width`` grayscale plane (tiled with ``np.resize`` when
    the payload is shorter — deterministic), standing in for a codec
    decode. The *resize kernel is real*: vectorized nearest-neighbor
    index sampling to a 32×32 thumbnail, the same gather a PIL
    ``Image.resize(..., NEAREST)`` performs. A production deployment
    replaces only the two DECODE lines with the codec call.
    """
    import hashlib

    import numpy as np

    ys = (np.arange(THUMB_H)[:, None], np.arange(THUMB_W)[None, :])

    def one(payload: bytes, w: int, h: int) -> tuple[str, float]:
        img = np.resize(np.frombuffer(payload, dtype=np.uint8), (h, w))  # DECODE
        thumb = img[ys[0] * h // THUMB_H, ys[1] * w // THUMB_W]
        return hashlib.md5(thumb.tobytes()).hexdigest(), float(thumb.mean())

    for pdf in batches:
        out = [
            one(p, int(w), int(h))
            for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "out_w": THUMB_W,
                "out_h": THUMB_H,
                "thumb_md5": [o[0] for o in out],
                "thumb_mean": [o[1] for o in out],
            }
        )


@register("q_multimodal_resize", oracle=None)  # binary UDF path → rows-only
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-L5: image resize over binary payloads — ``mapInPandas`` with a
    stubbed decode and a real vectorized nearest-neighbor kernel; one
    shuffle-free pass, payload bytes never leave their partition.
    Correctness is pinned by a unit test against an independent
    recomputation of the same gather."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id", "payload", F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    ).mapInPandas(_resize_batches, schema=_RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# q_multimodal_frames — video frame sampling (B-L5)
# ---------------------------------------------------------------------------

FRAME_BYTES = 128
FRAME_STRIDE = 2  # keep every 2nd frame

_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("n_frame_bytes", LongType()),
        StructField("frame_hex", StringType()),
    ]
)


def _sample_frames(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """One row per sampled frame: the payload is a concatenation of
    fixed-length encoded frames (the DECODE stub — a real container
    format would parse frame boundaries instead); every
    ``FRAME_STRIDE``-th frame is kept and emitted as hex. One row in →
    many rows out through the same Arrow batch channel, the
    ``mapInPandas`` form of a table function."""
    for pdf in batches:
        ids, idxs, lens, hexes = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            n_frames = -(-len(b) // FRAME_BYTES)
            for i in range(0, n_frames, FRAME_STRIDE):
                frame = b[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                ids.append(doc_id)
                idxs.append(i)
                lens.append(len(frame))
                hexes.append(frame.hex().upper())
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "frame_idx": idxs,
                "n_frame_bytes": lens,
                "frame_hex": hexes,
            }
        )


@register(
    "q_multimodal_frames",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS nb
      FROM documents
    )
    SELECT doc_id,
           unnest(range(0, CAST(ceil(nb / {FRAME_BYTES}.0) AS BIGINT),
                        {FRAME_STRIDE})) AS frame_idx,
           least({FRAME_BYTES},
                 nb - unnest(range(0, CAST(ceil(nb / {FRAME_BYTES}.0)
                                           AS BIGINT),
                             {FRAME_STRIDE})) * {FRAME_BYTES})
             AS n_frame_bytes,
           substring(hx,
                     unnest(range(0, CAST(ceil(nb / {FRAME_BYTES}.0)
                                          AS BIGINT),
                            {FRAME_STRIDE})) * {2 * FRAME_BYTES} + 1,
                     {2 * FRAME_BYTES}) AS frame_hex
    FROM d
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-L5: frame sampling from video-like binary payloads — fixed
    128-byte frames, every 2nd kept. The set-returning decode runs as
    ``mapInPandas`` (Arrow in/out, shuffle-free); the DuckDB oracle
    recomputes the identical byte slices via hex-string arithmetic, so
    this UDF path is value-hash-checked, not just rows-only."""
    m = media_table(spark, sf_dir)
    return m.select("doc_id", "payload").mapInPandas(
        _sample_frames, schema=_FRAME_SCHEMA
    )


# ---------------------------------------------------------------------------
# q_multimodal_dedup — exact asset dedup by payload digest (round 4)
# ---------------------------------------------------------------------------


@register(
    "q_multimodal_dedup",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             ['png', 'jpeg', 'wav'][CAST(doc_id % 3 AS INT) + 1]
               AS format,
             md5(text) AS digest,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    ),
    g AS (
      SELECT format, digest, count(*) AS n_copies,
             any_value(n_bytes) AS n_bytes
      FROM m GROUP BY format, digest
    )
    SELECT format,
           CAST(SUM(n_copies) AS BIGINT) AS n_assets,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(count(*) FILTER (WHERE n_copies > 1) AS BIGINT)
             AS n_dup_groups,
           CAST(SUM(n_copies) - count(*) AS BIGINT) AS n_redundant,
           CAST(coalesce(SUM((n_copies - 1) * n_bytes), 0) AS BIGINT)
             AS reclaimable_bytes
    FROM g GROUP BY format
    """,
)
def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup by payload digest — the asset-store
    dedup/reclaim report (same bytes uploaded twice → one stored
    copy): per format, distinct payloads, duplicate groups, redundant
    copies, and reclaimable bytes. The binary analog of
    q_dedup_exact's text hash-groupBy — the FIRST pass of any
    multimodal curation pipeline, run before perceptual/near-dup
    passes because it is free (one shuffle on a 16-byte digest) and
    typically removes the bulk.

    Plan: digest computed in the scan projection (payload bytes never
    shuffle — only the digest and length move), one map-combined
    group on (format, digest), then a 3-row format rollup. Linear,
    shuffle payload is O(distinct assets)·32 bytes at 100 TB. Digest
    collisions (~2⁻¹²⁸) merge groups identically on both engines."""
    m = media_table(spark, sf_dir)
    g = (
        m.select(
            F.col("meta.format").alias("format"),
            F.md5("payload").alias("digest"),
            F.octet_length("payload").alias("n_bytes"),
        )
        .groupBy("format", "digest")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.any_value(F.col("n_bytes")).alias("n_bytes"),
        )
    )
    return g.groupBy("format").agg(
        F.sum("n_copies").cast("long").alias("n_assets"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.count_if(F.col("n_copies") > 1)
        .cast("long")
        .alias("n_dup_groups"),
        (F.sum("n_copies") - F.count(F.lit(1)))
        .cast("long")
        .alias("n_redundant"),
        F.coalesce(
            F.sum((F.col("n_copies") - 1) * F.col("n_bytes")), F.lit(0)
        )
        .cast("long")
        .alias("reclaimable_bytes"),
    )
