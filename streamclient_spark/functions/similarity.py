"""Similarity search over embedding columns (SURVEY.md §2B B-L3).

Two search paths over ``embeddings.embedding`` (``array<float>``,
dim 64):

- ``q_sim_topk``: brute-force cosine top-k — the exact baseline. Dot
  products are sequential double-precision folds over ``zip_with``
  (JVM codegen, no Python); top-k is a ranking window per query vector.
- ``q_sim_lsh``: random-hyperplane LSH bucketing — the approximate
  scale path. Each vector gets a sign-bit bucket from 8 fixed ±1
  hyperplanes; search only compares vectors sharing a bucket, cutting
  the pair space by ~2⁸ at the cost of recall (Charikar's SimHash for
  cosine). The hyperplanes are deterministic module constants so both
  engines (and every executor) agree without any fitted state.

Scale notes (100 TB): brute force is a broadcast of the (small) query
set against a full scan of the corpus — linear, embarrassingly
parallel, no shuffle except the final per-query top-k (tiny). The LSH
variant turns the self-join into an equi-join on the bucket id, which
shuffles each side once on a 256-value key; for real corpora you would
widen to multi-probe (flip one bit) to recover recall — same plan
shape. An IVF variant would replace the hash bucket with a learned
centroid id; the join/topk skeleton is identical.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamclient_spark.functions.vectors import dot_f64, dot_fold, norm
from streamclient_spark.plans.registry import register
from streamclient_spark.tables import load

EMBED_DIM = 64
N_HYPERPLANES = 8
TOP_K = 10
N_QUERIES = 10  # query set = vec_id < 10


def _hyperplanes() -> list[list[int]]:
    """8 fixed ±1 hyperplanes, derived from md5 so they are reproducible
    from public code with no RNG state (seeded once, a module constant)."""
    planes = []
    for j in range(N_HYPERPLANES):
        row = []
        for d in range(EMBED_DIM):
            digest = hashlib.md5(f"plane-{j}-{d}".encode()).digest()
            row.append(1 if digest[0] % 2 == 0 else -1)
        planes.append(row)
    return planes


HYPERPLANES = _hyperplanes()


def lsh_bucket(emb: Column) -> Column:
    """Sign-bit bucket id (0..255) of an embedding under the fixed
    hyperplanes: bit j set iff ⟨emb, plane_j⟩ > 0. Sequential double
    fold per plane — deterministic summation order."""
    bucket = F.lit(0)
    for j, plane in enumerate(HYPERPLANES):
        proj = dot_fold(
            emb, F.array(*[F.lit(float(v)) for v in plane])
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def _sql_plane_literal(j: int) -> str:
    return "[" + ", ".join(f"{v}.0" for v in HYPERPLANES[j]) + "]"


def sql_lsh_bucket(emb_expr: str) -> str:
    """DuckDB twin of :func:`lsh_bucket` (list_dot_product is the same
    sequential double fold once the list is cast to DOUBLE[])."""
    terms = [
        f"(CASE WHEN list_dot_product(CAST({emb_expr} AS DOUBLE[]), "
        f"{_sql_plane_literal(j)}) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(N_HYPERPLANES)
    ]
    return "(" + " + ".join(terms) + ")"


_SQL_COS = (
    "list_cosine_similarity(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
)


# ---------------------------------------------------------------------------
# q_sim_topk — exact brute-force cosine top-k (B-L3)
# ---------------------------------------------------------------------------


@register(
    "q_sim_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_SQL_COS.format(a="q.qe", b="e.embedding")} AS cos_sim
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, round(cos_sim, 6) AS cos_sim,
           CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY query_id
               ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    )
    WHERE rank <= {TOP_K}
    """,
)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-L3: exact cosine top-k — broadcast the query vectors against a
    full corpus scan, rank per query. The fixture's top-10/11 cosine gap
    is ≥1e-3 while cross-engine double drift is ~1e-15, so the selected
    neighbor sets and ranks are deterministic; the reported cosine is
    rounded to 6 decimals for the value hash."""
    e = load(spark, sf_dir, "embeddings").withColumn(
        "nrm", norm(F.col("embedding"))
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )
    scored = (
        F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                dot_f64(F.col("qe"), F.col("embedding"))
                / (F.col("qnrm") * F.col("nrm"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# q_sim_lsh — hyperplane-LSH bucketed ANN (B-L3 scale path)
# ---------------------------------------------------------------------------


@register(
    "q_sim_lsh",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             {sql_lsh_bucket("embedding")} AS bucket
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS qe, bucket FROM b
      WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id, q.bucket,
             {_SQL_COS.format(a="q.qe", b="c.embedding")} AS cos_sim
      FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, bucket, round(cos_sim, 6) AS cos_sim,
           CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY query_id
               ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    )
    WHERE rank <= {TOP_K}
    """,
)
def q_sim_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-L3 scale path: approximate top-k — bucket every vector by the
    sign pattern of 8 fixed hyperplane projections, then rank only
    within the query's bucket (equi-join on bucket id instead of a
    cross join). Projections are sequential double folds; a sign flip
    would need |⟨e,p⟩| below ~1e-12, which the fixture's projections
    (magnitude ~0.1+) never approach."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        lsh_bucket(F.col("embedding")).alias("bucket"),
        norm(F.col("embedding")).alias("nrm"),
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("bucket").alias("qbucket"),
        F.col("nrm").alias("qnrm"),
    )
    scored = (
        F.broadcast(q)
        .join(
            e,
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "bucket",
            (
                dot_f64(F.col("qe"), F.col("embedding"))
                / (F.col("qnrm") * F.col("nrm"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "bucket",
            F.round("cos_sim", 6).alias("cos_sim"),
            "rank",
        )
    )
