"""Embedding-column utilities for training-data pipelines (SURVEY.md
§2C): int8 quantization and per-label centroids over the
``embeddings`` fixture table (``vec_id, embedding list<float>[64],
label``).

Both operators are pure built-in projections/aggregations — no Python
on the hot path, no UDFs — and both carry DuckDB oracles.

Cross-engine float determinism: float32→double conversion is exact, so
row-local arithmetic (quantization) hash-matches directly. Cross-ROW
float aggregation (centroid means) is order-dependent in IEEE
arithmetic, so the centroid is defined on a fixed-point grid:
``floor(x·10^6 + 0.5)`` per element (exact BIGINT), summed as longs
(whole-stage codegen, overflow margin ~2^53/1e6 rows per group), then
one IEEE division at the end — the same convention the money
aggregates use (streamclient_spark/compat.py), applied at 1e-6
resolution. At 100 TB this is also the *right* semantics: a centroid
accumulated in fixed point is reproducible across partitionings,
retries, and cluster sizes, which float sums are not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamclient_spark.plans.registry import register
from streamclient_spark.tables import load


@register(
    "q_embed_quantize",
    oracle="""
    SELECT vec_id, label,
           CASE WHEN mx = 0 THEN 0.0 ELSE 127.0 / mx END AS scale,
           array_to_string(list_transform(
             embedding,
             x -> CAST(FLOOR(CAST(x AS DOUBLE)
                             * (CASE WHEN mx = 0 THEN 0.0
                                     ELSE 127.0 / mx END)
                             + 0.5) AS INT)), ',') AS qvec
    FROM (
      SELECT vec_id, label, embedding,
             list_max(list_transform(embedding,
                                     x -> abs(CAST(x AS DOUBLE)))) AS mx
      FROM embeddings
    )
    """,
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of an embedding column: per-vector
    scale ``127 / max|x|`` and the quantized array
    ``floor(x·scale + 0.5)`` (explicit floor-plus-half instead of
    ``round`` — engines disagree on round-half rules, floor does not).

    The 4× size reduction is the standard first step before shipping
    vectors into an ANN index. 100 TB plan: a stateless row-local
    projection over built-in higher-order functions (``transform`` /
    ``array_max``) — whole-stage codegen, zero shuffle, zero Python;
    runs at parquet scan speed and parallelizes embarrassingly.
    Zero-vectors quantize to all-zeros with scale 0 (guarded division).

    The split-recovery ``repartition`` exists because the fixture
    writes the table as ONE parquet row group (one task regardless of
    cores — measured 5.5 s single-task vs 0.6 s split at sf1); with a
    real multi-split table it is a no-op to delete. The higher-order
    lambdas are Catalyst-interpreted per element, which is acceptable
    here (64 elements/row) — unlike the per-token text ops, which use
    fused Arrow passes."""
    e = load(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    mx = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    # scale is MATERIALIZED as a column before the quantizing lambda:
    # referencing the scale *expression* inside the per-element lambda
    # re-evaluates the array_max sub-expression for every element —
    # O(dim²) interpreted evals per row, measured 9 s vs 0.6 s at sf1
    withscale = e.select(
        "vec_id",
        "label",
        "embedding",
        F.when(mx == 0, F.lit(0.0))
        .otherwise(F.lit(127.0) / mx)
        .alias("scale"),
    )
    # qvec is RENDERED to a comma-joined string for the oracle check:
    # integer-array cells round-trip as numpy ndarrays on the DuckDB
    # side but Python lists on the no-Arrow Spark side, so a raw
    # array column hash-flaps depending on the session's Arrow conf
    # (same convention as q_fn_array's sorted_vocab)
    return withscale.select(
        "vec_id",
        "label",
        "scale",
        F.array_join(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(
                    x.cast("double") * F.col("scale") + F.lit(0.5)
                ).cast("int"),
            ),
            ",",
        ).alias("qvec"),
    )


@register(
    "q_embed_centroids",
    oracle="""
    SELECT label, dim,
           CAST(SUM(fx) AS DOUBLE) / (COUNT(*) * 1000000.0) AS centroid,
           COUNT(*) AS n_vectors
    FROM (
      SELECT label,
             generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0
                        + 0.5) AS BIGINT) AS fx
      FROM embeddings
    )
    GROUP BY label, dim
    """,
)
def q_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids — the M-step of distributed k-means and the
    building block for IVF codebook training
    (cf. functions/similarity.py's literal codebook, which this
    operator would replace at real corpus sizes).

    Output is one ``(label, dim, centroid, n_vectors)`` row per
    label×dimension on the 1e-6 fixed-point grid (module docstring).
    100 TB plan: ``posexplode`` multiplies rows by the dimension count
    *before* the shuffle, but the partial aggregate collapses each
    (label, dim) to one long pair per task, so the exchange moves
    |labels|·|dims| rows per task regardless of corpus size — the
    explode never hits the wire. Long sums stay in whole-stage
    codegen; the division happens once per output row."""
    e = load(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label", F.posexplode("embedding").alias("dim", "val")
    ).select(
        "label",
        "dim",
        F.floor(
            F.col("val").cast("double") * F.lit(1000000.0) + F.lit(0.5)
        ).cast("bigint").alias("fx"),
    )
    return (
        exploded.groupBy("label", "dim")
        .agg(
            F.sum("fx").alias("_s"),
            F.count("*").alias("n_vectors"),
        )
        .select(
            "label",
            "dim",
            (
                F.col("_s").cast("double")
                / (F.col("n_vectors") * F.lit(1000000.0))
            ).alias("centroid"),
            "n_vectors",
        )
    )
