"""User-defined function surface (SURVEY.md §2B B-U1..B-U3).

Three UDF shapes, each demonstrating the sanctioned slow path and how
to keep it fast:

- scalar **pandas UDF** (Arrow-vectorized, B-U1) — ``q_udf_scalar``
- grouped-aggregate **pandas UDAF** (B-U2, salted two-phase) —
  ``q_udaf_grouped``
- **Python UDTF** (one row → many, B-U3) — ``q_udtf_explode``

Policy (SURVEY.md §6): row-at-a-time Python UDFs never appear on a hot
path anywhere in this engine; when Python is genuinely needed the data
crosses as Arrow batches (pandas_udf / applyInPandas / mapInPandas).
The UDTF below is deliberately applied to a *filtered* input — the
builtin ``explode`` (see ``q_fn_array``) is the scale path for
set-returning transforms, and the docstring of each query names its
builtin equivalent.

Cross-engine float conventions: the scalar UDF's arithmetic is a fixed
IEEE expression tree evaluated identically by numpy and DuckDB; the
grouped UDAF sums in exact integer-cents space (numpy int64) mirroring
the DECIMAL convention of :mod:`streamclient_spark.compat`.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from streamclient_spark.plans.registry import register
from streamclient_spark.tables import load

# ---------------------------------------------------------------------------
# B-U1 — scalar pandas UDF (Arrow-vectorized)
# ---------------------------------------------------------------------------


@pandas_udf(DoubleType())
def _net_charge(
    extendedprice: pd.Series, discount: pd.Series, tax: pd.Series
) -> pd.Series:
    """Vectorized net-charge: price·(1-discount)·(1+tax), evaluated by
    numpy on Arrow batches — one IEEE expression tree, bit-identical to
    the SQL twin ``l_extendedprice * (1 - l_discount) * (1 + l_tax)``."""
    return extendedprice * (1.0 - discount) * (1.0 + tax)


@register(
    "q_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS net_charge
    FROM lineitem
    WHERE l_quantity >= 45
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-U1: scalar pandas UDF — Arrow batches in, numpy math, Arrow
    batches out (~10-100× over row-at-a-time Python). The builtin-
    expression equivalent is preferred on hot paths; this query exists
    to pin the vectorized UDF plumbing end-to-end."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        _net_charge("l_extendedprice", "l_discount", "l_tax").alias(
            "net_charge"
        ),
    )


# ---------------------------------------------------------------------------
# B-U2 — grouped-aggregate pandas UDAF (salted two-phase)
# ---------------------------------------------------------------------------

@F.pandas_udf(LongType())
def _cents_sum_udaf(prices: pd.Series) -> int:
    """Grouped-agg pandas UDAF partial: exact integer cents (int64) —
    the numpy mirror of the engine's DECIMAL aggregation convention
    (order-insensitive, so the nondeterministic row order within a
    shuffled group cannot change the result)."""
    return int((prices * 100).round().astype("int64").sum())


@F.pandas_udf(LongType())
def _count_udaf(prices: pd.Series) -> int:
    return int(len(prices))


@F.pandas_udf(DoubleType())
def _max_udaf(qty: pd.Series) -> float:
    return float(qty.max())


@register(
    "q_udaf_grouped",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
           max(l_quantity) AS max_quantity
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-U2: grouped-aggregate pandas UDAF (``pandas_udf`` in
    ``agg``), run as the SALTED TWO-PHASE shape: phase 1 computes UDAF
    partials per (l_returnflag, salt) — each Python task sees a
    bounded ~1/64 slice of a flag's rows via one Arrow column batch —
    and phase 2 combines the 3·64 partial rows with builtin sum/max.
    A pandas UDAF has no map-side partial of its own, so the naive
    one-level form (round 3's ``applyInPandas``, shipping FULL
    whole-row groups to 3 Python tasks) is a straggler by construction
    at any scale; salting restores the partial-aggregate shape while
    keeping the custom logic in Python where builtins couldn't express
    it (here they could — ``q_agg_tpch_q1`` is the builtin twin; this
    query pins the UDAF surface itself)."""
    l = load(spark, sf_dir, "lineitem")
    partial = (
        l.select(
            "l_returnflag",
            "l_extendedprice",
            "l_quantity",
            F.pmod(
                F.xxhash64("l_orderkey", "l_linenumber"), F.lit(64)
            ).alias("__salt"),
        )
        .groupBy("l_returnflag", "__salt")
        .agg(
            _cents_sum_udaf("l_extendedprice").alias("cents"),
            _count_udaf("l_extendedprice").alias("n"),
            _max_udaf("l_quantity").alias("mx"),
        )
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("n").alias("n_rows"),
        (F.sum("cents").cast("double") / 100.0).alias("revenue"),
        F.max("mx").alias("max_quantity"),
    )


# ---------------------------------------------------------------------------
# B-U3 — Python UDTF (one row → many)
# ---------------------------------------------------------------------------


@udtf(returnType="token: string, pos: bigint")
class _TokenizeUDTF:
    """Table function: one document row → one row per token with its
    position. Builtin twin (the scale path): ``posexplode(split(...))``
    — see ``q_fn_array``. Tokenizes on the engine's explicit RE2-\\s
    whitespace class (text.py WS_PATTERN) — bare ``str.split()`` splits
    on ALL Unicode whitespace (NBSP, \\x0b, ideographic space…), a
    latent divergence from the RE2 oracle (ADVICE-r10 class)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        import re

        pos = 0
        for tok in re.split("[ \t\n\f\r]+", text):
            if tok:
                yield tok, pos
                pos += 1


@register(
    "q_udtf_explode",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents
      WHERE doc_id < 100
    )
    SELECT doc_id, unnest(toks) AS token,
           unnest(range(0, len(toks))) AS pos
    FROM t
    """,
)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-U3: Python UDTF — lateral-joined against a pruned input
    (doc_id < 100). Row-based Python is the cost ceiling of the UDF
    surface; production set-returning transforms use ``posexplode``
    (builtin, codegen'd), which this query's unit test cross-checks."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    d.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("tokenize_udtf", _TokenizeUDTF)
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.pos
        FROM _udtf_docs d,
             LATERAL tokenize_udtf(d.text) t
        """
    )


# ---------------------------------------------------------------------------
# q_udf_arrow — raw Arrow batch transform (mapInArrow)
# ---------------------------------------------------------------------------


@register(
    "q_udf_arrow",
    oracle="""
    SELECT event_id,
           CAST(round(value * 10000, 0) AS BIGINT) AS value_e4,
           length(event_type) AS type_len
    FROM events
    """,
)
def q_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF surface, raw-Arrow tier: ``mapInArrow`` hands the kernel
    pyarrow RecordBatches directly — no pandas materialization at all,
    the zero-copy path for kernels that speak Arrow natively (Polars,
    DataFusion-style compute, custom C++ via pyarrow). The kernel here
    runs pyarrow.compute vector ops (fixed-point rounding, UTF-8
    length) whose results the oracle reproduces in SQL, so this
    Python-side tier is value-attested like any builtin. Same batch
    semantics and scale posture as the pandas tier (B-U1): Arrow
    batches stream through, nothing row-at-a-time, no state."""
    import pyarrow as pa
    import pyarrow.compute as pc

    e = load(spark, sf_dir, "events")

    def kernel(batches):
        for batch in batches:
            value = batch.column(batch.schema.get_field_index("value"))
            etype = batch.column(batch.schema.get_field_index("event_type"))
            eid = batch.column(batch.schema.get_field_index("event_id"))
            yield pa.RecordBatch.from_arrays(
                [
                    eid,
                    pc.cast(
                        pc.round(
                            pc.multiply(value, pa.scalar(10000.0)),
                            ndigits=0,
                            round_mode="half_towards_infinity",
                        ),
                        pa.int64(),
                    ),
                    pc.cast(pc.utf8_length(etype), pa.int32()),
                ],
                names=["event_id", "value_e4", "type_len"],
            )

    return e.select("event_id", "value", "event_type").mapInArrow(
        kernel, "event_id bigint, value_e4 bigint, type_len int"
    )
