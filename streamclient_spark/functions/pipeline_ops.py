"""Training-data pipeline utilities (SURVEY.md §2C round-2 extras).

Three operators every large-scale LLM data pipeline runs downstream of
dedup/quality filtering, each with a DuckDB oracle:

- **Deterministic dataset splits** (``q_sample_split``): train/val/test
  assignment by a salted content-stable hash — reproducible across
  runs, engines, and cluster sizes (never ``rand()``: a retried task
  must re-derive the same split), with no coordination or shuffle.
- **Benchmark contamination detection** (``q_text_contamination``):
  which corpus documents share 5-gram shingles with a benchmark/probe
  set — the n-gram-overlap decontamination check (GPT-3 appendix C
  style). The probe side is small by construction, so the check is a
  broadcast join against an exploded corpus: one pass, no corpus
  self-join.
- **PII scrubbing** (``q_text_scrub``): regex redaction of
  email-shaped spans with per-document match counts. The fixture's
  word-soup text contains no organic emails, so the query plants
  deterministic ones on a doc_id rule — identically on both engines —
  and the scrub must find exactly those.

Scale notes (100 TB): the split is a pure stateless projection
(embarrassingly parallel); contamination shuffles only (doc_id,
shingle) pairs of *candidate* matches after the broadcast probe filter;
scrubbing is a regex projection inside whole-stage codegen. None of
the three carries state or a fact-fact shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamclient_spark.functions.dedup import hash32, sql_hash32
from streamclient_spark.functions.text import sql_shingles
from streamclient_spark.plans.registry import register
from streamclient_spark.tables import load

#: split layout: 80 / 10 / 10 over hash buckets 0..99
_SPLIT_SALT = "split-v1-"
_TRAIN_LT, _VAL_LT = 80, 90

#: probe set for the contamination check: the first 20 documents play
#: the role of a held-out benchmark
_PROBE_MAX_ID = 20

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def _shingle_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 5-gram shingles per document, exploded to
    ``(doc_id, shingle)`` rows, in one Arrow pass (the Catalyst
    higher-order-function shingle expression is interpreted per
    element — measured ~6× slower on this query; same finding as the
    MinHash profiles in :mod:`streamclient_spark.functions.dedup`).
    Semantics identical to ``shingles(tokens(text))``."""
    import re

    import pandas as pd

    ws = re.compile(r"\s+")

    def rows(batches):
        for pdf in batches:
            ids, shs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [t for t in ws.split(text) if t]
                if len(toks) >= 5:
                    sh = {
                        " ".join(toks[i : i + 5])
                        for i in range(len(toks) - 4)
                    }
                else:
                    sh = {" ".join(toks)}
                ids.extend([doc_id] * len(sh))
                shs.extend(sh)
            yield pd.DataFrame({"doc_id": ids, "shingle": shs})

    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .mapInPandas(rows, "doc_id bigint, shingle string")
    )


@register(
    "q_sample_split",
    oracle=f"""
    SELECT doc_id,
           {sql_hash32(f"'{_SPLIT_SALT}' || CAST(doc_id AS VARCHAR)")} % 100
             AS bucket,
           CASE
             WHEN {sql_hash32(f"'{_SPLIT_SALT}' || CAST(doc_id AS VARCHAR)")}
                  % 100 < {_TRAIN_LT} THEN 'train'
             WHEN {sql_hash32(f"'{_SPLIT_SALT}' || CAST(doc_id AS VARCHAR)")}
                  % 100 < {_VAL_LT} THEN 'val'
             ELSE 'test'
           END AS split
    FROM documents
    """,
)
def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split: bucket =
    ``md5-hash32(salt || doc_id) mod 100``. Content-stable and
    engine-stable (the md5 convention both engines share), so the same
    document lands in the same split on every run, engine, and cluster
    size — the property ``rand()``-based splitting silently lacks
    under task retries. A pure projection: no shuffle, no state; at
    100 TB the split column doubles as a partition key for writing the
    three datasets in one pass."""
    d = load(spark, sf_dir, "documents")
    bucket = (
        hash32(F.concat(F.lit(_SPLIT_SALT), F.col("doc_id").cast("string")))
        % 100
    )
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < _TRAIN_LT, "train")
        .when(bucket < _VAL_LT, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "q_text_contamination",
    oracle=f"""
    WITH _toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), t -> t <> '')
               AS toks
      FROM documents
    ),
    sets AS (
      SELECT doc_id, {sql_shingles("toks")} AS s FROM _toks
    ),
    probe AS (
      SELECT DISTINCT unnest(s) AS shingle FROM sets
      WHERE doc_id < {_PROBE_MAX_ID}
    ),
    corpus AS (
      SELECT doc_id, unnest(s) AS shingle FROM sets
      WHERE doc_id >= {_PROBE_MAX_ID}
    )
    SELECT c.doc_id, count(DISTINCT c.shingle) AS n_overlap
    FROM corpus c JOIN probe p ON c.shingle = p.shingle
    GROUP BY c.doc_id
    """,
)
def q_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: corpus documents sharing ≥1
    5-gram shingle with the probe ("benchmark") set, with the count of
    distinct overlapping shingles. The probe side is tiny → Catalyst
    broadcasts it into the exploded corpus scan; the only shuffle is
    the per-document count-distinct aggregate of the *matches*. The
    100 TB form is identical — benchmark suites are KBs-to-MBs against
    a corpus of TBs, which is exactly the broadcast-join asymmetry."""
    sets = _shingle_rows(spark, sf_dir)
    probe = (
        sets.filter(F.col("doc_id") < _PROBE_MAX_ID)
        .select("shingle")
        .distinct()
    )
    corpus = sets.filter(F.col("doc_id") >= _PROBE_MAX_ID)
    return (
        corpus.join(F.broadcast(probe), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("n_overlap"))
    )


@register(
    "q_text_scrub",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 7 = 0
                     THEN ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@example.com now'
                     ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_redacted,
           md5(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'))
             AS scrubbed_md5
    FROM planted
    """,
)
def q_text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: replace email-shaped spans with a placeholder and
    count redactions per document. The fixture text is synthetic word
    soup with no organic PII, so emails are PLANTED deterministically
    (every 7th doc_id) on both engines; the scrub must find exactly
    those — a self-verifying redaction test. The output carries the
    md5 of the scrubbed text (not the text itself) so the hash compare
    pins the full redacted content byte-for-byte. Pure regex
    projection: codegen'd, shuffle-free, linear at any scale."""
    d = load(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return planted.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(text, '{_EMAIL_RE}', 0)"))
        .cast("bigint")
        .alias("n_redacted"),
        F.md5(F.regexp_replace("text", _EMAIL_RE, "<EMAIL>")).alias(
            "scrubbed_md5"
        ),
    )
