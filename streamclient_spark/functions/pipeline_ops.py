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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamclient_spark.functions.dedup import hash32, sql_hash32
from streamclient_spark.functions.text import SQL_TOKENS, sql_shingles, tokens
from streamclient_spark.plans.registry import register
from streamclient_spark.tables import load, split_recovery

#: split layout: 80 / 10 / 10 over hash buckets 0..99
_SPLIT_SALT = "split-v1-"
_TRAIN_LT, _VAL_LT = 80, 90

#: probe set for the contamination check: the first 20 documents play
#: the role of a held-out benchmark
_PROBE_MAX_ID = 20

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def _shingle_rows(docs: DataFrame) -> DataFrame:
    """Distinct 5-gram shingles per document of ``docs``, exploded to
    ``(doc_id, shingle)`` rows, in one Arrow pass (the Catalyst
    higher-order-function shingle expression is interpreted per
    element — measured ~6× slower on this query; same finding as the
    MinHash profiles in :mod:`streamclient_spark.functions.dedup`).
    Semantics identical to ``shingles(tokens(text))``.

    Takes the (pre-filtered) DataFrame rather than loading inside:
    ``mapInPandas`` is opaque to Catalyst, so a doc_id filter applied
    *above* it cannot push down to the scan — callers that shingle a
    subset must filter BEFORE this call or they shingle the whole
    corpus (measured 8.9 s → 4.7 s at sf1 on q_text_contamination,
    which used to shingle all documents twice, once per branch)."""
    import re

    import pandas as pd

    ws = re.compile("[ \t\n\f\r]+")  # RE2 \s, the oracle's class (no \x0b)

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

    # split recovery AFTER the caller's filter (pushdown intact): the
    # near-unsplittable fixture file otherwise caps this CPU-bound pass
    # at 1-3 tasks
    return docs.select("doc_id", "text").repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    ).mapInPandas(
        rows, "doc_id bigint, shingle string"
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
    d = load(spark, sf_dir, "documents")
    # filter BEFORE shingling: mapInPandas is opaque to Catalyst, so
    # these doc_id predicates reach the parquet scan only from below —
    # the probe branch shingles 20 documents, not the whole corpus
    probe = (
        _shingle_rows(d.filter(F.col("doc_id") < _PROBE_MAX_ID))
        .select("shingle")
        .distinct()
    )
    corpus = _shingle_rows(d.filter(F.col("doc_id") >= _PROBE_MAX_ID))
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
    projection: codegen'd, linear at any scale. The split-recovery
    repartition exists because the fixture is a near-unsplittable
    single file (1-3 row groups = 1-3 tasks at any core count,
    measured 2.5 s -> 0.7 s at sf1 for this regex-bound projection);
    with real multi-split input it is a no-op to delete."""
    d = load(spark, sf_dir, "documents").transform(
        split_recovery(spark, sf_dir, "documents")
    )
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


# ---------------------------------------------------------------------------
# round-2 additions: repetition quality, stratified sampling, packing
# ---------------------------------------------------------------------------

#: Gopher-style repetition thresholds (integer-exact forms of
#: "top bigram > 10% of bigrams" and "duplicate bigrams > 20%")
_TOP_NUM, _TOP_DEN = 1, 10
_DUP_NUM, _DUP_DEN = 1, 5

#: stratified sampling rates (permille) — downsample the
#: over-represented language, keep the rest near-whole
_STRAT_SALT = "strat-v1-"
_STRAT_EN_PERMILLE = 300
_STRAT_REST_PERMILLE = 900

#: sequence packing token budget
_PACK_BUDGET = 2048


@register(
    "q_text_repetition",
    oracle=f"""
    WITH _toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), t -> t <> '')
               AS toks
      FROM documents
    ),
    bi AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1]))
               AS bigram
      FROM _toks WHERE len(toks) >= 2
    ),
    cnt AS (
      SELECT doc_id, bigram, count(*) AS c FROM bi GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT)   AS n_bigrams,
           CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
           CAST(max(c) AS BIGINT)   AS top_count,
           (max(c) * {_TOP_DEN} > sum(c) * {_TOP_NUM})
             OR ((sum(c) - count(*)) * {_DUP_DEN} > sum(c) * {_DUP_NUM})
             AS flag_repetitive
    FROM cnt GROUP BY doc_id
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filter (Rae et al. 2021 §A1.1):
    per-document bigram statistics — total, distinct, and
    most-frequent-bigram count — with a repetition flag when the top
    bigram exceeds 10% of all bigrams or duplicate bigrams exceed 20%.
    Thresholds are evaluated in *integer cross-multiplied* form so the
    flag (and the hash) never touches a float.

    The statistics are per-document local, so the whole operator is one
    Arrow ``mapInPandas`` pass — ZERO shuffle (the exploded
    groupBy(doc_id, bigram) formulation shuffles every bigram and the
    Catalyst higher-order ``transform`` runs interpreted per element —
    measured 8.5 s vs 0.4 s at sf0.1; same finding as the shingle
    profiles). Embarrassingly parallel and linear at 100 TB."""
    from collections import Counter
    import re

    import pandas as pd

    ws = re.compile("[ \t\n\f\r]+")  # RE2 \s, the oracle's class (no \x0b)

    def stats(batches):
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "nb", "nd", "top")}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [t for t in ws.split(text) if t]
                if len(toks) < 2:
                    continue
                cnt = Counter(zip(toks, toks[1:]))
                out["doc_id"].append(doc_id)
                out["nb"].append(len(toks) - 1)
                out["nd"].append(len(cnt))
                out["top"].append(max(cnt.values()))
            nb = pd.Series(out["nb"], dtype="int64")
            nd = pd.Series(out["nd"], dtype="int64")
            top = pd.Series(out["top"], dtype="int64")
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "n_bigrams": nb,
                    "n_distinct_bigrams": nd,
                    "top_count": top,
                    "flag_repetitive": (top * _TOP_DEN > nb * _TOP_NUM)
                    | ((nb - nd) * _DUP_DEN > nb * _DUP_NUM),
                }
            )

    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .mapInPandas(
            stats,
            "doc_id bigint, n_bigrams bigint, n_distinct_bigrams bigint,"
            " top_count bigint, flag_repetitive boolean",
        )
    )


@register(
    "q_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN lang = 'en' THEN {_STRAT_EN_PERMILLE}
                ELSE {_STRAT_REST_PERMILLE} END AS rate_permille
    FROM documents
    WHERE {sql_hash32(f"'{_STRAT_SALT}' || CAST(doc_id AS VARCHAR)")} % 1000
          < CASE WHEN lang = 'en' THEN {_STRAT_EN_PERMILLE}
                 ELSE {_STRAT_REST_PERMILLE} END
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling for mixture rebalancing: keep 30% of the
    over-represented language and 90% of the rest, selecting by a
    salted content-stable hash bucket per document (mod 1000 <
    rate_permille). Like q_sample_split this is a pure stateless
    projection+filter — reproducible under task retries (``rand()`` is
    not), shuffle-free, and composable with the split: the same
    document set is kept on every engine, run, and cluster size. At
    100 TB the rates come from a measured language histogram; the plan
    shape is unchanged."""
    d = load(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", _STRAT_EN_PERMILLE).otherwise(
        _STRAT_REST_PERMILLE
    )
    bucket = (
        hash32(F.concat(F.lit(_STRAT_SALT), F.col("doc_id").cast("string")))
        % 1000
    )
    return d.filter(bucket < rate).select(
        "doc_id", "lang", rate.alias("rate_permille")
    )


@register(
    "q_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '')) AS n_tokens
      FROM documents
    )
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(
             (sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens)
             // {_PACK_BUDGET} AS BIGINT) AS seq_id
    FROM t
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: assign documents (in stable doc_id
    order, per language stream) to fixed token-budget training
    sequences — ``seq_id = exclusive-cumulative-tokens // budget``.
    The contiguous-cumsum formulation makes packing a *window
    function*, not a sequential driver loop: one shuffle on the
    partition key (lang here; shard key at scale), running-sum frame,
    all integer math. At 100 TB the stream key is (shard, file) so
    each window partition is one input shard — parallelism equals
    shard count and no global order is ever materialized."""
    d = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    n_tok = F.size(tokens("text")).cast("bigint")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return d.select(
        "doc_id", "lang", n_tok.alias("n_tokens")
    ).withColumn(
        "seq_id",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / _PACK_BUDGET)
        .cast("bigint"),
    )


#: mixture-temperature exponent: weight ∝ n^(1/2)
_MIX_ALPHA_DEN = 2


@register(
    "q_sample_weights",
    oracle="""
    WITH c AS (
      SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    )
    SELECT source, n_docs,
           sqrt(CAST(n_docs AS DOUBLE))
             / sqrt(CAST(max(n_docs) OVER () AS DOUBLE)) AS rel_weight
    FROM c
    """,
)
def q_sample_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights per source (the α=1/2
    'temperature resampling' scheme multilingual/multi-source training
    mixes use to flatten a skewed corpus): each source's sampling
    weight relative to the dominant source, ``sqrt(n_i)/sqrt(n_max)``.

    Expressed relative-to-max on purpose: it needs only one IEEE sqrt
    and one division per row — deterministic across engines — where a
    normalized form (÷ Σ√n_j) would sum 20 irrational doubles in
    engine-dependent order and flap the hash. The window MAX runs over
    the |sources|-row aggregate (a single tiny partition by
    construction — the fact table is already reduced), so the
    empty-partition window is not a scale hazard."""
    d = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    counts = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    n_max = F.max("n_docs").over(Window.partitionBy())
    return counts.select(
        "source",
        "n_docs",
        (
            F.sqrt(F.col("n_docs").cast("double"))
            / F.sqrt(n_max.cast("double"))
        ).alias("rel_weight"),
    )


@register(
    "q_sample_lengths",
    oracle="""
    SELECT length(bin(n_chars)) - 1 AS log2_bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    WHERE n_chars > 0
    GROUP BY log2_bucket
    """,
)
def q_sample_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram on power-of-two buckets — the
    length-distribution profile used to size sequence-packing bins
    (q_pack_sequences), spot truncation cliffs, and budget tokens per
    source.

    The bucket is ``floor(log2(n_chars))`` computed EXACTLY as
    ``length(bin(n)) - 1`` (binary-representation length) — never
    float ``log2``, whose libm rounding at exact powers of two can
    disagree across engines and mis-bucket boundary documents. 100 TB
    plan: stateless projection + a ~60-group hash aggregate with
    map-side partials; long sums in codegen; zero Python, one
    near-empty exchange."""
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return (
        d.select(
            (F.length(F.bin(F.col("n_chars"))) - 1).alias("log2_bucket"),
            "n_chars",
        )
        .groupBy("log2_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


# ---------------------------------------------------------------------------
# q_sample_exact_k — exact-k uniform sample per stratum
# ---------------------------------------------------------------------------

_EXACT_K = 50
_EXACT_K_SALT = "exactk-v1-"


@register(
    "q_sample_exact_k",
    oracle=f"""
    SELECT doc_id, lang, CAST(rn AS INT) AS rank_in_lang
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('{_EXACT_K_SALT}' || CAST(doc_id AS VARCHAR)),
                        doc_id) AS rn
      FROM documents)
    WHERE rn <= {_EXACT_K}
    """,
)
def q_sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k uniform sample per stratum: rank documents inside each
    language by a salted content-stable hash and keep the first k=50.
    The rate-based sampler (q_sample_stratified) gives *expected*
    counts; training-data recipes often need *exact* per-source
    counts ("take exactly 50k docs of wiki per shard") — ordering by a
    deterministic hash is a uniform draw that is reproducible across
    engines, runs, retries, and cluster sizes (``rand()`` is none of
    those).

    Plan: one shuffle on lang for the ranking window; Spark inserts
    WindowGroupLimit, so each map task forwards only its local top-k
    candidates — the shuffle moves O(k·tasks) rows, not the corpus.
    At 100 TB with few strata the window key is coarse; the fix at
    that scale is a two-level draw (rank within (lang, salt-bucket),
    take k/B per bucket — same plan shape, B× the parallelism), which
    this operator documents as its scale path."""
    w = Window.partitionBy("lang").orderBy(
        F.md5(
            F.concat(F.lit(_EXACT_K_SALT), F.col("doc_id").cast("string"))
        ),
        "doc_id",
    )
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .withColumn("rank_in_lang", F.row_number().over(w))
        .filter(F.col("rank_in_lang") <= _EXACT_K)
    )


# ---------------------------------------------------------------------------
# q_sample_weighted — deterministic weight-proportional priority sampling
# ---------------------------------------------------------------------------

#: sample size for the weighted draw
_WEIGHTED_K = 100


@register(
    "q_sample_weighted",
    oracle=f"""
    SELECT doc_id, lang, n_chars,
           CAST({sql_hash32("'wsamp:' || CAST(doc_id AS VARCHAR)")} + 1
                AS DOUBLE) / n_chars AS priority
    FROM documents
    WHERE n_chars > 0
    ORDER BY priority, doc_id LIMIT {_WEIGHTED_K}
    """,
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sampling without randomness: priority
    sampling (Duffield–Lund–Thorup) with the uniform draw replaced by
    a content-stable hash.  Each document gets priority ``u / w``
    (u = salted 32-bit hash of its id, w = its weight, here
    ``n_chars``); the k smallest priorities are the sample, so heavier
    documents are proportionally more likely to be kept — the standard
    quality-weighted subsampling step of a pretraining mixture, made
    reproducible across retries/partitionings because the "random"
    key is a pure function of the row (same rule as q_sample_split /
    q_sample_stratified — `rand()` is neither).

    Determinism note: the priority is one IEEE division of two exactly
    representable integers — correctly rounded and bit-identical in
    any engine — and the top-k cut breaks ties by doc_id.

    100 TB plan: shuffle-free scoring projection + global top-k via
    sort-limit = TakeOrderedAndProject (every task forwards only its
    local top-k; the driver merges k·tasks rows, never the corpus).
    For k large enough that k·tasks matters, swap the final cut for
    `scale.ranked_by_range`."""
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .filter(F.col("n_chars") > 0)
    )
    u = hash32(F.concat(F.lit("wsamp:"), F.col("doc_id").cast("string")))
    return (
        docs.select(
            "doc_id",
            "lang",
            "n_chars",
            ((u + F.lit(1)).cast("double") / F.col("n_chars")).alias(
                "priority"
            ),
        )
        .orderBy("priority", "doc_id")
        .limit(_WEIGHTED_K)
    )


# ---------------------------------------------------------------------------
# q_dq_entropy — per-group Shannon entropy of a categorical distribution
# ---------------------------------------------------------------------------


@register(
    "q_dq_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS k
      FROM events GROUP BY 1, 2
    ),
    u AS (
      SELECT user_id, CAST(SUM(k) AS BIGINT) AS n,
             SUM(CAST(round(k * log2(k), 6) AS DECIMAL(27,6))) AS s
      FROM c GROUP BY 1
    )
    SELECT user_id, n AS n_events,
           round(log2(n) - CAST(s AS DOUBLE) / n, 6) AS entropy_bits
    FROM u
    """,
)
def q_dq_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution, in bits —
    the mixture-diversity / data-quality metric (a user collapsed onto
    one event type scores 0; uniform over k types scores log2 k). The
    same shape scores language or source diversity per domain in a
    training-data mixture audit.

    Uses the identity H = log2(N) − (Σ k·log2 k)/N so only one float
    term per (group, category) exists; each term is rounded to the
    1e-6 grid and summed as EXACT decimal (the compat convention —
    float Σ would be partition-order-dependent and flap the hash), then
    one IEEE division + subtraction finishes. Two-level hash aggregate,
    partial-agg map-side combine, one shuffle on the group key."""
    e = load(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("k"))
    term = F.round(F.col("k") * F.log2("k"), 6).cast("decimal(27,6)")
    u = c.groupBy("user_id").agg(
        F.sum("k").alias("n"), F.sum(term).alias("s")
    )
    return u.select(
        "user_id",
        F.col("n").alias("n_events"),
        F.round(
            F.log2("n") - F.col("s").cast("double") / F.col("n"), 6
        ).alias("entropy_bits"),
    )


# ---------------------------------------------------------------------------
# q_mixture_report — dataset-card mixture profile per (source, lang)
# ---------------------------------------------------------------------------


@register(
    "q_mixture_report",
    oracle="""
    WITH g AS (
      SELECT source, lang, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY 1, 2
    ),
    t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM g)
    SELECT g.source, g.lang, g.n_docs, g.sum_chars,
           CAST(g.sum_chars AS DOUBLE) / g.n_docs AS mean_chars,
           CAST((g.n_docs * 1000) // t.total AS BIGINT) AS share_permille
    FROM g CROSS JOIN t
    """,
)
def q_mixture_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card mixture report: per (source, language) cell — doc
    count, total/mean characters, and the cell's exact integer-permille
    share of the corpus. The one-pass profile behind mixture rebalancing
    (q_sample_stratified consumes exactly these shares) and every
    dataset datasheet. One hash aggregate over the corpus; the corpus
    total re-aggregates the TINY per-cell table (never a second corpus
    scan) and broadcasts back as a 1-row scalar; shares are integer
    permille (long division — no float ratio in the hash)."""
    d = load(spark, sf_dir, "documents")
    g = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )
    g = g.localCheckpoint()  # reuse: cells feed both the total and the report
    total = g.agg(F.sum("n_docs").alias("total"))
    return g.crossJoin(F.broadcast(total)).select(
        "source",
        "lang",
        "n_docs",
        "sum_chars",
        (F.col("sum_chars").cast("double") / F.col("n_docs")).alias(
            "mean_chars"
        ),
        F.expr("(n_docs * 1000) div total").alias("share_permille"),
    )


# ---------------------------------------------------------------------------
# q_dq_freshness — per-slice freshness lag vs the corpus watermark
# ---------------------------------------------------------------------------


@register(
    "q_dq_freshness",
    oracle="""
    WITH m AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS corpus_max FROM events),
    s AS (
      SELECT event_type, MAX(CAST(ts AS TIMESTAMP)) AS slice_max,
             COUNT(*) AS n_events
      FROM events GROUP BY event_type
    )
    SELECT s.event_type, s.slice_max, s.n_events,
           CAST(epoch_us(m.corpus_max) - epoch_us(s.slice_max) AS BIGINT)
             AS lag_us,
           CAST(epoch_us(m.corpus_max) - epoch_us(s.slice_max) >= 86400000000
                AS INT) AS stale_1d
    FROM s CROSS JOIN m
    """,
)
def q_dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness audit: each slice's (event type's) newest event versus
    the corpus watermark, as an exact microsecond lag plus a 1-day
    staleness flag — the did-a-feed-stop-arriving monitor. Anchoring on
    the corpus max (never wall-clock ``now()``) keeps the query
    deterministic and retry-safe — the same discipline as every
    operator here. Per-slice maxima partial-aggregate map-side; the
    1-row watermark broadcasts."""
    e = load(spark, sf_dir, "events")
    m = e.agg(F.max("ts").alias("corpus_max"))
    s = e.groupBy("event_type").agg(
        F.max("ts").alias("slice_max"), F.count(F.lit(1)).alias("n_events")
    )
    lag = F.unix_micros("corpus_max") - F.unix_micros("slice_max")
    return s.crossJoin(F.broadcast(m)).select(
        "event_type",
        "slice_max",
        "n_events",
        lag.alias("lag_us"),
        (lag >= 86400000000).cast("int").alias("stale_1d"),
    )


# ---------------------------------------------------------------------------
# q_mixture_temperature — temperature-reweighted source sampling (C-150)
# ---------------------------------------------------------------------------

#: sampling budget the reweighted mixture is projected onto
MIXTURE_BUDGET_DOCS = 10_000


@register(
    "q_mixture_temperature",
    oracle=f"""
    WITH g AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY 1
    ),
    t AS (
      SELECT CAST(SUM(sum_chars) AS BIGINT) AS total_chars,
             SUM(sqrt(CAST(sum_chars AS DOUBLE))) AS z
      FROM g
    )
    SELECT g.source, g.n_docs, g.sum_chars,
           round(CAST(g.sum_chars AS DOUBLE) / t.total_chars, 6) AS p_raw,
           round(sqrt(CAST(g.sum_chars AS DOUBLE)) / t.z, 6) AS p_temp,
           CAST(FLOOR(sqrt(CAST(g.sum_chars AS DOUBLE)) / t.z
                      * {MIXTURE_BUDGET_DOCS}) AS BIGINT) AS budget_docs
    FROM g CROSS JOIN t
    """,
)
def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-reweighted source mixture — the pretraining-mixture
    op that flattens the source distribution before sampling: raw
    character shares p_i are re-weighted to p_i^(1/T) / Σ p_j^(1/T)
    with T = 2 (i.e. √p — the multilingual-sampling temperature trick
    of the XLM/mT5 line, public literature), so over-represented
    sources shrink and the long tail is upsampled; the budget column
    projects the reweighted share onto a {MIXTURE_BUDGET_DOCS}-doc
    sampling budget with a deterministic floor.

    Exactness: √(Σchars) is one IEEE sqrt of an exactly-summed BIGINT
    on both engines; shares divide by the once-aggregated
    normalizer and round to 6 decimals (the repo's libm-ulp
    convention); the budget floors AFTER one double multiply —
    identical FP sequence both sides. Plan: one corpus aggregate, the
    per-source table re-aggregates to the 1-row normalizer (never a
    second corpus scan), broadcast back. The consumer is
    q_sample_weighted / q_sample_stratified, whose per-row selection
    hashes ride these budget numbers."""
    d = load(spark, sf_dir, "documents")
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )
    g = g.localCheckpoint()  # feeds both the normalizer and the report
    t = g.agg(
        F.sum("sum_chars").alias("total_chars"),
        F.sum(F.sqrt(F.col("sum_chars").cast("double"))).alias("z"),
    )
    w = F.sqrt(F.col("sum_chars").cast("double")) / F.col("z")
    return g.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "sum_chars",
        F.round(
            F.col("sum_chars").cast("double") / F.col("total_chars"), 6
        ).alias("p_raw"),
        F.round(w, 6).alias("p_temp"),
        F.floor(w * MIXTURE_BUDGET_DOCS).cast("long").alias("budget_docs"),
    )


# ---------------------------------------------------------------------------
# q_quality_cut — per-source quality-quantile pruning (round 4)
# ---------------------------------------------------------------------------


@register(
    "q_quality_cut",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source, n_chars,
             CAST(length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))
                  * 1000 // n_chars AS BIGINT) AS alpha_permille
      FROM documents WHERE n_chars > 0
    ),
    ranked AS (
      SELECT doc_id, source, alpha_permille,
             row_number() OVER (PARTITION BY source
                                ORDER BY alpha_permille DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY source) AS n_src
      FROM scored
    )
    SELECT doc_id, source, alpha_permille
    FROM ranked WHERE rn * 2 <= n_src
    """,
)
def q_quality_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-quantile pruning: keep each source's top
    half of documents by quality score — the stratified quality cut
    every pre-training mixture applies (prune WITHIN each domain, so a
    uniformly-noisy domain isn't wiped out by a global threshold and a
    clean domain isn't kept wholesale). The score is the alphanumeric
    character share in EXACT integer permille (alnum·1000 div n_chars
    — a single regex count, no float), and the cut is decided by
    integer rank arithmetic (rn·2 ≤ n_source with a doc_id tie-break)
    rather than percent_rank's float — no boundary document can flap.

    Plan: one codegen counting projection over the corpus, then a
    window partitioned BY SOURCE — shuffles once on the stratum key,
    never a global sort (the per-source sort is the operator's
    semantics; a pathologically dominant source falls back to the
    ranked_by_range decomposition per stratum, same trade as
    q_rank_global). Round-8 floor audit (VERDICT r7 #2) found two
    fixes: (1) the alnum count moved off ``regexp_replace`` — which is
    ALLOCATION-bound (it materializes a stripped copy of every
    document) and measured flat 1.4 s at sf1 whether run on 1 task or
    32 — onto ``length(text) − length(translate(text, <62 ASCII
    alnum>, ''))``, the allocation-light equivalent (0.29 s warm;
    identical count: translate deletes exactly the chars the oracle's
    regex keeps, and any non-ASCII chars cancel in the subtraction);
    (2) the split-recovery repartition ahead of it is the text.py:553
    fixture trade — the fixture is ONE small row group, so without it
    the scoring scan runs in a single task; at 100 TB the scan has
    natural row-group parallelism and this exchange is the line you
    delete."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .transform(split_recovery(spark, sf_dir, "documents"))
    )
    alnum = (
        "abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    )
    scored = d.select(
        "doc_id",
        "source",
        # the length difference is cast to LONG **before** the ×1000
        # (ADVICE r8): int×int would wrap past ~2.1M alnum chars per
        # document, while the DuckDB oracle computes in BIGINT
        (
            (
                F.length("text")
                - F.length(F.translate("text", alnum, ""))
            ).cast("long")
            * F.lit(1000)
        )
        .alias("_alnum_k"),
        "n_chars",
    ).select(
        "doc_id",
        "source",
        F.expr("_alnum_k div n_chars").cast("long").alias("alpha_permille"),
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("alpha_permille"), F.asc("doc_id")
    )
    ranked = scored.select(
        "doc_id",
        "source",
        "alpha_permille",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("source"))
        .alias("n_src"),
    )
    return ranked.filter(F.col("rn") * 2 <= F.col("n_src")).select(
        "doc_id", "source", "alpha_permille"
    )


# ---------------------------------------------------------------------------
# q_mixture_epochs — token-budget allocation with epoch caps (round 4)
# ---------------------------------------------------------------------------


@register(
    "q_mixture_epochs",
    oracle=f"""
    WITH t AS (
      SELECT source,
             SUM(len({SQL_TOKENS.format(col="text")})) AS tokens
      FROM documents GROUP BY source
    ),
    g AS (
      SELECT SUM(tokens) // 5 AS budget, count(*) AS n_sources FROM t
    )
    SELECT source,
           CAST(tokens AS BIGINT) AS tokens,
           CAST(budget // n_sources AS BIGINT) AS quota,
           CAST(least(budget // n_sources, 4 * tokens) AS BIGINT)
             AS alloc_tokens,
           CAST(least(budget // n_sources, 4 * tokens) * 1000
                // tokens AS BIGINT) AS epochs_permille,
           CAST(greatest(budget // n_sources - 4 * tokens, 0)
                AS BIGINT) AS shortfall
    FROM t CROSS JOIN g
    """,
)
def q_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-aware mixture planning (the Muennighoff et al. 2023
    "Scaling Data-Constrained Language Models" bookkeeping): given a
    training token budget (here 20% of corpus tokens — a deterministic
    scalar) split into equal per-source quotas, how many epochs of
    each source does its quota imply, capped at 4 epochs (the point
    past which repeated data stops helping), and how much quota goes
    UNFILLED for sources too small to repeat into it. epochs_permille
    > 1000 means the source repeats; shortfall > 0 is the gap the
    curator must re-allocate or accept. Exact integer arithmetic
    throughout (truncating division on both engines).

    Plan: one tokenize scan + per-source aggregate (the data-sized
    step), a 1-row global scalar broadcast onto |sources| rows, and a
    pure projection. At 100 TB this is token counting plus a
    broadcast — the planning report is free next to the pipeline it
    plans."""
    d = load(spark, sf_dir, "documents")
    t = d.groupBy("source").agg(
        F.sum(F.size(tokens("text"))).alias("tokens")
    )
    g = t.agg(
        F.expr("sum(tokens) div 5").alias("budget"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return t.crossJoin(F.broadcast(g)).select(
        "source",
        F.col("tokens").cast("long").alias("tokens"),
        F.expr("budget div n_sources").cast("long").alias("quota"),
        F.expr("least(budget div n_sources, 4 * tokens)")
        .cast("long")
        .alias("alloc_tokens"),
        F.expr(
            "least(budget div n_sources, 4 * tokens) * 1000 div tokens"
        )
        .cast("long")
        .alias("epochs_permille"),
        F.expr("greatest(budget div n_sources - 4 * tokens, 0)")
        .cast("long")
        .alias("shortfall"),
    )


# ---------------------------------------------------------------------------
# q_dq_drift — PSI distribution drift between the two halves of the corpus
# ---------------------------------------------------------------------------


@register(
    "q_dq_drift",
    oracle="""
    WITH e2 AS MATERIALIZED (
      SELECT event_type, CAST(ts AS TIMESTAMP)::DATE AS day,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e2),
    e3 AS MATERIALIZED (
      SELECT event_type, cents,
             (date_diff('day', b.d0, e2.day) * 2
              < date_diff('day', b.d0, b.d1) + 1) AS is_ref
      FROM e2 CROSS JOIN b
    ),
    vb AS (
      SELECT min(cents) AS vmin, max(cents) AS vmax FROM e3 WHERE is_ref
    ),
    e4 AS (
      SELECT event_type, is_ref,
             least(9, greatest(0,
               ((cents - vb.vmin) * 10) // (vb.vmax - vb.vmin + 1)))
               AS bin
      FROM e3 CROSS JOIN vb
    ),
    cnt AS (
      SELECT event_type, bin,
             SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS cr,
             SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cc
      FROM e4 GROUP BY 1, 2
    ),
    spine AS (
      SELECT t.event_type, g.bin
      FROM (SELECT DISTINCT event_type FROM cnt) t
      CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) g
    ),
    f AS (
      SELECT spine.event_type, spine.bin,
             coalesce(cnt.cr, 0) AS cr, coalesce(cnt.cc, 0) AS cc
      FROM spine LEFT JOIN cnt
        ON spine.event_type = cnt.event_type AND spine.bin = cnt.bin
    ),
    tot AS (
      SELECT event_type, CAST(SUM(cr) AS BIGINT) AS nr,
             CAST(SUM(cc) AS BIGINT) AS nc
      FROM f GROUP BY 1
    ),
    terms AS (
      SELECT f.event_type, tot.nr, tot.nc,
             CAST(round(
               ((CAST(f.cr + 1 AS DOUBLE) / (tot.nr + 10))
                - (CAST(f.cc + 1 AS DOUBLE) / (tot.nc + 10)))
               * ln((CAST(f.cr + 1 AS DOUBLE) / (tot.nr + 10))
                    / (CAST(f.cc + 1 AS DOUBLE) / (tot.nc + 10))), 6)
               AS DECIMAL(27,6)) AS term
      FROM f JOIN tot USING (event_type)
    )
    SELECT event_type, nr AS n_ref, nc AS n_cur,
           CAST(SUM(term) AS DOUBLE) AS psi,
           (SUM(term) > 0.25) AS drift
    FROM terms GROUP BY 1, 2, 3
    """,
)
def q_dq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index (PSI) drift monitor: per event type,
    does the ``value`` distribution in the LATER half of the corpus
    (by calendar day) drift from the EARLIER half? The standard
    train/serve-skew gate in front of any model or training-data
    pipeline (PSI > 0.25 = act). Values bucket into 10 equal-width
    bins fitted on the reference half in EXACT cents-integer
    arithmetic (bin edges can never flap between engines), bin shares
    are Laplace-smoothed (+1/bin, so empty bins are defined), and
    PSI = Σ (p−q)·ln(p/q) follows the libm convention: each of the 10
    terms is rounded to the 1e-6 grid and summed as exact decimal.

    Plan: two corpus passes (day bounds + reference value bounds, each
    a 1-row broadcast scalar) then ONE map-combined count aggregate
    per (event_type, bin); everything after is |types|×10 rows — the
    bin spine, smoothing, and the PSI fold are spine-sized. At 100 TB
    the only data-sized work is three linear scans (and the first two
    collapse into stored table statistics in a real deployment)."""
    e2 = load(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    b = e2.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    e3 = e2.crossJoin(F.broadcast(b)).select(
        "event_type",
        "cents",
        (
            F.datediff("day", "d0") * 2
            < F.datediff("d1", "d0") + 1
        ).alias("is_ref"),
    )
    vb = e3.filter("is_ref").agg(
        F.min("cents").alias("vmin"), F.max("cents").alias("vmax")
    )
    e4 = e3.crossJoin(F.broadcast(vb)).select(
        "event_type",
        "is_ref",
        F.least(
            F.lit(9),
            F.greatest(
                F.lit(0),
                F.expr("((cents - vmin) * 10) div (vmax - vmin + 1)"),
            ),
        ).alias("bin"),
    )
    cnt = e4.groupBy("event_type", "bin").agg(
        F.sum(F.col("is_ref").cast("long")).alias("cr"),
        F.sum((~F.col("is_ref")).cast("long")).alias("cc"),
    )
    cnt = cnt.localCheckpoint(eager=False)  # spine + totals reuse
    spine = (
        cnt.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bin"),
        )
    )
    f = spine.join(cnt, ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        F.coalesce("cr", F.lit(0)).alias("cr"),
        F.coalesce("cc", F.lit(0)).alias("cc"),
    )
    tot = f.groupBy("event_type").agg(
        F.sum("cr").alias("nr"), F.sum("cc").alias("nc")
    )
    ft = f.join(F.broadcast(tot), "event_type")
    p = (F.col("cr") + 1).cast("double") / (F.col("nr") + 10)
    q = (F.col("cc") + 1).cast("double") / (F.col("nc") + 10)
    term = F.round((p - q) * F.log(p / q), 6).cast("decimal(27,6)")
    return (
        ft.select("event_type", "nr", "nc", term.alias("term"))
        .groupBy("event_type", "nr", "nc")
        .agg(F.sum("term").alias("s"))
        .select(
            "event_type",
            F.col("nr").cast("long").alias("n_ref"),
            F.col("nc").cast("long").alias("n_cur"),
            F.col("s").cast("double").alias("psi"),
            (F.col("s") > 0.25).alias("drift"),
        )
    )


# ---------------------------------------------------------------------------
# q_pipeline_funnel — end-to-end training-mix funnel audit
# ---------------------------------------------------------------------------


@register(
    "q_pipeline_funnel",
    oracle=f"""
    WITH base AS MATERIALIZED (
      SELECT doc_id, source, lang,
             (n_chars >= 100) AS s_len,
             (n_chars >= 100 AND
              length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))
                * 1000 // n_chars >= 820) AS s_qual,
             md5(substr(text, 1, 80)) AS fp,
             ({sql_hash32("'mix:' || CAST(doc_id AS VARCHAR)")} % 2 = 0)
               AS s_coin
      FROM documents WHERE n_chars > 0
    ),
    dd AS (
      SELECT doc_id, TRUE AS keep FROM base WHERE s_qual
      QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
    ),
    flags AS (
      SELECT b.source, b.lang, b.s_len, b.s_qual,
             coalesce(dd.keep, FALSE) AS s_uniq,
             (coalesce(dd.keep, FALSE) AND b.s_coin) AS s_samp
      FROM base b LEFT JOIN dd USING (doc_id)
    )
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_raw,
           CAST(SUM(CASE WHEN s_len THEN 1 ELSE 0 END) AS BIGINT)
             AS n_len,
           CAST(SUM(CASE WHEN s_qual THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quality,
           CAST(SUM(CASE WHEN s_uniq THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           CAST(SUM(CASE WHEN s_samp THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sampled,
           CAST(SUM(CASE WHEN s_samp THEN 1 ELSE 0 END) * 1000
                // count(*) AS BIGINT) AS retention_permille
    FROM flags GROUP BY 1, 2
    """,
)
def q_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline as ONE declarative plan, with
    the per-stage funnel audit every dataset card publishes: per
    (source, language) cell, how many documents survive (1) the length
    floor (n_chars ≥ 100), (2) the quality gate (alphanumeric share ≥
    820‰, exact integer — the q_quality_cut score), (3) prefix-
    fingerprint dedup (md5 of the first 80 chars, canonical keeper =
    smallest doc_id — the cheap boilerplate/near-dup catcher in front
    of MinHash), and (4) a deterministic 50% hash sample (the
    md5-coin, reproducible across engines and retries) — plus the
    end-to-end retention in integer permille. The composition is the
    point: filters, a dedup window, a hash sample, and the audit
    aggregate fuse into one job, no intermediate materialization.

    Plan: one codegen projection computes every flag; the dedup stage
    is one window PARTITIONED BY fingerprint (many tiny groups —
    parallel, the opposite of a global sort) over the quality
    survivors only; one broadcast-scale join carries the keeper flag
    back; ONE map-combined aggregate emits the |sources|×|langs|
    funnel. Two corpus-linear shuffles total (fingerprint, doc_id
    join) — at 100 TB both key on high-cardinality columns with no
    skew (fingerprints are hashes; doc ids are unique). r10 floor
    audit — the two q_quality_cut r8 lessons this query never got:
    the alnum share moved off the ALLOCATION-bound ``regexp_replace``
    onto ``length − length(translate(...))`` (identical count — the
    translate deletes exactly the chars the oracle's regex keeps and
    non-ASCII cancels in the subtraction — and the difference is cast
    LONG before the ×1000, closing the latent int32 wrap past ~2.1M
    alnum chars/doc), and the flag projection is preceded by the
    text.py:553 split-recovery repartition (the fixture is ONE row
    group, so the md5+translate pass otherwise runs single-task; at
    100 TB the scan has natural split parallelism and the exchange is
    the line you delete)."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .transform(split_recovery(spark, sf_dir, "documents"))
    )
    alnum = (
        "abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    )
    ap = F.expr(
        f"CAST(length(text) - length(translate(text, '{alnum}', ''))"
        " AS BIGINT) * 1000 div n_chars"
    )
    base = d.select(
        "doc_id",
        "source",
        "lang",
        (F.col("n_chars") >= 100).alias("s_len"),
        ((F.col("n_chars") >= 100) & (ap >= 820)).alias("s_qual"),
        F.md5(F.substring("text", 1, 80)).alias("fp"),
        (
            F.pmod(
                hash32(
                    F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))
                ),
                F.lit(2),
            )
            == 0
        ).alias("s_coin"),
    ).localCheckpoint(eager=False)  # dedup subset + final agg reuse
    w = Window.partitionBy("fp").orderBy("doc_id")
    dd = (
        base.filter("s_qual")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.lit(True).alias("keep"))
    )
    flags = base.join(dd, "doc_id", "left").select(
        "source",
        "lang",
        "s_len",
        "s_qual",
        F.coalesce("keep", F.lit(False)).alias("s_uniq"),
        (F.coalesce("keep", F.lit(False)) & F.col("s_coin")).alias(
            "s_samp"
        ),
    )
    return flags.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_raw"),
        F.sum(F.col("s_len").cast("long")).cast("long").alias("n_len"),
        F.sum(F.col("s_qual").cast("long"))
        .cast("long")
        .alias("n_quality"),
        F.sum(F.col("s_uniq").cast("long"))
        .cast("long")
        .alias("n_unique"),
        F.sum(F.col("s_samp").cast("long"))
        .cast("long")
        .alias("n_sampled"),
        F.expr(
            "CAST(sum(CAST(s_samp AS BIGINT)) * 1000"
            " div count(*) AS BIGINT)"
        ).alias("retention_permille"),
    )


# ---------------------------------------------------------------------------
# q_sample_shuffle — reproducible corpus shuffle + shard assignment (round 5)
# ---------------------------------------------------------------------------

_SHUFFLE_SALT = ":shuffle-v1"
_SHUFFLE_SHARDS = 8


@register(
    "q_sample_shuffle",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR) || '{_SHUFFLE_SALT}') AS h
      FROM documents
    ),
    sh AS (
      SELECT doc_id, h,
             CAST(('0x' || substr(h, 1, 8)) AS BIGINT)
               % {_SHUFFLE_SHARDS} AS shard
      FROM s
    )
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
                AS BIGINT) AS pos
    FROM sh
    """,
)
def q_sample_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible corpus shuffle for training: every document gets a
    shard (0..7) and a position within its shard, both derived from
    a salted content-stable md5 — the global data ordering a training
    job consumes. ``rand()``-shuffling silently breaks reproducibility
    under task retries and cluster resizes; the hash order is the same
    on every run, engine, and topology (the q_sample_split doctrine,
    extended from membership to ORDER), and bumping the salt is a
    fresh epoch-level reshuffle with zero coordination.

    Scale shape: shard is a stateless projection; the within-shard
    position comes from ONE `scale.ranked_by_range` global rank over
    the total order (shard, h, doc_id) — range partitioning, never a
    per-shard window whose 8-partition partitionBy would funnel
    corpus/8 rows through single tasks — rebased per shard by a
    broadcast join against the 8-row shard-start offsets. Two linear
    shuffles total at any corpus size."""
    from streamclient_spark.scale import ranked_by_range

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(_SHUFFLE_SALT))
        ).alias("h"),
    )
    d = d.withColumn(
        "shard",
        F.conv(F.substring("h", 1, 8), 16, 10).cast("long")
        % _SHUFFLE_SHARDS,
    )
    ranked = ranked_by_range(d, ["shard", "h", "doc_id"], rank_col="grk")
    offsets = ranked.groupBy(F.col("shard").alias("shard0")).agg(
        F.min("grk").alias("r0")
    )
    return (
        ranked.join(
            F.broadcast(offsets), F.col("shard") == F.col("shard0")
        )
        .select(
            "doc_id",
            "shard",
            (F.col("grk") - F.col("r0") + 1).cast("long").alias("pos"),
        )
    )


# ---------------------------------------------------------------------------
# q_feature_pit — point-in-time feature backfill (round 6)
# ---------------------------------------------------------------------------

#: trailing lookback window in days (strictly BEFORE the observation day)
_PIT_LOOKBACK = 7


@register(
    "q_feature_pit",
    oracle=f"""
    WITH evd AS (
      SELECT user_id,
             CAST(date_diff('day', DATE '1970-01-01',
                  CAST(ts AS TIMESTAMP)::DATE) AS BIGINT) AS d,
             count(*) AS n,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT user_id, d AS day_num,
           CAST(n AS BIGINT) AS n_today,
           CAST(coalesce(SUM(n) OVER w, 0) AS BIGINT) AS n_ev_7d,
           CAST(coalesce(SUM(v) OVER w, 0) AS BIGINT) AS val_7d_cents,
           CAST(count(*) OVER w AS BIGINT) AS active_days_7d,
           CAST(coalesce(d - max(d) OVER w, -1) AS BIGINT)
             AS days_since_last
    FROM evd
    WINDOW w AS (PARTITION BY user_id ORDER BY d
                 RANGE BETWEEN {_PIT_LOOKBACK} PRECEDING
                 AND 1 PRECEDING)
    """,
)
def q_feature_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature backfill — the leak-safe feature table a
    training pipeline materializes before fitting anything: for every
    (entity, observation day), trailing-window features computed from
    STRICTLY EARLIER activity only (events of the observation day
    itself are the label side, never the feature side — the classic
    time-travel/label-leakage rule of feature stores). Features per
    (user, day): event count and exact cent-value over the trailing
    {_PIT_LOOKBACK} days, active-day count, and recency (days since
    last activity, -1 for a cold entity).

    Plan: ONE fact-scale exchange — events repartitioned by user feed
    the (user, day) daily aggregate AND the per-user RANGE frame
    exchange-free (hash(user) satisfies both the grouping and the
    window clustering; the within-partition day sort is bounded by
    each user's active-day count, never corpus-wide). Unkeyed rows
    (NULL user/ts) are excluded by contract on BOTH engines — a
    feature table without an entity key or a time axis is
    meaningless. At 100 TB this is the canonical backfill shape:
    entity-hash partitioning, per-entity time sort, zero joins."""
    par = spark.sparkContext.defaultParallelism
    evd = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id",
            F.expr(
                "CAST(datediff(to_date(ts), DATE '1970-01-01') AS BIGINT)"
            ).alias("d"),
            F.round(F.col("value") * 100).cast("bigint").alias("vc"),
        )
        .repartition(par, "user_id")
        .groupBy("user_id", "d")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("vc").alias("v"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rangeBetween(-_PIT_LOOKBACK, -1)
    )
    return evd.select(
        "user_id",
        F.col("d").alias("day_num"),
        F.col("n").cast("long").alias("n_today"),
        F.coalesce(F.sum("n").over(w), F.lit(0))
        .cast("long")
        .alias("n_ev_7d"),
        F.coalesce(F.sum("v").over(w), F.lit(0))
        .cast("long")
        .alias("val_7d_cents"),
        F.count(F.lit(1)).over(w).cast("long").alias("active_days_7d"),
        F.coalesce(F.col("d") - F.max("d").over(w), F.lit(-1))
        .cast("long")
        .alias("days_since_last"),
    )


# ---------------------------------------------------------------------------
# q_sample_bootstrap — deterministic half-sample bootstrap (round 6)
# ---------------------------------------------------------------------------

#: bootstrap replicates — one per bit of the 32-bit row hash
_BOOT_B = 32


@register(
    "q_sample_bootstrap",
    oracle=f"""
    WITH m AS (
      SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                  AS BIGINT) AS mask,
             CAST(round(o_totalprice * 100) AS BIGINT) AS pc
      FROM orders
    ),
    r AS (
      SELECT b,
             CAST(SUM((mask >> CAST(b AS INTEGER)) & 1) AS BIGINT) AS n,
             CAST(SUM(((mask >> CAST(b AS INTEGER)) & 1) * pc) AS BIGINT)
               AS s
      FROM m, unnest(range(0, {_BOOT_B})) AS t(b)
      GROUP BY b
    )
    SELECT CAST(b AS BIGINT) AS replicate,
           n AS n_rows,
           s AS sum_cents,
           round(CAST(s AS DOUBLE) / (n * 100), 6) AS mean_price
    FROM r
    """,
)
def q_sample_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic half-sample bootstrap of the order-value mean —
    the uncertainty estimate a pipeline attaches to any corpus
    statistic WITHOUT a second pass or an RNG: replicate ``b``
    includes a row iff bit ``b`` of its content-stable 32-bit row
    hash is set (each replicate is an independent ~half-sample;
    the spread of the {_BOOT_B} replicate means estimates the
    sampling error of the full-corpus mean). ``rand()`` bootstraps
    break under task retries; the hash form is reproducible across
    runs, engines, and topologies (the q_sample_split doctrine,
    extended from membership to REPLICATION).

    Plan: one scan, one map-side-combined global aggregate producing
    all 2×_BOOT_B partial sums at once (each row updates
    {_BOOT_B} accumulator pairs in-register — no row explosion, no
    shuffle beyond {_BOOT_B} pairs of longs per task), then a 1-row
    explode to long form. At 100 TB the entire exchange is
    |tasks| × {_BOOT_B} × 16 bytes.

    r11 (the q_dq_completeness lesson, guide §7.3): the 64 aggregate
    expressions + 32 result structs cost ~2.5 s of driver-side Py4J
    plan construction — more than the query executes in. The SAME
    plan as one ``spark.sql`` string parses JVM-side in ~0.1 s;
    execution and results unchanged (oracle-verified)."""
    from streamclient_spark.sqlapi import register_views

    register_views(spark, sf_dir)
    aggs = ", ".join(
        f"sum(shiftright(mask, {b}) & 1) AS n{b}, "
        f"sum((shiftright(mask, {b}) & 1) * pc) AS s{b}"
        for b in range(_BOOT_B)
    )
    structs = ", ".join(
        f"named_struct('replicate', cast({b} as bigint), "
        f"'n_rows', cast(n{b} as bigint), "
        f"'sum_cents', cast(s{b} as bigint))"
        for b in range(_BOOT_B)
    )
    return spark.sql(
        "SELECT replicate, n_rows, sum_cents, "
        "round(cast(sum_cents as double) / (n_rows * 100), 6) AS mean_price "
        f"FROM (SELECT inline(array({structs})) FROM ("
        f"SELECT {aggs} FROM ("
        "SELECT cast(conv(substring(md5(cast(o_orderkey as string)), 1, 8),"
        " 16, 10) as long) AS mask, "
        "cast(round(o_totalprice * 100) as bigint) AS pc FROM orders)))"
    )


# ---------------------------------------------------------------------------
# q_text_template_detection — templated-document share (round 6)
# ---------------------------------------------------------------------------

#: docs on this id rule get deterministic template text planted (the
#: q_text_scrub doctrine: the fixture's word soup has no organic
#: templates, so the op plants what it must then find — identically on
#: both engines)
_TEMPLATE_MOD = 11
#: a skeleton shared by at least this many docs marks them templated
_TEMPLATE_MIN_DF = 5


@register(
    "q_text_template_detection",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % {_TEMPLATE_MOD} = 0 THEN
               'Invoice ' || CAST(doc_id AS VARCHAR) || ' for order '
               || CAST(doc_id * 7 % 9973 AS VARCHAR) || ' total '
               || CAST(doc_id * 13 % 99991 AS VARCHAR)
               || ' thank you for your purchase'
             ELSE text END AS text
      FROM documents
    ),
    sk AS (
      SELECT doc_id, source,
             md5(regexp_replace(lower(text), '[0-9]+', '#', 'g')) AS h
      FROM planted
    ),
    marked AS (
      SELECT source,
             (count(*) OVER (PARTITION BY h)) >= {_TEMPLATE_MIN_DF}
               AS is_templated
      FROM sk
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN is_templated THEN 1 ELSE 0 END) AS BIGINT)
             AS n_templated,
           CAST(SUM(CASE WHEN is_templated THEN 1 ELSE 0 END) * 1000
                // count(*) AS BIGINT) AS templated_permille
    FROM marked GROUP BY source
    """,
)
def q_text_template_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Templated-document share per source — the boilerplate-page
    detector (RefinedWeb/CCNet drop templated pages before training:
    invoices, listings, auto-generated forms differ only in their
    numbers): normalize each document to a digit-collapsed lowercase
    skeleton, and mark documents whose skeleton is shared by ≥
    {_TEMPLATE_MIN_DF} docs. The fixture's word soup has no organic
    templates, so the op PLANTS deterministic invoice text on a
    doc_id rule — identically on both engines — and must find exactly
    those (the q_text_scrub doctrine).

    Plan: one codegen projection (concat/lower/regexp/md5 — no
    Python), one skeleton-hash exchange for the document-frequency
    window, one |sources| rollup. Shuffles carry 16-byte digests,
    never text. At 100 TB the skeleton-df table IS the template
    catalog a pipeline would persist."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % _TEMPLATE_MOD == 0,
            F.concat(
                F.lit("Invoice "),
                F.col("doc_id").cast("string"),
                F.lit(" for order "),
                (F.col("doc_id") * 7 % 9973).cast("string"),
                F.lit(" total "),
                (F.col("doc_id") * 13 % 99991).cast("string"),
                F.lit(" thank you for your purchase"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    sk = d.select(
        "source",
        F.md5(
            F.regexp_replace(F.lower(F.col("text")), "[0-9]+", "#")
        ).alias("h"),
    )
    marked = sk.select(
        "source",
        (
            F.count(F.lit(1)).over(Window.partitionBy("h"))
            >= _TEMPLATE_MIN_DF
        ).alias("is_templated"),
    )
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("is_templated").cast("long"))
        .cast("long")
        .alias("n_templated"),
        F.expr(
            "CAST(sum(CAST(is_templated AS LONG)) * 1000 div count(1) "
            "AS BIGINT)"
        ).alias("templated_permille"),
    )
