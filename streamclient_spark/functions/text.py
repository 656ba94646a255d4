"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2B B-L4).

Everything here is built from JVM-side codegen'd builtins (``split``,
``filter``, ``transform``, ``aggregate``, ``md5`` ...) — no Python UDF on
any hot path, so the operators scale linearly with input and stay inside
whole-stage codegen.

Scale notes (100 TB): each query is a single scan of ``documents`` plus
at most one shuffle (the explode→groupBy in tf-idf). Tokenization and
per-document feature extraction are embarrassingly parallel projections;
tf-idf's document-frequency aggregate is a classic partial+final hash
aggregate on the token key (low cardinality relative to input, so the
shuffle carries only |vocab|×|tasks| rows).

Cross-engine conventions: tokenization is ``\\s+`` regex split with empty
tokens filtered (identical in Spark ``split``/``filter`` and DuckDB
``string_split_regex``/``list_filter``); hashes go through ``md5`` (the
one cryptographic hash both engines implement identically); floating
ratios are single IEEE divisions of exact integers (deterministic in
both engines); ``ln``-based scores are rounded to 6 decimals.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamclient_spark.plans.registry import register
from streamclient_spark.tables import load, split_recovery

# ---------------------------------------------------------------------------
# shared token helpers (engine API surface, reused by dedup.py)
# ---------------------------------------------------------------------------


#: THE whitespace definition of the engine, spelled as an explicit
#: class: RE2's ``\s`` — exactly what the committed DuckDB oracles
#: match. Java's and Python-ASCII's ``\s`` additionally match ``\x0b``
#: (vertical tab), so a bare ``\s`` on the Spark/pandas side is a
#: latent hash mismatch on \x0b-bearing text (ADVICE r10; pinned by
#: the vertical-tab doc in tests/test_null_robustness.py). Every
#: Spark split, pandas tokenizer, and translate set derives from this
#: class; oracle SQL may keep ``'\s+'`` because RE2 ``\s`` IS this
#: class.
WS_CLASS = " \t\n\f\r"
WS_PATTERN = r"[ \t\n\f\r]+"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization with empty-token filtering.

    ``split`` on :data:`WS_PATTERN` leaves a leading "" for leading
    whitespace and a trailing "" for trailing whitespace; filtering is
    what makes the token list identical to DuckDB's
    ``string_split_regex`` + filter.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, WS_PATTERN), lambda t: t != "")


SQL_TOKENS = r"list_filter(string_split_regex({col}, '\s+'), t -> t <> '')"


def shingles(toks: Column, k: int = 5) -> Column:
    """Distinct k-gram word shingles from a token array.

    Built with ``transform`` over an index ``sequence`` — stays inside
    codegen, no explode needed until the caller wants one row per
    shingle. Documents shorter than ``k`` tokens yield a single shingle
    (the whole document) so they still participate in dedup.
    """
    n = F.size(toks)
    return F.array_distinct(
        F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
            ),
        ).otherwise(F.array(F.array_join(toks, " ")))
    )


def sql_shingles(toks_expr: str, k: int = 5) -> str:
    """DuckDB twin of :func:`shingles` (1-based list slicing)."""
    return (
        f"(CASE WHEN len({toks_expr}) >= {k} THEN "
        f"list_distinct([array_to_string(({toks_expr})[i+1:i+{k}], ' ') "
        f"for i in range(0, len({toks_expr}) - {k} + 1)]) "
        f"ELSE [array_to_string({toks_expr}, ' ')] END)"
    )


# Language marker stopwords for the n-gram/stopword language-ID
# heuristic. The fixture text is synthetic word soup, so accuracy on it
# is meaningless — what the oracle checks is that the *heuristic itself*
# is computed identically by both engines.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "fr": ("le", "la", "de", "et", "est"),
    "es": ("el", "la", "de", "y", "es"),
    "de": ("der", "die", "das", "und", "ist"),
    "zh": ("de5", "shi4", "le5", "he2", "zai4"),
}

STOPWORDS = tuple(sorted({w for ws in LANG_MARKERS.values() for w in ws}))


# ---------------------------------------------------------------------------
# q_text_tokens — tokenization + counting (B-L4)
# ---------------------------------------------------------------------------


@register(
    "q_text_tokens",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, n_chars, {SQL_TOKENS.format(col="text")} AS toks
      FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           n_chars,
           len(list_distinct(toks)) AS n_unique,
           CAST(n_chars AS DOUBLE) / len(toks) AS chars_per_token,
           len(list_filter(toks, t -> length(t) > 4)) AS n_long_tokens
    FROM t
    """,
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-L4: token counting — whitespace tokenizer, per-document token /
    unique-token / long-token counts and chars-per-token ratio. Pure
    projection (no shuffle); the ratio is one IEEE division of two
    exact ints, deterministic across engines."""
    d = load(spark, sf_dir, "documents")
    toks = tokens("text")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        "n_chars",
        F.size(F.array_distinct(toks)).alias("n_unique"),
        (F.col("n_chars").cast("double") / F.size(toks)).alias("chars_per_token"),
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias("n_long_tokens"),
    )


# ---------------------------------------------------------------------------
# q_text_bpe — BPE-style pretokenizer counting (B-L4)
# ---------------------------------------------------------------------------

# GPT-2-family pretokenizer shape, restricted to the regex subset RE2
# (DuckDB) and java.util.regex (Spark) implement identically: letter
# runs, digit runs, and punctuation runs as separate tokens. The
# whitespace exclusion is the explicit WS_CLASS, not `\s` — a bare
# `\s` means different sets to the two engines (\x0b), and this
# pattern is shared verbatim by both sides.
BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\f\r]+"


@register(
    "q_text_bpe",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             {SQL_TOKENS.format(col="text")} AS ws_toks,
             regexp_extract_all(text, '{BPE_PATTERN}') AS bpe_toks
      FROM documents
    )
    SELECT doc_id,
           len(ws_toks) AS n_ws_tokens,
           len(bpe_toks) AS n_bpe_tokens,
           CAST(len(bpe_toks) AS DOUBLE) / len(ws_toks) AS expansion,
           len(list_distinct(bpe_toks)) AS n_bpe_unique
    FROM t
    """,
)
def q_text_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-L4: token counting with a BPE-style pretokenizer regex (letter
    / digit / punctuation runs) next to the whitespace count — the
    token-budget estimator of a pretraining pipeline. Pure projection;
    the regex subset is chosen to behave identically under RE2 and Java
    regex. Split-recovered (near-unsplittable fixture file; the BPE
    regex is the CPU)."""
    d = load(spark, sf_dir, "documents").transform(
        split_recovery(spark, sf_dir, "documents")
    )
    ws = tokens("text")
    bpe = F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)
    return d.select(
        "doc_id",
        F.size(ws).alias("n_ws_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
        (F.size(bpe).cast("double") / F.size(ws)).alias("expansion"),
        F.size(F.array_distinct(bpe)).alias("n_bpe_unique"),
    )


# ---------------------------------------------------------------------------
# q_text_quality — quality scoring (B-L4)
# ---------------------------------------------------------------------------

_SW_LIST_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


@register(
    "q_text_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, text, {SQL_TOKENS.format(col="text")} AS toks
      FROM documents
    )
    SELECT doc_id, lang,
           len(toks) AS n_tokens,
           CAST(len(list_filter(toks, w -> list_contains({_SW_LIST_SQL}, w)))
                AS DOUBLE) / len(toks) AS stopword_ratio,
           CAST(length(text) - length(regexp_replace(text, '[^a-z]', '', 'g'))
                AS DOUBLE) / length(text) AS non_alpha_ratio,
           CASE WHEN len(toks) BETWEEN 10 AND 1000
                 AND CAST(len(list_filter(toks, w ->
                       list_contains({_SW_LIST_SQL}, w))) AS DOUBLE)
                     / len(toks) >= 0.05
                THEN 'keep' ELSE 'drop' END AS verdict
    FROM t
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-L4: quality scoring — length bounds, stopword ratio, and
    non-alphabetic character ratio, combined into a keep/drop verdict
    (the Gopher-rules shape every pretraining pipeline applies). One
    pass; ratios are single IEEE divisions. Split-recovered
    (near-unsplittable fixture file)."""
    d = load(spark, sf_dir, "documents").transform(
        split_recovery(spark, sf_dir, "documents")
    )
    toks = tokens("text")
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_tok = F.size(toks)
    sw_ratio = (
        F.size(F.filter(toks, lambda w: F.array_contains(sw, w))).cast("double")
        / n_tok
    )
    non_alpha = (
        F.length("text") - F.length(F.regexp_replace("text", "[^a-z]", ""))
    ).cast("double") / F.length("text")
    return d.select(
        "doc_id",
        "lang",
        n_tok.alias("n_tokens"),
        sw_ratio.alias("stopword_ratio"),
        non_alpha.alias("non_alpha_ratio"),
        F.when(n_tok.between(10, 1000) & (sw_ratio >= 0.05), "keep")
        .otherwise("drop")
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# q_text_langid — language-ID heuristic (B-L4)
# ---------------------------------------------------------------------------


def _lang_hits_sql(lang: str) -> str:
    markers = "[" + ", ".join(f"'{w}'" for w in LANG_MARKERS[lang]) + "]"
    return f"len(list_filter(toks, w -> list_contains({markers}, w)))"


@register(
    "q_text_langid",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang AS labeled_lang,
             {SQL_TOKENS.format(col="text")} AS toks
      FROM documents
    ), h AS (
      SELECT doc_id, labeled_lang,
             {_lang_hits_sql("en")} AS en_hits,
             {_lang_hits_sql("fr")} AS fr_hits,
             {_lang_hits_sql("es")} AS es_hits,
             {_lang_hits_sql("de")} AS de_hits,
             {_lang_hits_sql("zh")} AS zh_hits
      FROM t
    )
    SELECT doc_id, labeled_lang,
           CASE
             WHEN en_hits >= fr_hits AND en_hits >= es_hits
              AND en_hits >= de_hits AND en_hits >= zh_hits THEN 'en'
             WHEN fr_hits >= es_hits AND fr_hits >= de_hits
              AND fr_hits >= zh_hits THEN 'fr'
             WHEN es_hits >= de_hits AND es_hits >= zh_hits THEN 'es'
             WHEN de_hits >= zh_hits THEN 'de'
             ELSE 'zh'
           END AS detected_lang,
           en_hits + fr_hits + es_hits + de_hits + zh_hits AS marker_hits
    FROM h
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-L4: language identification via marker-stopword counting with a
    fixed argmax tie order (en > fr > es > de > zh). The fixture text is
    synthetic, so the *label* column is not recoverable — the oracle
    checks heuristic parity, not accuracy. Pure projection.

    The token array is MATERIALIZED once (``_toks`` column) before the
    five marker counts: inlining the ``tokens()`` expression into each
    count re-runs the split per language — 5× the tokenization work in
    interpreted higher-order-function space. Split recovery as in the
    other document ops (near-unsplittable fixture file)."""
    d = load(spark, sf_dir, "documents").transform(
        split_recovery(spark, sf_dir, "documents")
    )

    def hits(lang: str) -> Column:
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        return F.size(
            F.filter(
                F.col("_toks"), lambda w: F.array_contains(markers, w)
            )
        )

    h = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        tokens("text").alias("_toks"),
    ).select(
        "doc_id",
        "labeled_lang",
        hits("en").alias("en_hits"),
        hits("fr").alias("fr_hits"),
        hits("es").alias("es_hits"),
        hits("de").alias("de_hits"),
        hits("zh").alias("zh_hits"),
    )
    c = F.col
    detected = (
        F.when(
            (c("en_hits") >= c("fr_hits"))
            & (c("en_hits") >= c("es_hits"))
            & (c("en_hits") >= c("de_hits"))
            & (c("en_hits") >= c("zh_hits")),
            "en",
        )
        .when(
            (c("fr_hits") >= c("es_hits"))
            & (c("fr_hits") >= c("de_hits"))
            & (c("fr_hits") >= c("zh_hits")),
            "fr",
        )
        .when((c("es_hits") >= c("de_hits")) & (c("es_hits") >= c("zh_hits")), "es")
        .when(c("de_hits") >= c("zh_hits"), "de")
        .otherwise("zh")
    )
    total = (
        c("en_hits") + c("fr_hits") + c("es_hits") + c("de_hits") + c("zh_hits")
    )
    return h.select(
        "doc_id",
        "labeled_lang",
        detected.alias("detected_lang"),
        total.alias("marker_hits"),
    )


# ---------------------------------------------------------------------------
# q_text_tfidf — explode → two-level aggregation (B-L4)
# ---------------------------------------------------------------------------


def _tf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared term-frequency posting table ``(doc_id, token, tf)`` —
    the one tokenize+explode+count build behind both q_text_tfidf and
    q_text_keywords, keyed in cacheutil so the second consumer reuses
    the first's cache (the same cross-query-index pattern as the
    co-purchase pair table: corpus-proportional but far smaller than
    the raw text, and the in-session analog of materializing the
    inverted index a production pipeline would write to storage).

    Partitioning is pinned by hashing doc_id BEFORE the tokenize
    (split recovery for the near-unsplittable fixture file, and AQE
    never coalesces a user-pinned number — without the pin it folds
    the tf aggregate's modest shuffle to ONE partition and every
    cached-table consumer runs single-task). doc_id hash partitioning
    satisfies the (doc_id, token) grouping, so the tf aggregate needs
    no second exchange, and per-doc consumers (q_text_keywords'
    top-3 aggregate) group with no exchange at all."""
    from streamclient_spark.cacheutil import managed_persist

    d = load(spark, sf_dir, "documents")
    tok = d.repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).select("doc_id", F.explode(tokens("text")).alias("token"))
    return managed_persist(
        tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf")),
        key=f"texttf:{sf_dir}",
    )


@register(
    "q_text_tfidf",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({SQL_TOKENS.format(col="text")}) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
    ), df AS (
      SELECT token, count(*) AS df FROM tf GROUP BY token
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    )
    SELECT tf.doc_id, tf.token, tf.tf, df.df,
           round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
    FROM tf JOIN df USING (token) CROSS JOIN n
    WHERE tf.tf >= 3
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-L4: tf-idf — explode tokens, term frequency per (doc, token),
    document frequency per token, idf join back. Two hash aggregates and
    one join, all keyed on the token; the df side is tiny (|vocab|) so
    Spark broadcasts it after AQE sees the size. ``ln`` is rounded to 6
    decimals on both engines (libm vs Java Math.log last-ulp drift)."""
    from streamclient_spark.cacheutil import release_managed

    release_managed()
    d = load(spark, sf_dir, "documents")
    # corpus size as a 1-row aggregate cross-joined in (broadcast NL join
    # of a single row) — keeps the whole plan lazy/distributed instead of
    # collecting a count at plan-build time.
    n = d.agg(F.count("*").cast("double").alias("n_docs"))
    tf = _tf_table(spark, sf_dir)
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    # the tf >= 3 output filter runs BEFORE the idf join: df must see
    # every (doc, token) row, but the join doesn't — filtering first
    # cuts the join's probe side ~10× (most tf values are 1)
    return (
        tf.filter(F.col("tf") >= 3)
        .join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )


# ---------------------------------------------------------------------------
# q_text_fingerprint — content hashing (B-L4)
# ---------------------------------------------------------------------------


@register(
    "q_text_fingerprint",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {SQL_TOKENS.format(col="text")} AS toks
      FROM documents
    )
    SELECT doc_id,
           md5(text) AS content_md5,
           md5(array_to_string(list_sort({sql_shingles("toks")}), '|'))
             AS shingle_md5,
           list_min([md5(s) for s in {sql_shingles("toks")}]) AS min_shingle_md5
    FROM t
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-L4: document fingerprinting — whole-content md5, a canonical
    shingle-set fingerprint, and the min shingle hash (a 1-perm minhash,
    the building block :mod:`streamclient_spark.functions.dedup` expands
    into full MinHash). Pure projection, no shuffle.

    Runs as one Arrow ``mapInPandas`` projection: the shingle pipeline
    is builtin-expressible, but Spark higher-order functions are
    interpreted per element (outside whole-stage codegen), and the
    Catalyst formulation measured 2.8 s at sf0.1 vs ~0.7 s for this
    pass. Hash math is identical across hashlib / Spark / DuckDB md5;
    the shingle fingerprint is canonical because the distinct shingles
    are sorted before joining (distinct-set order is engine-specific),
    and the min shingle hash is a lexicographic min over hex digests in
    all three engines."""
    import hashlib
    import re

    ws = re.compile("[ \t\n\f\r]+")  # RE2 \s, the oracle's class (no \x0b)

    def fingerprints(batches):
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [t for t in ws.split(text) if t]
                if len(toks) >= 5:
                    sh = {" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)}
                else:
                    sh = {" ".join(toks)}
                digests = [hashlib.md5(s.encode()).hexdigest() for s in sh]
                out.append(
                    (
                        doc_id,
                        hashlib.md5(text.encode()).hexdigest(),
                        hashlib.md5("|".join(sorted(sh)).encode()).hexdigest(),
                        min(digests),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "content_md5",
                    "shingle_md5",
                    "min_shingle_md5",
                ],
            )

    # split recovery — same rationale as the dedup profile pass: the
    # near-unsplittable fixture file caps this CPU-bound pass at 1-3
    # tasks (measured 3.7 s -> 0.9 s at sf1)
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .transform(split_recovery(spark, sf_dir, "documents"))
        .mapInPandas(
            fingerprints,
            "doc_id bigint, content_md5 string, "
            "shingle_md5 string, min_shingle_md5 string",
        )
    )


@register(
    "q_text_ngram_top",
    oracle=f"""
    SELECT lang, bigram, n_docs_bigram AS n
    FROM (
      SELECT lang, bigram, COUNT(*) AS n_docs_bigram,
             row_number() OVER (PARTITION BY lang
                                ORDER BY COUNT(*) DESC, bigram) AS rk
      FROM (
        SELECT lang,
               unnest(CASE WHEN len(toks) >= 2
                      THEN list_transform(range(1, len(toks)),
                                          i -> toks[i] || ' ' || toks[i+1])
                      ELSE [] END) AS bigram
        FROM (SELECT lang, {SQL_TOKENS.format(col="text")} AS toks
              FROM documents)
      )
      GROUP BY lang, bigram
    )
    WHERE rk <= 10
    """,
)
def q_text_ngram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 bigrams per language — the n-gram frequency profile used
    for corpus inspection, language-model smoke stats, and building
    langid models (the langid op's n-gram tables come from exactly
    this query shape at k=2..3 over characters).

    The bigram extraction is one fused Arrow ``mapInPandas`` pass that
    emits PRE-COUNTED ``(lang, bigram, n)`` partials per batch — a
    Python-side map-side combine. The Catalyst formulation
    (``transform(sequence(...), i -> concat_ws(element_at...))`` +
    explode) is interpreted per element and measured **56 s vs 0.8 s**
    at sf1 — the same 10×+ finding as the MinHash profile pass
    (functions/dedup.py). The pass is preceded by a split-recovery
    ``repartition``: the fixture writes each table as ONE parquet row
    group, so the scan yields one task no matter the cluster size; a
    production 100 TB table arrives as thousands of row-group splits
    and the repartition becomes a no-op to delete, while here it moves
    each doc once and buys 32× parallelism for the CPU-bound pass.

    100 TB plan: batch-local pre-counting bounds the exchange at
    |distinct bigrams per batch|, the (lang, bigram) final aggregate
    sums partials, and the per-lang top-10 is a WindowGroupLimit
    (per-partition heaps prune to 10 rows per lang before the window
    sort's exchange). Ties break on the bigram string, so the selected
    set is deterministic."""
    import re
    from collections import Counter

    import pandas as pd

    ws = re.compile("[ \t\n\f\r]+")  # RE2 \s, the oracle's class (no \x0b)

    def count_bigrams(batches):
        for pdf in batches:
            acc: Counter = Counter()
            for lang, text in zip(pdf["lang"], pdf["text"]):
                toks = [t for t in ws.split(text) if t]
                acc.update(
                    (lang, f"{a} {b}")
                    for a, b in zip(toks, toks[1:])
                )
            if acc:
                yield pd.DataFrame(
                    {
                        "lang": [k[0] for k in acc],
                        "bigram": [k[1] for k in acc],
                        "n": list(acc.values()),
                    }
                )

    d = load(spark, sf_dir, "documents").select("lang", "text")
    partials = d.transform(
        split_recovery(spark, sf_dir, "documents")
    ).mapInPandas(count_bigrams, "lang string, bigram string, n long")
    counted = partials.groupBy("lang", "bigram").agg(
        F.sum("n").alias("n")
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("n"), F.asc("bigram")
    )
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("lang", "bigram", "n")
    )


@register(
    "q_text_normalize",
    oracle=r"""
    SELECT doc_id, lang, norm,
           length(norm) AS n_chars_norm, n_chars AS n_chars_raw
    FROM (
      SELECT doc_id, lang, n_chars,
             trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
               ' +', ' ', 'g')) AS norm
      FROM documents
    )
    """,
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization projection: lowercase, strip everything
    outside ``[a-z0-9 ]``, collapse runs of spaces, trim — the
    canonical form feeding exact dedup (q_dedup_exact hashes exactly
    this kind of normal form) and tokenizers.

    100 TB plan: a stateless projection — zero shuffle, zero state,
    scan-speed, embarrassingly parallel. The r4 form ran two Java
    ``regexp_replace`` passes in codegen and was the last >2×
    weak-list entry (2.50 s vs the oracle's RE2 at 0.40 s at sf1 — a
    pure regex-engine constant gap); this form is a fused Arrow pass
    using C-speed ``bytes.translate`` (0.76 s, 1.9×): after unicode
    ``str.lower``, deleting the non-[a-z0-9 ] BYTES is *exactly* the
    char-class regex for any UTF-8 input — allowed ASCII bytes never
    occur inside multibyte sequences, so a deleted character loses
    all its bytes and kept characters are untouched — and
    ``' '.join(s.split())`` is collapse+trim since only plain spaces
    survive deletion. The split-recovery repartition mirrors
    q_text_scrub's (the near-unsplittable fixture file caps the scan
    at 1-3 tasks); delete it for multi-split input."""
    import pandas as pd

    d = load(spark, sf_dir, "documents").transform(
        split_recovery(spark, sf_dir, "documents")
    )
    delete = bytes(
        b
        for b in range(256)
        if not (97 <= b <= 122 or 48 <= b <= 57 or b == 32)
    )

    def norm_pass(batches):
        for pdf in batches:
            norms = [
                None
                if t is None  # NULL propagates, like the SQL expression
                else " ".join(
                    t.lower().encode().translate(None, delete).decode().split()
                )
                for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "norm": norms,
                    "n_chars_norm": [
                        None if n is None else len(n) for n in norms
                    ],
                    "n_chars_raw": pdf["n_chars"],
                }
            )

    return d.select("doc_id", "lang", "text", "n_chars").mapInPandas(
        norm_pass,
        "doc_id bigint, lang string, norm string, "
        "n_chars_norm int, n_chars_raw bigint",
    )


@register(
    "q_text_surprisal",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({SQL_TOKENS.format(col="text")}) AS token
      FROM documents
    ),
    vocab AS (
      SELECT token, COUNT(*) AS n_w FROM toks GROUP BY token
    ),
    total AS (SELECT COUNT(*) AS n FROM toks)
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(bits) AS BIGINT) AS total_bits,
           CAST(SUM(bits) AS DOUBLE) / COUNT(*) AS avg_bits
    FROM (
      SELECT t.doc_id,
             (length(bin(total.n)) - 1) - (length(bin(v.n_w)) - 1) AS bits
      FROM toks t JOIN vocab v ON t.token = v.token CROSS JOIN total
    )
    GROUP BY doc_id
    """,
)
def q_text_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram surprisal quality score — the perplexity-proxy filter of
    a pretraining pipeline (KenLM-style scoring, reduced to a unigram
    model the corpus itself provides): documents whose tokens are
    globally rare score high, boilerplate scores low.

    Per-token surprisal is ``floor(log2 N) - floor(log2 n_w)`` — an
    INTEGER bit count (``length(bin(x)) - 1``), never float ``ln``:
    both engines' ``ln``/``log`` are libm-rounded and may differ in the
    last ulp, and a float sum across tokens is order-dependent, so a
    cross-engine hash of a float-scored corpus would flap. Whole-bit
    surprisal keeps the score exact, deterministic, and
    retry/partitioning-independent at any scale (same doctrine as the
    limb-sum money aggregates). The IEEE division happens once per
    document.

    100 TB plan: one Arrow pre-counting pass (split-recovered, like
    the other fused token passes — Catalyst's split+explode is
    interpreted and measured 5.0 s vs 1.5 s at sf1) emits
    ``(doc_id, token, k)`` with per-document counts already combined;
    it feeds (a) the vocabulary aggregate (partial+final on the token
    key) and (b) the scoring join, both partitioned by token —
    co-located, one logical shuffle each; the corpus-total is a
    one-row broadcast; the per-document aggregate shuffles
    (doc_id, long) pairs only. The vocabulary at real scale (~100M
    types) stays distributed — never collected or broadcast (AQE may
    broadcast a small measured vocab; it is not entitled to)."""
    import re
    from collections import Counter

    from streamclient_spark.cacheutil import managed_persist, release_managed

    release_managed()
    ws = re.compile("[ \t\n\f\r]+")  # RE2 \s, the oracle's class (no \x0b)

    def doc_token_counts(batches):
        for pdf in batches:
            ids, tks, ks = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                acc = Counter(t for t in ws.split(text) if t)
                for t, k in acc.items():
                    ids.append(doc_id)
                    tks.append(t)
                    ks.append(k)
            yield pd.DataFrame(
                {"doc_id": ids, "token": tks, "k": ks}
            )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = managed_persist(
        d.transform(split_recovery(spark, sf_dir, "documents")).mapInPandas(
            doc_token_counts, "doc_id bigint, token string, k long"
        )
    )
    vocab = toks.groupBy("token").agg(F.sum("k").alias("n_w"))
    total = toks.agg(F.sum("k").alias("n"))
    bits = (
        (F.length(F.bin(F.col("n"))) - 1)
        - (F.length(F.bin(F.col("n_w"))) - 1)
    ).alias("bits")
    return (
        toks.join(vocab, "token")
        .join(F.broadcast(total))
        .select("doc_id", "k", bits)
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_tokens"),
            F.sum(F.col("k") * F.col("bits")).alias("total_bits"),
            (
                F.sum(F.col("k") * F.col("bits")).cast("double")
                / F.sum("k")
            ).alias("avg_bits"),
        )
    )


# ---------------------------------------------------------------------------
# q_text_hashvec — feature-hashing vectorizer (B-L4)
# ---------------------------------------------------------------------------

#: hashing-trick dimensionality: buckets = md5-prefix mod 128
_HASHVEC_BUCKETS = 128


@register(
    "q_text_hashvec",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({SQL_TOKENS.format(col="text")}) AS token
      FROM documents
    )
    SELECT doc_id,
           CAST(('0x' || substr(md5(token), 1, 8))::UBIGINT
                % {_HASHVEC_BUCKETS} AS BIGINT) AS bucket,
           count(*) AS tf
    FROM toks GROUP BY doc_id, bucket
    """,
)
def q_text_hashvec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-L4: feature-hashing vectorizer (the "hashing trick") — each
    document becomes a sparse term-frequency vector over a FIXED
    128-bucket space, ``bucket = md5(token)[:8] mod 128``, emitted in
    sparse COO form ``(doc_id, bucket, tf)``. This is the stateless
    alternative to a fitted vocabulary: no global dictionary, no
    out-of-vocabulary handling, identical output on any engine or
    executor — which is why pretraining featurizers and online quality
    classifiers use it.

    One fused Arrow pass tokenizes and pre-aggregates (doc, bucket)
    counts per batch (same split-recovery doctrine as the other token
    passes — Catalyst's split+explode is interpreted), then a hash
    aggregate merges across batches in case a document's rows split.
    At 100 TB the shuffle key (doc_id, bucket) is near-uniform and the
    map-side combine has already collapsed each partition to ≤128 rows
    per document; no vocabulary state exists to broadcast or skew."""
    import hashlib
    import re
    from collections import Counter

    import pandas as pd

    ws = re.compile("[ \t\n\f\r]+")  # RE2 \s, the oracle's class (no \x0b)

    def hash_counts(batches):
        for pdf in batches:
            ids, buckets, tfs = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                acc: Counter = Counter()
                for t in ws.split(text):
                    if t:
                        b = (
                            int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
                            % _HASHVEC_BUCKETS
                        )
                        acc[b] += 1
                for b, n in acc.items():
                    ids.append(doc_id)
                    buckets.append(b)
                    tfs.append(n)
            yield pd.DataFrame(
                {"doc_id": ids, "bucket": buckets, "tf": tfs}
            )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    partials = d.transform(
        split_recovery(spark, sf_dir, "documents")
    ).mapInPandas(hash_counts, "doc_id bigint, bucket bigint, tf long")
    return partials.groupBy("doc_id", "bucket").agg(
        F.sum("tf").alias("tf")
    )


# ---------------------------------------------------------------------------
# q_text_bm25 — BM25 retrieval scoring (B-L4 extension)
# ---------------------------------------------------------------------------

#: the standing query for the BM25 demo (mid-frequency fixture terms)
_BM25_TERMS = ("hash", "join", "scan")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20

_SQL_BM25_TERMS = ", ".join(f"'{t}'" for t in _BM25_TERMS)


def bm25_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``(doc_id, dl, tf per standing query term)`` table that BM25
    scoring reduces the corpus to — keyed-persisted so every consumer
    of the lexical ranker (``q_text_bm25``, ``q_sim_rrf``'s BM25 leg)
    pays the tokenize+explode corpus pass ONCE per session (the same
    sharing fix that took q_text_keywords/q_text_tfidf to a shared tf
    table in r3, measured 1.58→0.94 s there). Bounded: |docs| rows of
    integers, never token payloads."""
    from streamclient_spark.cacheutil import managed_persist

    tok = (
        load(spark, sf_dir, "documents")
        .transform(split_recovery(spark, sf_dir, "documents"))
        .select("doc_id", F.explode(tokens("text")).alias("token"))
    )
    return managed_persist(
        tok.groupBy("doc_id").agg(
            F.count("*").alias("dl"),
            *[
                F.sum((F.col("token") == F.lit(t)).cast("long")).alias(
                    f"tf{i}"
                )
                for i, t in enumerate(_BM25_TERMS)
            ],
        ),
        key=f"bm25perdoc:{sf_dir}",
    )


@register(
    "q_text_bm25",
    oracle=f"""
    WITH per_doc AS (
      SELECT doc_id,
             len(toks) AS dl,
             {" ".join(
                 f"len(list_filter(toks, x -> x = '{t}')) AS tf{i},"
                 for i, t in enumerate(_BM25_TERMS)
             ).rstrip(",")}
      FROM (SELECT doc_id, {SQL_TOKENS.format(col="text")} AS toks
            FROM documents)
    ), stats AS (
      SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl,
             {" ".join(
                 f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i},"
                 for i in range(len(_BM25_TERMS))
             ).rstrip(",")}
      FROM per_doc
    )
    SELECT doc_id,
           round({" + ".join(
               f"ln(1 + (n_docs - df{i} + 0.5) / (df{i} + 0.5))"
               f" * (tf{i} * ({_BM25_K1} + 1))"
               f" / (tf{i} + {_BM25_K1}"
               f" * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))"
               for i in range(len(_BM25_TERMS))
           )}, 6) AS bm25
    FROM per_doc CROSS JOIN stats
    WHERE {" + ".join(f"tf{i}" for i in range(len(_BM25_TERMS)))} > 0
    ORDER BY bm25 DESC, doc_id LIMIT {_BM25_TOPK}
    """,
)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-L4 extension: BM25 ranking of the corpus against a standing
    term query — THE retrieval scorer for RAG corpus preparation and
    search-quality evaluation (Robertson–Spärck Jones probabilistic
    model; the Okapi BM25 form with k1=1.2, b=0.75).

    Plan: ONE corpus pass — explode + conditional aggregation reduces
    every document to ``(doc_id, dl, tf per query term)`` entirely in
    whole-stage codegen, with the map-side partial aggregate collapsing
    the exploded tokens before the single doc-keyed shuffle. Per-term
    document frequency and corpus stats (N, avgdl) then fold into ONE
    1-row aggregate over that |docs|-row frame (persisted — it feeds
    both the stats aggregate and the scoring projection), so scoring is
    a broadcast of one row plus a projection, and the cut is a
    TakeOrderedAndProject. No window, no token-keyed shuffle, no second
    corpus pass.

    Determinism: the per-term score sum is a fixed left-associated
     3-term expression (identical association in both engines); ``ln``
    and the divisions are rounded to 6 decimals at the end (libm
    last-ulp drift; same rule as tf-idf). avgdl is exact (integer dl
    sums are exactly representable).

    100 TB: corpus-wide work is exactly one tokenize+explode scan;
    everything downstream is bounded by |docs| (and the persisted frame
    is |docs| integer rows, not token payloads). For full-vocabulary
    scoring build the inverted tf table once (q_text_tfidf shape) and
    reuse it per query."""
    from streamclient_spark.cacheutil import release_managed

    release_managed()
    per_doc = bm25_per_doc(spark, sf_dir)
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )

    def term_score(i: int):
        tf, df = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log(1 + (F.col("n_docs") - df + 0.5) / (df + 0.5))
        norm = 1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
        return idf * (tf * (_BM25_K1 + 1)) / (tf + _BM25_K1 * norm)

    score = term_score(0)
    for i in range(1, len(_BM25_TERMS)):
        score = score + term_score(i)
    matched = sum(
        (F.col(f"tf{i}") for i in range(1, len(_BM25_TERMS))),
        F.col("tf0"),
    )
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .filter(matched > 0)
        .select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(_BM25_TOPK)
    )


# ---------------------------------------------------------------------------
# q_text_keywords — top-3 tf-idf keywords per document (B-L4)
# ---------------------------------------------------------------------------


@register(
    "q_text_keywords",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({SQL_TOKENS.format(col="text")}) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
    ), df AS (
      SELECT token, count(*) AS df FROM tf GROUP BY token
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ),
    scored AS (
      SELECT tf.doc_id, tf.token,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6)
               AS tfidf
      FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tfidf, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rank
      FROM scored
    )
    WHERE rank <= 3
    """,
)
def q_text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-L4: keyword extraction — each document's top-3 tokens by
    tf-idf (the classic unsupervised keyword picker feeding search
    indexing, tagging, and topic drift monitors). Rides the SAME
    shared tf posting table as q_text_tfidf (:func:`_tf_table` —
    tokenize once per session, not once per consumer; r2 paid the
    full tokenize+tf build twice and a ranking window on top, 6.4×
    the oracle at sf1).

    The per-doc top-3 is an AGGREGATE, not a window: collect each
    document's (−tfidf, token, tfidf) triples, ``sort_array`` +
    ``slice(…, 1, 3)`` them per group, ``posexplode`` the slice into
    (rank−1, row). Per-doc arrays are bounded by document length, the
    group-by reuses the hash-agg path with no sort of the full posting
    table, and the shuffle carries posting rows exactly once. The
    negated-tfidf struct sort is lexicographic (tfidf desc, token asc)
    — identical ordering to the oracle's row_number window, so the
    selected rows and ranks hash-match."""
    from streamclient_spark.cacheutil import release_managed

    release_managed()
    d = load(spark, sf_dir, "documents")
    n = d.agg(F.count("*").cast("double").alias("n_docs"))
    tf = _tf_table(spark, sf_dir)
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    top3 = scored.groupBy("doc_id").agg(
        F.slice(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        (-F.col("tfidf")).alias("neg"),
                        F.col("token").alias("token"),
                        F.col("tfidf").alias("tfidf"),
                    )
                )
            ),
            1,
            3,
        ).alias("top")
    )
    return top3.select(
        "doc_id", F.posexplode("top").alias("pos", "kw")
    ).select(
        "doc_id",
        F.col("kw.token").alias("token"),
        F.col("kw.tfidf").alias("tfidf"),
        (F.col("pos") + 1).cast("int").alias("rank"),
    )


# ---------------------------------------------------------------------------
# q_text_chunker — RAG chunking: token windows with overlap (B-L4)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 64  # window size
CHUNK_STRIDE = 48  # step (=> 16-token overlap)


@register(
    "q_text_chunker",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {SQL_TOKENS.format(col="text")} AS toks
      FROM documents
    ),
    starts AS (
      SELECT doc_id, toks,
             unnest(range(0,
               CASE WHEN len(toks) <= {CHUNK_TOKENS} THEN 1
                    ELSE CAST(CEIL(CAST(len(toks) - {CHUNK_TOKENS} AS DOUBLE)
                              / {CHUNK_STRIDE}) AS BIGINT) + 1 END))
               AS chunk_id
      FROM t
    )
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           array_to_string(
             toks[chunk_id * {CHUNK_STRIDE} + 1 :
                  chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' ')
             AS chunk_text,
           CAST(least(len(toks) - chunk_id * {CHUNK_STRIDE}, {CHUNK_TOKENS})
                AS INT) AS n_tokens
    FROM starts
    """,
)
def q_text_chunker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-L4: RAG chunking — every document split into {CHUNK_TOKENS}-token
    windows at stride {CHUNK_STRIDE} ({CHUNK_TOKENS - CHUNK_STRIDE}-token
    overlap so no boundary sentence is orphaned), the retrieval-corpus
    preparation step between cleaning and embedding. Pure codegen:
    tokenize once, derive the chunk-start index array with ``sequence``
    (ceil-div chunk count, short docs → one chunk), ``posexplode`` into
    rows, ``slice`` + ``array_join`` per chunk — no Python, no shuffle
    (a stateless projection that explodes ~len/stride× — exactly the
    fan-out an embedding stage consumes in place). Chunk math is
    integer on both engines; DuckDB's 1-based inclusive slice mirrors
    Spark's 1-based ``slice`` length form. The split-recovery
    repartition is the text.py:553 fixture trade (r8: without it the
    whole tokenize+slice projection ran in ONE task — 2.07 s warm at
    sf1 vs 1.06 s repartitioned; at 100 TB the scan parallelism is
    natural and the exchange is the line you delete)."""
    d = load(spark, sf_dir, "documents").transform(
        split_recovery(spark, sf_dir, "documents")
    )
    toks = tokens("text")
    n_chunks = F.when(
        F.size(toks) <= CHUNK_TOKENS, F.lit(1)
    ).otherwise(
        F.ceil(
            (F.size(toks) - CHUNK_TOKENS).cast("double") / CHUNK_STRIDE
        ).cast("long")
        + 1
    )
    t = d.select(
        "doc_id",
        toks.alias("toks"),
        F.sequence(F.lit(0), n_chunks - 1).alias("chunk_ids"),
    )
    ex = t.select(
        "doc_id",
        "toks",
        F.explode("chunk_ids").alias("chunk_id"),
    )
    start = F.col("chunk_id") * CHUNK_STRIDE
    return ex.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.array_join(
            F.slice(F.col("toks"), start + 1, F.lit(CHUNK_TOKENS)), " "
        ).alias("chunk_text"),
        F.least(F.size("toks") - start, F.lit(CHUNK_TOKENS))
        .cast("int")
        .alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# q_text_collocations — PMI-scored bigram collocations
# ---------------------------------------------------------------------------

#: minimum corpus bigram count for a collocation candidate
_COLLOC_MIN_N = 5
#: reported collocations (top by lift, exact-integer ordered)
_COLLOC_TOP = 100


@register(
    "q_text_collocations",
    oracle=f"""
    WITH bi AS MATERIALIZED (
      SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS n FROM (
        SELECT unnest(CASE WHEN len(toks) >= 2
                 THEN list_transform(range(1, len(toks)),
                                     i -> struct_pack(w1 := toks[i],
                                                      w2 := toks[i+1]))
                 ELSE [] END) AS b
        FROM (SELECT {SQL_TOKENS.format(col="text")} AS toks
              FROM documents)
      )
      GROUP BY 1, 2
    ),
    l AS MATERIALIZED (SELECT w1, CAST(sum(n) AS BIGINT) AS c1
                       FROM bi GROUP BY w1),
    r AS MATERIALIZED (SELECT w2, CAST(sum(n) AS BIGINT) AS c2
                       FROM bi GROUP BY w2),
    tot AS MATERIALIZED (SELECT CAST(sum(n) AS BIGINT) AS nn FROM bi)
    SELECT w1, w2, n, c1, c2, lift_ppm,
           round(ln((CAST(n AS DOUBLE) * nn) /
                    (CAST(c1 AS DOUBLE) * c2)), 6) AS pmi6
    FROM (
      SELECT bi.w1, bi.w2, bi.n, l.c1, r.c2, tot.nn,
             CAST((CAST(bi.n AS HUGEINT) * tot.nn * 1000000)
                  // (CAST(l.c1 AS HUGEINT) * r.c2) AS BIGINT)
               AS lift_ppm
      FROM bi JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN tot
      WHERE bi.n >= {_COLLOC_MIN_N}
    )
    ORDER BY lift_ppm DESC, w1, w2 LIMIT {_COLLOC_TOP}
    """,
)
def q_text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-scored bigram collocations: the corpus's most-associated
    adjacent word pairs (pointwise mutual information — the phrase
    detector behind word2vec-style phrase merging and collocation
    lexica). Margins are the standard bigram-table marginals (c1 =
    bigrams starting with w1, c2 = bigrams ending with w2, N = total
    bigrams), so the WHOLE statistic derives from one bigram count
    table and two tiny re-aggregates of it — the corpus is scanned
    once and never joined back.

    Ranking floats would flap across engines, so candidates are
    ORDERED BY AN EXACT INTEGER: lift_ppm = floor(n·N·10⁶ / (c1·c2))
    (the PMI argument in parts-per-million; n·N·10⁶ overflows int64
    beyond ~sf1, so the quotient runs 128-bit — Spark decimal(38,0)
    ``div``, DuckDB HUGEINT ``//``; DuckDB's DECIMAL ``//`` detours
    through a double and was measured off-by-one at ~1.3e6), with
    (w1, w2) as the total tie-break; the float ln ships rounded to
    1e-6 for the report but never orders anything. Bigram extraction is the same fused Arrow
    pre-counting pass as q_text_ngram_top (measured 56 s vs 0.8 s for
    the Catalyst HOF formulation at sf1), behind the same
    split-recovery repartition; the final top-100 is a
    TakeOrderedAndProject over the n ≥ 5 survivors — at 100 TB the
    exchange carries |distinct surviving bigrams| rows, never tokens."""
    import re
    from collections import Counter

    ws = re.compile("[ \t\n\f\r]+")  # RE2 \s, the oracle's class (no \x0b)

    def count_bigrams(batches):
        for pdf in batches:
            acc: Counter = Counter()
            for text in pdf["text"]:
                toks = [t for t in ws.split(text) if t]
                acc.update(zip(toks, toks[1:]))
            if acc:
                yield pd.DataFrame(
                    {
                        "w1": [k[0] for k in acc],
                        "w2": [k[1] for k in acc],
                        "n": list(acc.values()),
                    }
                )

    d = load(spark, sf_dir, "documents").select("text")
    partials = d.transform(
        split_recovery(spark, sf_dir, "documents")
    ).mapInPandas(count_bigrams, "w1 string, w2 string, n long")
    bi = partials.groupBy("w1", "w2").agg(F.sum("n").alias("n"))
    from streamclient_spark.cacheutil import managed_persist

    bi = managed_persist(bi, key=f"colloc_bigrams:{sf_dir}")
    left = bi.groupBy("w1").agg(F.sum("n").alias("c1"))
    right = bi.groupBy("w2").agg(F.sum("n").alias("c2"))
    tot = bi.agg(F.sum("n").alias("nn"))
    dec = "decimal(38,0)"
    cand = (
        bi.filter(F.col("n") >= _COLLOC_MIN_N)
        .join(left, "w1")
        .join(right, "w2")
        .join(F.broadcast(tot))  # 1-row scalar
    )
    lift = F.expr(
        f"CAST((CAST(n AS {dec}) * nn * 1000000) div "
        f"(CAST(c1 AS {dec}) * c2) AS BIGINT)"
    )
    pmi = F.round(
        F.log(
            (F.col("n").cast("double") * F.col("nn"))
            / (F.col("c1").cast("double") * F.col("c2"))
        ),
        6,
    )
    return (
        cand.select(
            "w1", "w2", "n", "c1", "c2",
            lift.alias("lift_ppm"), pmi.alias("pmi6"),
        )
        .orderBy(F.desc("lift_ppm"), "w1", "w2")
        .limit(_COLLOC_TOP)
    )


# ---------------------------------------------------------------------------
# q_text_readability — Flesch reading-ease scoring (round-3 addition)
# ---------------------------------------------------------------------------


@register(
    "q_text_readability",
    oracle="""
    WITH c AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
               AS n_words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS BIGINT) AS n_sents,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS BIGINT) AS n_syll
      FROM documents
    )
    SELECT doc_id, n_words, n_sents, n_syll,
           round(206.835
                 - 1.015 * (CAST(n_words AS DOUBLE)
                            / CAST(n_sents AS DOUBLE))
                 - 84.6 * (CAST(n_syll AS DOUBLE)
                           / CAST(n_words AS DOUBLE)), 6) AS flesch,
           CASE WHEN CAST(n_syll AS HUGEINT) * 1000
                     >= CAST(n_words AS HUGEINT) * 1700 THEN 'hard'
                WHEN CAST(n_syll AS HUGEINT) * 1000
                     >= CAST(n_words AS HUGEINT) * 1400 THEN 'medium'
                ELSE 'easy' END AS band
    FROM c WHERE n_words > 0
    """,
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease scoring per document — the classic
    readability quality signal (a pretraining-corpus filter alongside
    C-L4's Gopher rules): words/sentence and syllables/word folded
    into 206.835 − 1.015·w/s − 84.6·syl/w. Syllables use the standard
    vowel-group approximation (runs of [aeiouy] — deterministic and
    dictionary-free, the form every at-scale pipeline ships); sentence
    count is floored at 1 so fragments don't divide by zero. All three
    counts are exact integers from ONE regex pass each (identical RE2/
    Java semantics for these character-class patterns); the score is
    a textually-identical double expression rounded to 6, and the
    easy/medium/hard band compares scaled INTEGERS (syl×1000 vs
    words×1400/1700) so no document flips band from float rounding.
    Split-recovered (near-unsplittable fixture file); at 100 TB this
    is an embarrassingly parallel map — no shuffle at all."""
    d = load(spark, sf_dir, "documents").transform(
        split_recovery(spark, sf_dir, "documents")
    )
    n_words = F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0)).cast(
        "long"
    )
    n_sents = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), 0)), F.lit(1)
    ).cast("long")
    n_syll = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0)
    ).cast("long")
    c = d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sents.alias("n_sents"),
        n_syll.alias("n_syll"),
    ).filter(F.col("n_words") > 0)
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("n_words").cast("double") / F.col("n_sents").cast("double"))
        - F.lit(84.6)
        * (F.col("n_syll").cast("double") / F.col("n_words").cast("double")),
        6,
    )
    dec = "decimal(38,0)"
    syl1000 = F.col("n_syll").cast(dec) * 1000
    band = (
        F.when(syl1000 >= F.col("n_words").cast(dec) * 1700, "hard")
        .when(syl1000 >= F.col("n_words").cast(dec) * 1400, "medium")
        .otherwise("easy")
    )
    return c.select(
        "doc_id", "n_words", "n_sents", "n_syll",
        flesch.alias("flesch"), band.alias("band"),
    )


# ---------------------------------------------------------------------------
# q_text_zipf — Zipf decay profile of the corpus vocabulary (round 4)
# ---------------------------------------------------------------------------


@register(
    "q_text_zipf",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({SQL_TOKENS.format(col="text")}) AS token
      FROM documents
    ),
    freq AS (
      SELECT token, count(*) AS f FROM tok GROUP BY token
    ),
    ranked AS (
      SELECT token, f,
             row_number() OVER (ORDER BY f DESC, token) AS r
      FROM freq
    ),
    binned AS (
      SELECT CAST(length(bin(r)) - 1 AS INT) AS rank_bin,
             count(*) AS n_tokens,
             CAST(sum(f) AS BIGINT) AS freq_sum,
             CAST(max(f) AS BIGINT) AS max_freq
      FROM ranked GROUP BY 1
    )
    SELECT rank_bin, n_tokens, freq_sum, max_freq,
           CAST(freq_sum * 1000 // lead(freq_sum)
                OVER (ORDER BY rank_bin) AS BIGINT) AS decay_permille
    FROM binned
    """,
)
def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf decay profile: corpus token frequencies bucketed into
    power-of-two RANK bins (ranks 1, 2-3, 4-7, …), with the bin-over-
    bin mass decay — the one-glance check that a corpus has a natural
    long-tail vocabulary (a Zipf-α≈1 corpus decays ≈ constant
    permille per doubling; scraped boilerplate or synthetic spam shows
    up as a flat or cliffed profile — a standard pre-training corpus
    health signal). EVERYTHING is exact integer arithmetic: bin =
    length(bin(rank))−1 (the q_events_freq_hist device), masses are
    long sums, decay is floored integer permille via lead — no libm
    log ever enters a sum, so no float-ordering hazard exists.

    Plan: the shared persisted tf table (one tokenize pass), a |vocab|
    aggregate, a global rank over the |vocab| aggregate (bounded —
    vocabulary, not corpus; at web scale swap in scale.ranked_by_range
    exactly as q_rank_global does), then a ≤32-row bin rollup and a
    window over ≤32 rows."""
    from streamclient_spark.cacheutil import release_managed

    release_managed()
    tf = _tf_table(spark, sf_dir)
    freq = tf.groupBy("token").agg(F.sum("tf").alias("f"))
    w = Window.orderBy(F.desc("f"), F.asc("token"))
    ranked = freq.select("f", F.row_number().over(w).alias("r"))
    binned = ranked.groupBy(
        (F.length(F.bin("r")) - 1).cast("int").alias("rank_bin")
    ).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("f").alias("freq_sum"),
        F.max("f").alias("max_freq"),
    )
    return binned.select(
        "rank_bin",
        "n_tokens",
        "freq_sum",
        "max_freq",
        F.expr(
            "(freq_sum * 1000) div "
            "lead(freq_sum) OVER (ORDER BY rank_bin)"
        )
        .cast("long")
        .alias("decay_permille"),
    )


# ---------------------------------------------------------------------------
# q_text_novelty — per-document shingle novelty vs the corpus (round 4)
# ---------------------------------------------------------------------------


@register(
    "q_text_novelty",
    oracle=f"""
    WITH sh0 AS MATERIALIZED (
      SELECT doc_id,
             unnest({sql_shingles(SQL_TOKENS.format(col="text"))}) AS s0
      FROM documents
    ),
    sh AS MATERIALIZED (
      SELECT doc_id,
             CAST(('0x' || substr(md5(s0), 1, 8)) AS BIGINT) AS s
      FROM sh0
    ),
    df AS (
      SELECT s, count(*) AS df FROM sh GROUP BY s
    )
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(*) FILTER (WHERE df.df = 1) AS BIGINT) AS n_unique,
           CAST(count(*) FILTER (WHERE df.df = 1) * 1000 // count(*)
                AS BIGINT) AS novelty_permille
    FROM sh JOIN df USING (s)
    GROUP BY sh.doc_id
    """,
)
def q_text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shingle novelty: the share of a document's
    distinct 5-gram shingles that appear NOWHERE else in the corpus —
    the information-contribution signal a dedup-adjacent curation pass
    ranks by (novelty ≈ 0 means the document is assembled from corpus
    boilerplate even if no single near-duplicate exists; the
    complement of q_dedup_containment's view). Exact integers end to
    end: shingle document frequencies, per-doc counts, floored permille.

    Plan: one tokenize+shingle explode (the same codegen transform as
    the dedup family), a shingle-keyed df aggregate, and one join of
    the exploded table back onto df riding the SAME shingle hash —
    then a per-doc aggregate. Two shuffles, both linear in shingle
    volume; no pairwise anything. At 100 TB this is the same cost
    class as building the MinHash index."""
    from streamclient_spark.functions.dedup import hash32

    d = load(spark, sf_dir, "documents")
    # split recovery (the _tf_table rule: the single-file fixture would
    # run the CPU-bound tokenize+shingle on 1-3 tasks), then hash each
    # shingle to a 32-bit int BEFORE anything shuffles — the df agg and
    # the join move 8-byte keys instead of ~40-byte 5-gram strings
    # (58 s → seconds at sf1). Hash collisions merge df counts
    # IDENTICALLY on both engines (same md5 bridge), so parity holds
    # and the novelty statistic is unaffected beyond ~2⁻³² noise.
    sh = (
        d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", F.explode(shingles(tokens("text"))).alias("s0"))
        .select("doc_id", hash32("s0").alias("s"))
    )
    df = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    j = sh.join(df, "s")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count_if(F.col("df") == 1).alias("n_unique"),
        F.expr("count_if(df = 1) * 1000 div count(1)")
        .cast("long")
        .alias("novelty_permille"),
    )


# ---------------------------------------------------------------------------
# q_quality_classifier — hashed-feature linear quality model (round 4)
# ---------------------------------------------------------------------------


@register(
    "q_quality_classifier",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             unnest({SQL_TOKENS.format(col="text")}) AS tok
      FROM documents
    ),
    scored AS (
      SELECT doc_id, any_value(source) AS source,
             count(*) AS n_tokens,
             SUM(CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
                 % 2001 - 1000) AS sum_w
      FROM tok GROUP BY doc_id
    ),
    docscore AS (
      SELECT source, sum_w // n_tokens AS mean_w FROM scored
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE mean_w >= 0) AS BIGINT)
             AS n_kept,
           CAST(count(*) FILTER (WHERE mean_w >= 0) * 1000 // count(*)
                AS BIGINT) AS kept_permille,
           CAST(SUM(mean_w) AS BIGINT) AS sum_mean_w
    FROM docscore GROUP BY source
    """,
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-based quality filtering (the DCLM / FineWeb-edu
    pattern): score every document with a LINEAR MODEL over hashed
    token features — the hashing trick, so the model is a weight per
    hash bucket and needs no vocabulary — keep documents scoring ≥ 0,
    and report the per-source keep rate (the mixture-shift audit run
    before adopting any learned filter). The weights here are
    DETERMINISTIC STAND-INS derived from the bucket hash itself
    (w = h mod 2001 − 1000: a fixed pseudo-random ±1000 table; the
    container ships no model artifacts) — a real deployment swaps in
    trained weights via a broadcast map lookup and every other part
    of the plumbing (hashing, per-doc dot product, truncating mean,
    threshold, per-source rollup) is exactly what production runs.

    Exact integers end to end: bucket weights, Σw, truncating-div
    mean (both engines truncate toward zero), floored permille. Plan:
    one tokenize explode (split-recovery repartition first), per-doc
    sum riding the doc key, per-source rollup — two linear shuffles,
    the same cost class as token counting at 100 TB."""
    from streamclient_spark.functions.dedup import hash32

    d = load(spark, sf_dir, "documents")
    tok = (
        d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(
            "doc_id",
            "source",
            F.explode(tokens("text")).alias("tok"),
        )
    )
    w = hash32("tok") % 2001 - 1000
    scored = tok.groupBy("doc_id").agg(
        F.any_value(F.col("source")).alias("source"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(w).alias("sum_w"),
    )
    docscore = scored.select(
        "source", F.expr("sum_w div n_tokens").alias("mean_w")
    )
    return docscore.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("mean_w") >= 0).alias("n_kept"),
        F.expr("count_if(mean_w >= 0) * 1000 div count(1)")
        .cast("long")
        .alias("kept_permille"),
        F.sum("mean_w").cast("long").alias("sum_mean_w"),
    )


# ---------------------------------------------------------------------------
# q_corpus_report — per-source corpus composition dashboard (round 4)
# ---------------------------------------------------------------------------


@register(
    "q_corpus_report",
    oracle=f"""
    WITH d AS (
      SELECT source, lang, n_chars,
             len({SQL_TOKENS.format(col="text")}) AS n_tokens
      FROM documents
    ),
    sl AS (
      SELECT source, lang, count(*) AS c FROM d GROUP BY source, lang
    ),
    ent AS (
      SELECT source,
             SUM(CAST(floor(c * ln(CAST(c AS DOUBLE)) * 1000000.0
                            + 0.5) AS BIGINT)) AS sum_clnc_micro,
             SUM(c) AS n, count(*) AS n_langs
      FROM sl GROUP BY source
    ),
    base AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             CAST(SUM(n_chars) // count(*) AS BIGINT) AS mean_chars,
             CAST(count(*) FILTER (WHERE lang = 'en') * 1000
                  // count(*) AS BIGINT) AS en_permille
      FROM d GROUP BY source
    )
    SELECT base.source, n_docs, total_tokens, mean_chars, en_permille,
           CAST(n_langs AS BIGINT) AS n_langs,
           round(ln(CAST(n AS DOUBLE))
                 - CAST(sum_clnc_micro AS DOUBLE) / 1000000.0 / n, 6)
             AS lang_entropy
    FROM base JOIN ent ON base.source = ent.source
    """,
)
def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus composition dashboard: document counts, token
    volume, mean length, English share, language count, and the
    Shannon entropy of the language mix — the one-page report a data
    curator reads before setting mixture weights (a source whose
    entropy collapsed between crawls changed its composition; a
    source with en_permille ≈ 1000 needs no language filter). Entropy
    uses H = ln n − (Σ c·ln c)/n with each c·ln c term FLOORED TO
    EXACT INTEGER MICROS before the sum — the per-term libm value is
    deterministic, the sum is exact and order-independent, and the
    single final round(.,6) is the only place float order could have
    mattered (the q_text_tfidf rule, hardened for a multi-term sum).

    Plan: one scan computing token counts in codegen, two
    map-combined aggregates (source×lang is ≤ |sources|·|langs| rows,
    then source), one broadcast-sized join. Scan-bound at 100 TB."""
    d = load(spark, sf_dir, "documents").select(
        "source",
        "lang",
        "n_chars",
        F.size(tokens("text")).alias("n_tokens"),
    )
    sl = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    ent = sl.groupBy("source").agg(
        F.sum(
            F.floor(
                F.col("c")
                * F.log(F.col("c").cast("double"))
                * F.lit(1000000.0)
                + F.lit(0.5)
            ).cast("bigint")
        ).alias("sum_clnc_micro"),
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    base = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.expr("sum(n_chars) div count(1)")
        .cast("long")
        .alias("mean_chars"),
        F.expr("count_if(lang = 'en') * 1000 div count(1)")
        .cast("long")
        .alias("en_permille"),
    )
    return base.join(ent, "source").select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        "total_tokens",
        "mean_chars",
        "en_permille",
        F.col("n_langs").cast("long").alias("n_langs"),
        F.round(
            F.log(F.col("n").cast("double"))
            - F.col("sum_clnc_micro").cast("double")
            / F.lit(1000000.0)
            / F.col("n"),
            6,
        ).alias("lang_entropy"),
    )


# ---------------------------------------------------------------------------
# q_text_bigram_lm — bigram-LM surprisal scoring (round 4)
# ---------------------------------------------------------------------------


@register(
    "q_text_bigram_lm",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {SQL_TOKENS.format(col="text")} AS ts
      FROM documents
    ),
    bg AS MATERIALIZED (
      SELECT doc_id, source,
             unnest(ts[1:len(ts)-1]) AS w1,
             unnest(ts[2:len(ts)]) AS w2
      FROM toks
    ),
    uni AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
    bic AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(SUM((length(bin(c1)) - 1) - (length(bin(c2)) - 1))
                AS BIGINT) AS total_bits,
           CAST(SUM((length(bin(c1)) - 1) - (length(bin(c2)) - 1))
                AS DOUBLE) / count(*) AS avg_bits
    FROM bg JOIN uni USING (w1) JOIN bic USING (w1, w2)
    GROUP BY source
    """,
)
def q_text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM surprisal per source — the conditional upgrade of
    q_text_surprisal's unigram model (KenLM-style corpus scoring,
    order 2): each bigram costs ``floor(log2 c(w1)) − floor(log2
    c(w1,w2))`` whole bits, the corpus itself is the model. INTEGER
    bit counts, never float ``ln`` (the surprisal doctrine), so sums
    are exact and order-independent; the single avg division is the
    only float op and runs identically on both engines.

    Plan: ONE fused Arrow pass tokenizes and emits bigrams PRE-COUNTED
    per (source, w1, w2) batch — the same split-recovered
    ``mapInPandas`` pre-count recipe that took the unigram tf pass
    from 5.0 s to 1.5 s at sf1 (the r4/r5 Catalyst ``zip_with``
    explode this replaces is interpreted, not codegen, and shuffled
    one row per bigram OCCURRENCE; VERDICT r5 weak list). The
    context- and bigram-count models then need NO joins at all: after
    one hash(w1) exchange of the counted stream, both c(w1) and
    c(w1, w2) are window sums over prefixes of the same (w1, w2) sort
    — hash(w1) clusters both window keys, so the two model passes and
    the score projection run in a single exchange-free stage, and the
    rollup re-weights by k (exact: the bit cost depends only on
    (w1, w2)). At 100 TB the one model exchange carries distinct
    (source, w1, w2) triples per Arrow batch, never token volume."""
    import re
    from collections import Counter

    ws = re.compile("[ \t\n\f\r]+")  # RE2 \s, the oracle's class (no \x0b)

    def bigram_counts(batches):
        for pdf in batches:
            srcs, w1s, w2s, ks = [], [], [], []
            acc: Counter = Counter()
            for source, text in zip(pdf["source"], pdf["text"]):
                if text is None:
                    continue
                ts = [t for t in ws.split(text) if t]
                acc.update(zip([source] * (len(ts) - 1), ts, ts[1:]))
            for (source, w1, w2), k in acc.items():
                srcs.append(source)
                w1s.append(w1)
                w2s.append(w2)
                ks.append(k)
            yield pd.DataFrame(
                {"source": srcs, "w1": w1s, "w2": w2s, "k": ks}
            )

    d = load(spark, sf_dir, "documents").select("source", "text")
    bg = (
        d.transform(split_recovery(spark, sf_dir, "documents"))
        .mapInPandas(
            bigram_counts, "source string, w1 string, w2 string, k long"
        )
        .repartition(spark.sparkContext.defaultParallelism, "w1")
    )
    w_uni = Window.partitionBy("w1")
    w_bic = Window.partitionBy("w1", "w2")
    bits = (
        F.length(F.bin(F.sum("k").over(w_uni))) - 1
    ) - (F.length(F.bin(F.sum("k").over(w_bic))) - 1)
    scored = bg.select("source", "k", bits.alias("bits"))
    return scored.groupBy("source").agg(
        F.sum("k").cast("long").alias("n_bigrams"),
        F.sum(F.col("k") * F.col("bits")).cast("long").alias("total_bits"),
        (
            F.sum(F.col("k") * F.col("bits")).cast("double")
            / F.sum("k")
        ).alias("avg_bits"),
    )


# ---------------------------------------------------------------------------
# q_text_fertility — tokenizer fertility audit per (lang, source)
# ---------------------------------------------------------------------------


@register(
    "q_text_fertility",
    oracle=f"""
    WITH per_doc AS (
      SELECT lang, source,
             CAST(n_chars AS BIGINT) AS chars,
             CAST(len({SQL_TOKENS.format(col="text")}) AS BIGINT)
               AS toks,
             CAST(length(regexp_replace(text, '\\s', '', 'g'))
                  AS BIGINT) AS nonspace
      FROM documents WHERE n_chars > 0
    )
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS total_tokens,
           CAST(SUM(chars) * 1000 // SUM(toks) AS BIGINT)
             AS chars_per_token_permille,
           CAST(SUM(nonspace) * 1000 // SUM(toks) AS BIGINT)
             AS payload_per_token_permille
    FROM per_doc
    GROUP BY 1, 2
    """,
)
def q_text_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit: characters per token by (language,
    source) — THE compression metric that decides how many effective
    training tokens a corpus slice yields and which languages a
    tokenizer under-serves (low chars/token = high fertility = that
    slice burns budget). Reported twice: raw chars/token and
    non-whitespace payload/token, both as exact integer permille of
    corpus-level sums (never means-of-ratios — a million tiny docs
    must not outvote one long one).

    Plan: ONE codegen projection (token count via the shared split
    expression, two length expressions), one map-combined aggregate
    to |langs|×|sources| rows. No shuffle beyond the group keys at
    any scale. r10 floor audit (the q_quality_cut devices): the
    non-whitespace count moved off the allocation-bound
    ``regexp_replace`` onto ``length(translate(text, <RE2 \\s set>,
    ''))`` — translate deletes exactly the five chars the ORACLE's
    RE2 ``\\s`` matches ``[ \\t\\n\\f\\r]``, so the count is
    identical by definition (ADVICE r10: the first translate set
    hard-pinned java-\\s's extra ``\\x0b``, a latent hash mismatch on
    vertical-tab-bearing text; whitespace semantics here are DEFINED
    by the committed oracle, not by what the old regexp engine
    happened to match) — and the projection is
    preceded by the text.py:553 split-recovery repartition (the
    fixture is one row group; delete the exchange at natural-split
    scale). A/B at sf1, probes green: 1.08 → 0.74 s warm min
    (translate+repartition; repartition alone 0.99)."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .transform(split_recovery(spark, sf_dir, "documents"))
    )
    per_doc = d.select(
        "lang",
        "source",
        F.col("n_chars").cast("long").alias("chars"),
        F.size(tokens("text")).cast("long").alias("toks"),
        F.length(
            F.translate("text", WS_CLASS, "")
        ).cast("long").alias("nonspace"),
    )
    return per_doc.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("total_tokens"),
        F.expr("sum(chars) * 1000 div sum(toks)")
        .cast("long")
        .alias("chars_per_token_permille"),
        F.expr("sum(nonspace) * 1000 div sum(toks)")
        .cast("long")
        .alias("payload_per_token_permille"),
    )


# ---------------------------------------------------------------------------
# q_text_kl_drift — per-source vocabulary KL divergence vs corpus (round 5)
# ---------------------------------------------------------------------------


@register(
    "q_text_kl_drift",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({SQL_TOKENS.format(col="text")}) AS token
      FROM documents
    ),
    st AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2),
    t AS (SELECT token, CAST(sum(c) AS BIGINT) AS ct FROM st GROUP BY 1),
    ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
                  count(*) AS n_vocab
           FROM st GROUP BY 1),
    nn AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM ns),
    terms AS (
      SELECT st.source,
             SUM(CAST(round(st.c * (log2(st.c) - log2(t.ct)), 6)
                      AS DECIMAL(27,6))) AS s
      FROM st JOIN t USING (token) GROUP BY 1
    )
    SELECT ns.source, ns.n AS n_tokens, ns.n_vocab,
           round(CAST(terms.s AS DOUBLE) / ns.n
                 + log2(nn.total) - log2(ns.n), 6) AS kl_bits
    FROM ns JOIN terms USING (source) CROSS JOIN nn
    """,
)
def q_text_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-shift monitor: each source's token-distribution KL
    divergence from the whole corpus, in bits — the vocabulary-level
    drift detector next to q_dq_drift's numeric PSI (a source whose
    language quietly changes — spam influx, template rollout, scraper
    drift — moves its KL long before summary stats notice). KL(P_s ‖
    corpus) via the identity Σ (c_st/N_s)·log2(c_st·N/(c_t·N_s)) =
    (Σ c_st·[log2 c_st − log2 c_t])/N_s + log2 N − log2 N_s, so
    exactly ONE float term per (source, token) row exists; each term
    rounds to the 1e-6 grid and sums as EXACT decimal (the entropy
    doctrine — float Σ would be partition-order-dependent), then two
    scalar log2s and one division finish per source.

    Plan: one tokenize+explode pass → map-combined (source, token)
    counts; corpus token totals re-aggregate that VOCAB-sized table
    (never a second corpus pass) and join back token-co-keyed; the
    per-source decimal rollup is |sources| rows and the corpus total
    broadcasts as a 1-row scalar. At 100 TB the corpus-scale work is
    exactly the one token shuffle every tf-family query pays."""
    d = load(spark, sf_dir, "documents").transform(
        split_recovery(spark, sf_dir, "documents")
    )
    st = (
        d.select("source", F.explode(tokens("text")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # feeds totals AND the term join
    )
    t = st.groupBy("token").agg(F.sum("c").cast("long").alias("ct"))
    ns = st.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).alias("n_vocab"),
    )
    nn = ns.agg(F.sum("n").cast("long").alias("total"))
    term = F.round(
        F.col("c") * (F.log2("c") - F.log2("ct")), 6
    ).cast("decimal(27,6)")
    terms = (
        st.join(t, "token")
        .groupBy("source")
        .agg(F.sum(term).alias("s"))
    )
    return (
        ns.join(terms, "source")
        .crossJoin(F.broadcast(nn))
        .select(
            "source",
            F.col("n").alias("n_tokens"),
            "n_vocab",
            F.round(
                F.col("s").cast("double") / F.col("n")
                + F.log2("total")
                - F.log2("n"),
                6,
            ).alias("kl_bits"),
        )
    )


# ---------------------------------------------------------------------------
# q_text_lexical_diversity — type-token / hapax profile per source (C-245)
# ---------------------------------------------------------------------------


@register(
    "q_text_lexical_diversity",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({SQL_TOKENS.format(col="text")}) AS token
      FROM documents
    ),
    st AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2)
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_vocab,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax,
           count(*) * 1000 // CAST(sum(c) AS BIGINT) AS ttr_permille,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             * 1000 // count(*) AS hapax_permille
    FROM st GROUP BY source
    """,
)
def q_text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity profile per source: type-token ratio and
    hapax-legomenon share, in floored integer permille — the cheap
    template/boilerplate detector next to q_text_kl_drift (KL says a
    source's vocabulary DIFFERS from the corpus; a collapsing TTR or
    vanishing hapax share says it is DEGENERATE — machine-generated,
    templated, or spam-duplicated — regardless of which words it
    uses). Standard corpus-QC gate before mixing weights are chosen.

    Plan: one tokenize+explode pass → map-combined (source, token)
    counts → a |sources|-row rollup; every ratio is integer division
    on exact counts, so no float can flap. At 100 TB the corpus-scale
    work is exactly the one token shuffle of the tf family; the vocab
    table it rolls up is the bounded artifact every quality query in
    this module already pays for."""
    d = load(spark, sf_dir, "documents").transform(
        split_recovery(spark, sf_dir, "documents")
    )
    st = (
        d.select("source", F.explode(tokens("text")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        st.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_vocab"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("hapax"),
        )
        .select(
            "source",
            "n_tokens",
            "n_vocab",
            "hapax",
            F.expr("n_vocab * 1000 div n_tokens").alias("ttr_permille"),
            F.expr("hapax * 1000 div n_vocab").alias("hapax_permille"),
        )
    )
