"""Scalar function families (SURVEY.md §2B rows B-F1..B-F6).

All JVM-side builtins inside whole-stage codegen — no Python on the
hot path. Oracle notes: only functions with engine-identical results
are hashed (e.g. ``sqrt`` is IEEE-exact; ``ln`` is correctly-rounded in
both engines' libm for these magnitudes and additionally rounded to 6
decimals to absorb any last-ulp divergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamclient_spark.functions.text import WS_PATTERN
from streamclient_spark.plans.registry import register
from streamclient_spark.tables import load, split_recovery

# ---------------------------------------------------------------------------
# B-F1 — strings
# ---------------------------------------------------------------------------


@register(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS lname,
           upper(p_brand) AS ubrand,
           substr(p_type, 1, 5) AS type5,
           trim(p_name) AS tname,
           length(p_name) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type,
           replace(p_name, ' ', '_') AS snake,
           CASE WHEN regexp_matches(p_type, '^(STANDARD|SMALL)') THEN 1 ELSE 0 END AS is_std_small,
           split_part(p_type, ' ', 1) AS type_head
    FROM part
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-F1: lower/upper/substr/trim/length/concat/replace/regexp/split
    over part descriptors — all codegen'd string intrinsics."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.trim("p_name").alias("tname"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("snake"),
        F.when(F.col("p_type").rlike("^(STANDARD|SMALL)"), 1)
        .otherwise(0)
        .alias("is_std_small"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
    )


# ---------------------------------------------------------------------------
# B-F2 — date/time
# ---------------------------------------------------------------------------


@register(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           date_trunc('month', o_orderdate) AS order_month,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS order_quarter,
           CAST(EXTRACT(dow FROM o_orderdate) AS INT) AS dow_sunday0,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS BIGINT)
             AS days_to_2002,
           o_orderdate + INTERVAL 90 DAY AS due_date,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-F2: trunc/extract/diff/add/format on order dates. DOW is
    normalized to Sunday=0 on both engines (Spark dayofweek is
    Sunday=1)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
        (F.dayofweek("o_orderdate") - 1).alias("dow_sunday0"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_2002"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
    )


# ---------------------------------------------------------------------------
# B-F3 — math
# ---------------------------------------------------------------------------


@register(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 50000) AS abs_dev,
           round(l_extendedprice, 1) AS price_r1,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           sqrt(l_extendedprice) AS price_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln6,
           l_extendedprice * l_extendedprice AS price_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
    FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-F3: abs/round/floor/ceil/sqrt/ln/square/mod. sqrt is IEEE-exact;
    ln is rounded to 6 decimals (libm last-ulp guard); the square uses
    explicit multiply (pow() implementations differ across libms)."""
    l = load(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000).alias("abs_dev"),
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln6"),
        (F.col("l_extendedprice") * F.col("l_extendedprice")).alias("price_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


# ---------------------------------------------------------------------------
# B-F4 — arrays
# ---------------------------------------------------------------------------


@register(
    "q_fn_array",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           string_split(text, ' ')[1] AS first_token,
           CASE WHEN list_contains(string_split(text, ' '), 'spark')
                THEN 1 ELSE 0 END AS has_spark,
           array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',')
             AS sorted_vocab
    FROM documents
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-F4: split→array, size, element access, contains, distinct+sort.
    The sorted-distinct vocabulary is rendered to a string so the
    array<->list cell encoding never touches the comparison."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        toks.getItem(0).alias("first_token"),
        F.when(F.array_contains(toks, "spark"), 1).otherwise(0).alias("has_spark"),
        F.array_join(F.array_sort(F.array_distinct(toks)), ",").alias("sorted_vocab"),
    )


# ---------------------------------------------------------------------------
# B-F5 — maps
# ---------------------------------------------------------------------------


@register(
    "q_fn_map",
    oracle="""
    SELECT doc_id,
           array_to_string(map_keys(map {'lang': lang, 'source': source}), ',')
             AS meta_keys,
           map_extract(map {'lang': lang, 'source': source}, 'lang')[1] AS lang_val
    FROM documents
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-F5: map construction, key listing, value access. Keys/values
    are projected to strings for engine-neutral comparison (map cell
    encodings differ between Arrow exporters)."""
    d = load(spark, sf_dir, "documents")
    meta = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return d.select(
        "doc_id",
        F.array_join(F.map_keys(meta), ",").alias("meta_keys"),
        meta.getItem("lang").alias("lang_val"),
    )


# ---------------------------------------------------------------------------
# B-F6 — JSON extraction (the `props` column of events)
# ---------------------------------------------------------------------------


@register(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid
    FROM events
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-F6: parse the reference's JSON wire format back into columns —
    the inverse of q_to_json (SURVEY.md §2A wire-note). get_json_object
    extracts by JSONPath; the typed form is from_json with an explicit
    schema (used in the streaming replay source)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        F.when(
            F.from_json("props", "k INT").isNotNull(), 1
        ).otherwise(0).alias("is_valid"),
    )


# ---------------------------------------------------------------------------
# B-F7 — structs (nested-type construction / field access / row comparison)
# ---------------------------------------------------------------------------


@register(
    "q_fn_struct",
    oracle="""
    SELECT o_orderkey,
           struct_pack(k := o_custkey, v := o_totalprice).k AS cust_from_struct,
           struct_pack(k := o_custkey, v := o_totalprice).v AS price_from_struct,
           CASE WHEN row(o_custkey, o_totalprice) < row(o_orderkey, o_totalprice)
                THEN 1 ELSE 0 END AS struct_lt,
           struct_pack(outer_ := struct_pack(inner_ := o_orderpriority)).outer_.inner_
             AS nested_field
    FROM orders
    """,
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-F7: struct construction, field access, nested structs, and
    lexicographic row comparison. Struct cells themselves are never
    hashed (Arrow struct encodings differ across exporters — same
    doctrine as q_fn_map): every struct is built and then projected
    back to flat scalars, which exercises Catalyst's
    CreateNamedStruct/GetStructField pipeline while keeping the
    compare engine-neutral. Row comparison is lexicographic in both
    engines.

    100 TB plan: pure codegen projection — structs are Tungsten
    in-row layouts, no allocation beyond the output row, zero shuffle."""
    o = load(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_custkey").alias("k"), F.col("o_totalprice").alias("v")
    )
    nested = F.struct(
        F.struct(F.col("o_orderpriority").alias("inner_")).alias("outer_")
    )
    return o.select(
        "o_orderkey",
        s.getField("k").alias("cust_from_struct"),
        s.getField("v").alias("price_from_struct"),
        F.when(
            F.struct("o_custkey", "o_totalprice")
            < F.struct("o_orderkey", "o_totalprice"),
            1,
        )
        .otherwise(0)
        .alias("struct_lt"),
        nested.getField("outer_").getField("inner_").alias("nested_field"),
    )


# ---------------------------------------------------------------------------
# B-F8 — bitwise operations
# ---------------------------------------------------------------------------


@register(
    "q_fn_bitwise",
    oracle="""
    SELECT event_id,
           event_id & user_id AS b_and,
           event_id | user_id AS b_or,
           xor(event_id, user_id) AS b_xor,
           user_id << 3 AS shl3,
           event_id >> 2 AS shr2,
           CAST(bit_count(event_id) AS INT) AS popcount,
           ~user_id AS b_not
    FROM events
    """,
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-F8: AND/OR/XOR/shift/popcount/NOT over the two BIGINT id
    columns — the primitives under every hash/bucket/bitmask operator
    in this engine (LSH band packing, SimHash Hamming pieces, salt
    extraction). Two's-complement semantics agree across engines for
    the non-negative fixture ids and the NOT output.

    100 TB plan: single-instruction codegen intrinsics; zero shuffle."""
    e = load(spark, sf_dir, "events")
    eid, uid = F.col("event_id"), F.col("user_id")
    return e.select(
        "event_id",
        eid.bitwiseAND(uid).alias("b_and"),
        eid.bitwiseOR(uid).alias("b_or"),
        eid.bitwiseXOR(uid).alias("b_xor"),
        F.shiftleft(uid, 3).alias("shl3"),
        F.shiftright(eid, 2).alias("shr2"),
        F.bit_count(eid).alias("popcount"),
        F.bitwise_not(uid).alias("b_not"),
    )


# ---------------------------------------------------------------------------
# B-F9 — interval / timestamp arithmetic (complements q_fn_date's
# date-level functions with sub-day event-time math)
# ---------------------------------------------------------------------------


@register(
    "q_fn_interval",
    oracle="""
    SELECT event_id,
           CAST(ts AS TIMESTAMP) + INTERVAL 90 MINUTE AS ts_plus_90m,
           CAST(ts AS TIMESTAMP) - INTERVAL 36 HOUR AS ts_minus_36h,
           CAST(date_diff('second', date_trunc('day', CAST(ts AS TIMESTAMP)),
                          CAST(ts AS TIMESTAMP)) AS BIGINT) AS secs_into_day,
           strftime(date_trunc('week', CAST(ts AS TIMESTAMP)), '%Y-%m-%d')
             AS week_start,
           strftime(last_day(CAST(ts AS DATE)), '%Y-%m-%d') AS month_end,
           CAST(date_diff('day', CAST(ts AS TIMESTAMP),
                          TIMESTAMP '2024-02-01') AS BIGINT) AS days_to_feb
    FROM events
    """,
)
def q_fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-F9: interval add/subtract, seconds-into-day, ISO week start,
    month end, and day-boundary diff on microsecond event timestamps —
    the sub-day time math q_fn_date leaves out. Parity notes:
    ``secs_into_day`` is a difference of second-floors, which equals
    the floored difference because midnight carries zero microseconds;
    ``date_trunc('week')`` is Monday-based in both engines (date-level
    outputs are projected to ISO day strings — DATE cells render
    differently across the two Arrow exporters);
    ``date_diff('day')`` counts day-boundary crossings, which equals
    Spark's date-cast ``datediff``.

    100 TB plan: codegen'd long arithmetic on the microsecond epoch —
    no shuffle, no Python, scan-speed."""
    e = load(spark, sf_dir, "events")
    ts = F.col("ts")
    return e.select(
        "event_id",
        (ts + F.expr("INTERVAL 90 MINUTES")).alias("ts_plus_90m"),
        (ts - F.expr("INTERVAL 36 HOURS")).alias("ts_minus_36h"),
        (
            F.unix_timestamp(ts) - F.unix_timestamp(F.date_trunc("day", ts))
        ).alias("secs_into_day"),
        F.date_format(F.date_trunc("week", ts), "yyyy-MM-dd").alias(
            "week_start"
        ),
        F.date_format(F.last_day(ts.cast("date")), "yyyy-MM-dd").alias(
            "month_end"
        ),
        F.datediff(F.lit("2024-02-01").cast("date"), ts.cast("date"))
        .cast("long")
        .alias("days_to_feb"),
    )


# ---------------------------------------------------------------------------
# B-F10 — conditional / null-handling functions
# ---------------------------------------------------------------------------


@register(
    "q_fn_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none,
           NULLIF(CAST(l_quantity AS BIGINT), 0) AS qty_nonzero,
           LEAST(CAST(l_quantity AS BIGINT), 25) AS qty_capped,
           GREATEST(CAST(l_quantity AS BIGINT), 10) AS qty_floored,
           CASE WHEN l_discount BETWEEN 0.05 AND 0.07 THEN 'mid'
                WHEN l_discount < 0.05 THEN 'low' ELSE 'high' END
             AS disc_band,
           CAST(l_returnflag = 'R' AS INT) AS is_return
    FROM lineitem
    """,
)
def q_fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-F10: NULLIF/COALESCE/LEAST/GREATEST/multi-branch CASE and a
    boolean-to-int projection — the null-handling family every ETL
    projection leans on (B-P2 covers the two-branch CASE; this row
    covers the null-generating and null-absorbing forms). LEAST and
    GREATEST on exact integers avoid any float-comparison ambiguity.

    100 TB plan: pure codegen conditionals — branch-predictable, zero
    shuffle, scan-speed."""
    l = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(
            F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")
        ).alias("flag_or_none"),
        F.nullif(qty, F.lit(0)).alias("qty_nonzero"),
        F.least(qty, F.lit(25)).alias("qty_capped"),
        F.greatest(qty, F.lit(10)).alias("qty_floored"),
        F.when(F.col("l_discount").between(0.05, 0.07), "mid")
        .when(F.col("l_discount") < 0.05, "low")
        .otherwise("high")
        .alias("disc_band"),
        (F.col("l_returnflag") == "R").cast("int").alias("is_return"),
    )


# ---------------------------------------------------------------------------
# B-F11 — array higher-order functions (lambda forms)
# ---------------------------------------------------------------------------


@register(
    "q_fn_array_hof",
    oracle=r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\s+'),
                                x -> len(x) > 5)) AS INT) AS long_toks,
           CAST(list_sum(list_transform(string_split_regex(text, '\s+'),
                                        x -> len(x))) AS BIGINT)
             AS total_chars,
           CASE WHEN len(list_filter(string_split_regex(text, '\s+'),
                                     x -> x = 'spark')) > 0
                THEN 1 ELSE 0 END AS has_spark,
           array_to_string(list_transform(string_split_regex(text, '\s+')[1:3],
                                          x -> upper(x)), '|') AS head_upper
    FROM documents
    """,
)
def q_fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-F11: array higher-order functions — ``transform``, ``filter``,
    ``aggregate`` (fold), ``exists``, and slicing, the lambda forms
    q_fn_array's element-level functions leave out. The fold sums
    INTEGER lengths, so the cross-engine comparison is exact.

    100 TB note: HOF lambdas are interpreted per element in Spark
    (no codegen) — fine for short arrays in a projection; the fused
    Arrow passes (text.py, dedup.py) are the documented escape hatch
    when a HOF chain over long arrays becomes the hot path (measured
    repeatedly in BENCH_NOTES). The split-recovery repartition fans
    the near-unsplittable fixture file out before the interpreted
    lambdas (3.1 s → ~1 s at sf1); delete it for multi-split input."""
    d = load(spark, sf_dir, "documents").transform(
        split_recovery(spark, sf_dir, "documents")
    )
    toks = F.split(F.col("text"), WS_PATTERN)
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).alias("long_toks"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.exists(toks, lambda x: x == F.lit("spark"))
        .cast("int")
        .alias("has_spark"),
        F.array_join(
            F.transform(F.slice(toks, 1, 3), lambda x: F.upper(x)), "|"
        ).alias("head_upper"),
    )


# ---------------------------------------------------------------------------
# q_fn_url — URL construction / parsing family
# ---------------------------------------------------------------------------


@register(
    "q_fn_url",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.org/docs/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang
               || '&n=' || CAST(n_chars AS VARCHAR) AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS q_lang,
           regexp_extract(
             regexp_extract(url, '^[a-z]+://([^/?#]+)', 1),
             '([^.]+\\.[^.]+)$', 1) AS domain
    FROM u
    """,
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family — the web-pipeline staple (URL-keyed dedup,
    domain filtering/blocklists, per-site mixture weights all start by
    splitting a URL into components). The URL is constructed
    deterministically from fixture columns (documents has no url
    column), then decomposed with Spark's builtin ``parse_url``
    (protocol / host / path / single query parameter) plus a
    registrable-domain suffix extraction — all codegen'd JVM
    expressions, shuffle-free projection. The oracle mirrors each
    component with regexes, pinning ``parse_url``'s semantics.
    """
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars").cast("string"),
    )
    d = d.select("doc_id", url.alias("url"))
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    return d.select(
        "doc_id",
        "url",
        F.lower(F.parse_url(F.col("url"), F.lit("PROTOCOL"))).alias("proto"),
        host.alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias(
            "q_lang"
        ),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1).alias("domain"),
    )


# ---------------------------------------------------------------------------
# q_fn_binary — hash / encode / decode family
# ---------------------------------------------------------------------------


@register(
    "q_fn_binary",
    oracle="""
    SELECT p_partkey,
           md5(p_name) AS name_md5,
           sha256(p_name) AS name_sha256,
           to_base64(CAST(p_name AS BLOB)) AS name_b64,
           hex(p_brand) AS brand_hex,
           bit_length(p_name) AS name_bits,
           octet_length(CAST(p_name AS BLOB)) AS name_bytes,
           CAST(from_base64(to_base64(CAST(p_name AS BLOB))) AS VARCHAR)
             = p_name AS b64_roundtrip
    FROM part
    """,
)
def q_fn_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash / encode / decode scalar family — content hashing (md5 /
    sha256: the dedup and split keys), transport encoding (base64 /
    hex) and byte-length introspection, with a base64 round-trip
    proving decode inverts encode. All codegen JVM intrinsics in a
    shuffle-free projection; both engines emit lowercase hex digests
    and RFC 4648 base64 so the strings hash identically."""
    p = load(spark, sf_dir, "part")
    b64 = F.base64(F.col("p_name").cast("binary"))
    return p.select(
        "p_partkey",
        F.md5(F.col("p_name")).alias("name_md5"),
        F.sha2(F.col("p_name"), 256).alias("name_sha256"),
        b64.alias("name_b64"),
        F.hex(F.col("p_brand")).alias("brand_hex"),
        F.bit_length(F.col("p_name")).alias("name_bits"),
        F.octet_length(F.col("p_name")).alias("name_bytes"),
        (F.unbase64(b64).cast("string") == F.col("p_name")).alias(
            "b64_roundtrip"
        ),
    )


# ---------------------------------------------------------------------------
# q_fn_timezone — timezone conversion family
# ---------------------------------------------------------------------------


@register(
    "q_fn_timezone",
    oracle="""
    WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
    SELECT event_id, ts,
           ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York' AS ts_nyc,
           ts AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo' AS ts_tokyo,
           CAST(EXTRACT(hour FROM ts AT TIME ZONE 'UTC'
                        AT TIME ZONE 'America/New_York') AS INT)
             AS hour_nyc,
           CAST(date_trunc('day', ts AT TIME ZONE 'UTC'
                           AT TIME ZONE 'Asia/Tokyo') AS TIMESTAMP)
             AS day_tokyo
    FROM e
    """,
)
def q_fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion family: the fixture's UTC event times
    rendered as New York / Tokyo wall-clock, with local hour
    extraction and a local-midnight day boundary — the global-rollup
    primitive (a "daily" aggregate keyed on the *viewer's* day needs
    the local truncation, not UTC's). ``convert_timezone`` is a
    codegen'd offset lookup against the JVM tzdb; DuckDB's
    ``AT TIME ZONE`` chain consults ICU — both resolve the same IANA
    zone names, pinned by the hash compare. Shuffle-free projection."""
    e = load(spark, sf_dir, "events")
    nyc = F.convert_timezone(F.lit("UTC"), F.lit("America/New_York"), F.col("ts"))
    tokyo = F.convert_timezone(F.lit("UTC"), F.lit("Asia/Tokyo"), F.col("ts"))
    return e.select(
        "event_id",
        "ts",
        nyc.alias("ts_nyc"),
        tokyo.alias("ts_tokyo"),
        F.hour(nyc).alias("hour_nyc"),
        F.date_trunc("day", tokyo).alias("day_tokyo"),
    )


# ---------------------------------------------------------------------------
# q_fn_variant — semi-structured VARIANT type (parse / typed extract)
# ---------------------------------------------------------------------------


@register(
    "q_fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k,
           CAST(json_extract_string(
             json_object('event_type', event_type, 'value', value),
             '$.event_type') AS VARCHAR) AS etype,
           CAST(json_extract(
             json_object('event_type', event_type, 'value', value),
             '$.value') AS DOUBLE) AS val,
           CAST(NULL AS INT) AS missing
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INT) % 3 = 0
    """,
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): the ``props`` JSON
    column parsed once into the binary VARIANT encoding, then typed
    path extraction (``variant_get``), a predicate pushed against a
    variant field, and graceful missing-path access
    (``try_variant_get`` → NULL, never an error). VARIANT is the scale
    story for schema-drifting payloads — parse once at ingest, store
    shredded binary, extract fields without per-query JSON re-parsing
    (contrast q_fn_json's string-path get_json_object). The oracle
    mirrors every extraction with DuckDB's JSON operators; the double
    survives the JSON round-trip exactly on both engines
    (shortest-repr serialization)."""
    e = load(spark, sf_dir, "events")
    out = e.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
        F.expr(
            "variant_get(parse_json(to_json(struct(event_type, value))),"
            " '$.event_type', 'string')"
        ).alias("etype"),
        F.expr(
            "variant_get(parse_json(to_json(struct(event_type, value))),"
            " '$.value', 'double')"
        ).alias("val"),
        F.expr(
            "try_variant_get(parse_json(props), '$.missing', 'int')"
        ).alias("missing"),
    )
    return out.filter(F.col("k") % 3 == 0)


# ---------------------------------------------------------------------------
# q_fn_regex — regular-expression function surface (round 4)
# ---------------------------------------------------------------------------


@register(
    "q_fn_regex",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[aeiou]{2,}')) AS BIGINT)
             AS n_vowel_runs,
           regexp_extract(text, '([a-z]{8,})', 1) AS first_long_word,
           CAST(length(regexp_replace(text, '[aeiou]+', '#', 'g'))
                AS BIGINT) AS squeezed_len,
           CAST(CASE WHEN regexp_matches(text, 'ing ') THEN 1 ELSE 0 END
                AS BIGINT) AS has_ing
    FROM documents
    WHERE doc_id < 2000
    """,
)
def q_fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function surface — count (regexp_count), extract
    (regexp_extract), global replace (regexp_replace), and boolean
    match (rlike), the four regex verbs every log/text pipeline uses.
    Patterns are chosen engine-portable: character classes and greedy
    quantifiers behave identically under Java regex and RE2, and the
    extract falls back to '' on no-match on both engines (the
    q_text_normalize portability rule). One codegen projection —
    regexes never leave whole-stage codegen, no UDF."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit("[aeiou]{2,}"))
        .cast("long")
        .alias("n_vowel_runs"),
        F.regexp_extract("text", "([a-z]{8,})", 1).alias(
            "first_long_word"
        ),
        F.length(F.regexp_replace("text", "[aeiou]+", "#"))
        .cast("long")
        .alias("squeezed_len"),
        F.when(F.col("text").rlike("ing "), 1)
        .otherwise(0)
        .cast("long")
        .alias("has_ing"),
    )
