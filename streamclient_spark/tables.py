"""Fixture-table catalog: parquet loaders for the driver test tables.

Tables (TESTDATA.md / FIXTURES.md §A): ``region nation customer
supplier part orders lineitem events documents embeddings`` — one
parquet per table under ``/root/testdata/sf*/``.

At the 100 TB design point each of these would be a partitioned /
bucketed table (lineitem bucketed by ``l_orderkey``, orders by
``o_orderkey``, events hash-distributed by key and range-partitioned by
event-time day); the loaders stay the same shape — ``spark.read`` with
schema-on-read and Catalyst pushdown — only the storage layout changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables that are safe to broadcast-hint unconditionally: fixed-size
# at every scale factor (region = 5 rows, nation = 25 rows).  Everything
# else — including customer/supplier/part — grows linearly with SF and
# must NOT carry a hard broadcast hint: at the 100 TB design point they
# are hundreds of GB and a forced broadcast would OOM every executor.
# Size-based upgrades are left to Catalyst/AQE — or to the size-GATED
# hint below, which only fires when Catalyst's own static estimate says
# the input is small, and degrades to "no hint, AQE decides" otherwise.
BROADCAST_DIMS = frozenset({"region", "nation"})

# Raw-bytes ceiling for broadcast_if_small(): the bounding table's
# on-disk parquet size. Raw table bytes are a sound UPPER bound for
# any input derived from it by filters / projections / unique-key
# joins (each only drops rows or columns), so a gate on them can only
# err toward "no hint" — the OOM-safe direction. 32 MB keeps the
# measured sf1 wins (orders.parquet at sf1 is 28.6 MB) and drops every
# hint at sf10+, where AQE's runtime-measured decision takes over.
# (First design used Catalyst's optimizedPlan().stats() estimate —
# principled, but a fresh-plan analysis+optimize round-trip costs
# ~150 ms per call, a real per-query adder at bench granularity; the
# file stat is ~10 µs and equally sound.)
BROADCAST_HINT_MAX_BYTES = 32 << 20


def broadcast_if_small(df: DataFrame, sf_dir: str, bound: str) -> DataFrame:
    """Broadcast-hint ``df`` only while the fixture table that bounds
    it stays under :data:`BROADCAST_HINT_MAX_BYTES` on disk; otherwise
    return ``df`` unhinted and let AQE pick the join strategy from
    runtime stats.

    This is the BROADCAST_DIMS policy extended to *derived* inputs
    (filtered dims, key-join reductions): the hint expresses where AQE
    lands anyway at fixture scales — skipping the static SMJ's
    materialized fact exchange — but unlike a bare ``F.broadcast()``
    it comes off BY CONSTRUCTION once the bounding table outgrows the
    ceiling, so a 100 TB run can never force-broadcast a fact-scaled
    table (ADVICE r9, medium).

    ``bound``: the table whose raw bytes dominate ``df``. Soundness is
    the caller's semantic knowledge: ``df`` must derive from ``bound``
    by filters, projections, and joins on ANOTHER table's unique key
    (at most one output row per ``bound`` row). A partitioned-directory
    table (the 100 TB layout) is measured by summing its member files
    with an early exit at the ceiling — a fact-scaled directory can
    never pass, a genuinely small dim laid out as a directory still
    gets the hint. A missing table degrades to no-hint — fail-safe.

    (VERDICT r10 #1: ``os.path.getsize`` on a DIRECTORY returns the
    inode size ~4 KB, not ``OSError``, so the first version of this
    gate would have force-broadcast a 100 TB ``lineitem.parquet/``
    directory — exactly the OOM it exists to prevent. Hence the
    explicit isfile/isdir split below.)
    """
    sz = _bounded_table_bytes(
        os.path.join(sf_dir, f"{bound}.parquet"), BROADCAST_HINT_MAX_BYTES
    )
    if sz is not None and sz <= BROADCAST_HINT_MAX_BYTES:
        from pyspark.sql.functions import broadcast

        return broadcast(df)
    return df


def _bounded_table_bytes(path: str, ceiling: int) -> int | None:
    """On-disk bytes of a parquet table at ``path`` — a single file or
    a (possibly nested, partitioned) directory — capped at ``ceiling``:
    the walk stops as soon as the running sum exceeds it, so a
    million-file fact directory costs O(few stats), not a full listing.
    Returns ``None`` (caller: no hint) when the path is missing or any
    stat fails mid-walk — errors always degrade toward "too big".
    """
    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        if not os.path.isdir(path):
            return None
        total = 0
        for root, _dirs, files in os.walk(path, onerror=lambda _e: None):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
                if total > ceiling:
                    return total
        return total
    except OSError:
        return None


def split_recovery(spark: SparkSession, sf_dir: str, bound: str):
    """Gate for the split-recovery ``repartition`` (ADVICE r10): the
    driver fixtures write each table as ONE parquet file with 1-2 row
    groups, so a scan yields 1-2 tasks no matter the core count and
    every CPU-bound fused-Arrow pass would run nearly serial. The
    recovery is a round-robin ``repartition(defaultParallelism)`` —
    but that exchange moves the whole column payload, which at the
    100 TB design point is exactly "the line you delete". This gate
    deletes it BY CONSTRUCTION: the repartition applies only while
    the bounding table's natural scan parallelism (per-file
    ``min(byte-splits, row-groups)``, footer-estimated with an early
    exit) stays below ``defaultParallelism``; a production table laid
    out as thousands of row-group splits passes the probe and the
    transform is the identity. Estimation errors degrade toward
    "repartition" — the fixture-correct, never-OOM direction.

    Usage keeps builder chains fluent::

        load(spark, sf_dir, "documents").transform(
            split_recovery(spark, sf_dir, "documents")
        )
    """

    def apply(df: DataFrame) -> DataFrame:
        p = spark.sparkContext.defaultParallelism
        path = os.path.join(sf_dir, f"{bound}.parquet")
        if _natural_splits(path, p, _max_partition_bytes(spark)) >= p:
            return df
        return df.repartition(p)

    return apply


def _max_partition_bytes(spark: SparkSession) -> int:
    """``spark.sql.files.maxPartitionBytes`` as an int (accepts the
    '134217728b' / '128m' spellings); falls back to the 128 MB
    default on anything unparseable."""
    import re

    try:
        raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes"))
        m = re.fullmatch(r"(\d+)\s*([kmgt]?)b?", raw.strip().lower())
        if m:
            return int(m.group(1)) << (
                {"": 0, "k": 10, "m": 20, "g": 30, "t": 40}[m.group(2)]
            )
    except Exception:
        pass
    return 128 << 20


def _iter_parquet_files(path: str):
    if os.path.isfile(path):
        yield path
        return
    for root, _dirs, files in os.walk(path, onerror=lambda _e: None):
        for f in files:
            if not f.startswith(("_", ".")):
                yield os.path.join(root, f)


def _natural_splits(path: str, need: int, max_partition_bytes: int) -> int:
    """Estimated useful scan parallelism of the parquet table at
    ``path``: per file, Spark plans ``ceil(bytes/maxPartitionBytes)``
    input splits but only row-group boundaries parallelize, so the
    useful count is the min of the two. Walks lazily and returns as
    soon as ``need`` is reached, so a million-file table costs O(need)
    footer reads, not a full listing. Unreadable footers count 1
    (underestimates → the caller repartitions → safe)."""
    import pyarrow.parquet as pq

    total = 0
    try:
        for f in _iter_parquet_files(path):
            byte_splits = max(
                1, -(-os.path.getsize(f) // max_partition_bytes)
            )
            try:
                row_groups = max(1, pq.ParquetFile(f).metadata.num_row_groups)
            except Exception:
                row_groups = 1
            total += min(byte_splits, row_groups)
            if total >= need:
                return total
    except OSError:
        return 0
    return total


#: parquet schema memo keyed on FILE IDENTITY (path, mtime_ns, size):
#: ``spark.read.parquet`` pays a ~100-130 ms driver-side schema
#: inference (footer fetch through Py4J) on EVERY call, and the bench
#: makes ~2 load() calls per query × 295 queries — ~60 s of pure
#: repeated inference per full run (guide §7.3, the round-11
#: build-time profile). Passing the remembered schema back via
#: ``spark.read.schema(...)`` skips inference and returns a FRESH
#: DataFrame (new expression IDs — self-joins of two load() results
#: stay unambiguous, unlike memoizing the DataFrame object itself).
#: The schema of a parquet file is a pure function of its bytes, so a
#: key that pins the file's identity cannot serve a stale schema
#: (ADVICE r4: a memo keyed on sf_dir alone survived fixture refresh);
#: a regenerated fixture changes mtime/size → new key → re-inference.
#: Directory-layout tables fall back to plain inference — fail-safe,
#: the broadcast_if_small posture.
_SCHEMA_MEMO: dict = {}


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    import stat as _stat

    try:
        st = os.stat(path)
        if not _stat.S_ISREG(st.st_mode):
            # directory layout (or special file): plain inference —
            # one stat total, not stat+isfile (ADVICE r11)
            return spark.read.parquet(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        return spark.read.parquet(path)
    sch = _SCHEMA_MEMO.get(key)
    if sch is None:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[key] = df.schema
        return df
    return spark.read.schema(sch).parquet(path)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (columnar parquet scan;
    Catalyst handles column pruning + predicate pushdown).

    ``events.ts`` is parquet ``TIMESTAMP(NANOS)``, which Spark's vectorized
    reader rejects outright (PARQUET_TYPE_ILLEGAL). We read it as raw
    nanos (legacy ``nanosAsLong`` conf) and truncate to a microsecond
    TimestampType — integer `div`, no double round-trip, so the value
    matches DuckDB's ``CAST(ts AS TIMESTAMP)`` exactly.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # The driver runs these builders in ITS OWN SparkSession; pin the
    # session confs correctness depends on (idempotent, runtime-settable).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        df = _read_parquet(spark, f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # driver fixture: TIMESTAMP(NANOS) surfaced as raw nanos
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        # regenerated fixtures (tools/make_bigsf.py) may carry a
        # timestamp type Spark reads natively; normalize NTZ → UTC
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return _read_parquet(spark, f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
