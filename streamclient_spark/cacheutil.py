"""Session cache hygiene for query builders that persist intermediates.

Several dedup/similarity builders ``persist()`` a shared subtree (the
shingle-profile table, the near-dup edge list, the SimHash band table)
because Spark does not common-subexpression-eliminate across DataFrame
branches. A builder cannot unpersist after "the final action" — the
action belongs to the caller (driver harness / bench / tests). Instead,
persisted frames register here and every registered *builder entry
point* releases the previous query's caches on entry, so cached blocks
never accumulate across a 73-query run; at most one query's working
set is resident (ADVICE r1: unbounded cache growth across the bench/
driver/pytest session).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_MANAGED: list[DataFrame] = []


def managed_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for release by the next
    :func:`release_managed` call."""
    df.persist()
    _MANAGED.append(df)
    return df


def release_managed() -> None:
    """Unpersist every registered frame (non-blocking). Called at the
    top of each cache-using query builder — releasing the *previous*
    query's caches, whose actions have completed by then."""
    while _MANAGED:
        df = _MANAGED.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped; nothing to release
