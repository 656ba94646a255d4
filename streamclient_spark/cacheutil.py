"""Session cache hygiene for query builders that persist intermediates.

Several dedup/similarity builders ``persist()`` a shared subtree (the
shingle-profile table, the near-dup edge list, the SimHash band table)
because Spark does not common-subexpression-eliminate across DataFrame
branches. A builder cannot unpersist after "the final action" — the
action belongs to the caller (driver harness / bench / tests). Instead,
persisted frames register here and every registered *builder entry
point* releases the previous query's caches on entry, so cached blocks
never accumulate across a 100+-query run; at most one query's working
set is resident (ADVICE r1: unbounded cache growth across the bench/
driver/pytest session).

Two retention classes:

- **Unkeyed** (``managed_persist(df)``): working-set intermediates.
  Dropped by the next builder's :func:`release_managed` call.
- **Keyed** (``managed_persist(df, key=...)``): small shared *indexes*
  — e.g. the verified near-dup pair list that both ``q_dedup_near``
  and ``q_dedup_cluster`` derive from. A second registration under the
  same key returns the already-persisted frame (cross-query reuse: the
  LSH+verify pipeline runs once per session, not once per consumer —
  the in-session analog of materializing the dedup index to storage).
  Keyed entries survive :func:`release_managed` — they must be
  bounded (pair lists, codebooks: O(pairs)/O(k) rows, never O(corpus)
  payloads) — and fall only to :func:`release_all`.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

_MANAGED: list[tuple[Optional[str], DataFrame]] = []


def managed_persist(df: DataFrame, key: Optional[str] = None) -> DataFrame:
    """Persist ``df`` and register it. With a ``key``, a prior
    registration under the same key wins: the already-cached frame is
    returned and ``df`` is discarded unevaluated."""
    if key is not None:
        for k, cached in _MANAGED:
            if k == key:
                return cached
    df.persist()
    _MANAGED.append((key, df))
    return df


def cached_frame(key: str) -> Optional[DataFrame]:
    """Return the keyed shared index if registered, else None."""
    for k, cached in _MANAGED:
        if k == key:
            return cached
    return None


def release_managed() -> None:
    """Unpersist every *unkeyed* frame (non-blocking). Called at the
    top of each cache-using query builder — releasing the *previous*
    query's working set, whose actions have completed by then. Keyed
    shared indexes are retained for cross-query reuse."""
    kept: list[tuple[Optional[str], DataFrame]] = []
    for k, df in _MANAGED:
        if k is not None:
            kept.append((k, df))
            continue
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped; nothing to release
    _MANAGED[:] = kept


def release_all() -> None:
    """Unpersist everything, keyed indexes included (end-of-session /
    test teardown)."""
    while _MANAGED:
        _, df = _MANAGED.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass
