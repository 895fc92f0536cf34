"""Bounded scoped persistence for intermediate DataFrames.

Several helpers (``pairwise_grouped``, ``select_within_budget``,
``bm25_scores``) persist an intermediate DataFrame that is scanned more
than once inside the plan they return.  The caller materializes that
plan *after* the helper returns, so the helper itself cannot know when
it is safe to unpersist — and a long-lived session that calls such a
helper repeatedly would otherwise accumulate cached shuffle output
indefinitely (round-3 ADVICE items on export.py:94 / search.py:49).

:func:`scoped_persist` bounds that accumulation: each persisted frame
is registered in a FIFO of at most ``_CAP`` entries; registering a new
one evicts (unpersists, non-blocking) the oldest once the cap is hit.
By the time ``_CAP`` newer helper calls have happened, the older plans
have long been materialized, so eviction never causes recomputation in
the one-query-at-a-time usage every entry-point query has — and at
worst eviction costs a recompute, never a wrong answer.

:func:`release_caches` drops everything immediately (used by bench
harnesses between queries and by tests).
"""

from __future__ import annotations

from collections import deque

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_CAP = 8
_live: deque[DataFrame] = deque()

__all__ = ["scoped_persist", "release_caches"]


def scoped_persist(df: DataFrame,
                   level: StorageLevel = StorageLevel.MEMORY_AND_DISK
                   ) -> DataFrame:
    """Persist ``df`` and register it in the bounded FIFO; evicts the
    oldest registered frame beyond the cap."""
    df = df.persist(level)
    _live.append(df)
    while len(_live) > _CAP:
        old = _live.popleft()
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing to release
    return df


def release_caches() -> None:
    """Unpersist every registered frame now (non-blocking)."""
    while _live:
        df = _live.popleft()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass
