"""Tracked persistence: operator-internal caches with an explicit release.

Several operators persist an intermediate that multiple branches of the
returned plan re-read (minhash's shared shingle table, the chunked
weighted-percentile cumsum, simhash fingerprints, the PPJoin prefix
table). The persist is load-bearing — without it the expensive parent
recomputes per branch — but the handle is internal, so the caller can't
unpersist it and Spark's CacheManager keeps the entry alive for the
session (LRU eviction under memory pressure is the only backstop).

This module makes the lifetime explicit without polluting operator
signatures: operators call :func:`tracked_persist` instead of
``df.persist()``; a long-lived driver (the resumable jobs, bench.py)
calls :func:`release_persisted` at stage boundaries, after the consuming
action has materialized. One-shot scripts may ignore it — process exit
releases everything — and ``spark.catalog.clearCache()`` remains the
big-hammer alternative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# strong refs on purpose: a JVM-side cache entry outlives the Python
# DataFrame object (CacheManager keys on the analyzed plan), so a weak
# registry would drop the only handle able to unpersist it.
_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` plus registration for :func:`release_persisted`."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every tracked intermediate; returns how many were
    released. Safe to call at any stage boundary — plans already
    materialized keep their results, plans not yet run simply recompute
    the (cheap relative to a leak) parent."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
