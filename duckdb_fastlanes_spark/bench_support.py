"""Persist tracking for honest benchmarking.

Some queries materialize a shared intermediate via ``DataFrame.persist``
(e.g. ``dedup_minhash_lsh``'s per-doc shingle/minhash aggregate — one
materialization feeding two consumers is the *correct plan*, at sf0.01 and
at 100 TB alike). That is fine for a production run, but a benchmark that
times N repeated executions of the same query must not let run ``i+1``
reuse run ``i``'s materialized intermediate: Spark's CacheManager dedupes
by logical plan, so even REBUILDING the DataFrame from scratch silently
resolves to the already-cached InMemoryRelation. The only way to make
repeated runs recompute is an explicit ``unpersist`` between runs.

Queries route their persists through :func:`managed_persist`; the bench
calls :func:`drain_persists` between timed runs so every timed execution
pays the full cost of building the intermediate, exactly like the DuckDB
oracle recomputing its CTE per ``con.execute``.

Deliberately NOT tracked: ``catalog.warm_cache``'s table pins — those are
the engine's buffer pool, the steady-state analogue of DuckDB reading
warm OS page cache, and identical for every run of every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# DataFrames persisted by query bodies since the last drain. A plain list:
# the same logical plan re-registered twice is harmless (unpersist is
# idempotent) and order does not matter.
_TRACKED: list[DataFrame] = []

# Streaming-drain executions since the last reset. A drain-style query
# (availableNow drain / foreachBatch upsert) does ALL its work at
# DataFrame CONSTRUCTION and returns a handle over the already-written
# sink output — a "prepared" re-execution of that handle would time a
# batch read of precomputed results against a DuckDB baseline that
# recomputes the query per run. The bench uses this counter the same way
# it uses the persist tracker: fired-at-construction ⇒ no honest prepared
# number ⇒ fall back to the constructed discipline.
_DRAINS: int = 0


def note_drain() -> None:
    """Record that a streaming drain executed (called by the drain paths
    in streaming/events.py and any other construct-time executors)."""
    global _DRAINS
    _DRAINS += 1


def reset_drains() -> int:
    """Zero the drain counter; returns how many drains had fired."""
    global _DRAINS
    n = _DRAINS
    _DRAINS = 0
    return n


def managed_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist(level)`` + register the handle for ``drain_persists``."""
    df = df.persist(storage_level) if storage_level is not None else df.persist()
    _TRACKED.append(df)
    return df


def drain_persists(blocking: bool = True) -> int:
    """Unpersist every tracked intermediate; returns how many were dropped.

    Uses ``DataFrame.unpersist`` (→ CacheManager.uncacheQuery) so the plan
    is removed from the cache registry, not just evicted — the next
    ``persist`` on an equal plan re-registers and re-materializes.
    """
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:
            pass  # session already stopped — nothing to drop
    return n
