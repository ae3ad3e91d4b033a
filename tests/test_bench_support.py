"""The bench's persist-drain protocol: the honesty mechanism behind the
constructed-mode timings (no materialized intermediate survives between
timed runs) must itself be correct."""

from __future__ import annotations

from pyspark import StorageLevel

from duckdb_fastlanes_spark.bench_support import drain_persists, managed_persist


def test_drain_unpersists_tracked(spark):
    drain_persists()  # clear persists other test modules may have tracked
    df = spark.range(1000).selectExpr("id", "id * 2 AS v")
    df = managed_persist(df, StorageLevel.MEMORY_AND_DISK)
    df.count()  # materialize
    assert df.storageLevel.useMemory
    assert drain_persists() == 1
    assert not df.storageLevel.useMemory  # uncached for real
    assert drain_persists() == 0  # tracker emptied


def test_cachemanager_dedupe_requires_explicit_drain(spark):
    """The reason drain_persists exists: rebuilding an equal plan and
    persisting again resolves to the ALREADY-cached data (CacheManager
    dedupes by logical plan) — so without an explicit unpersist a
    'rebuilt' benchmark run would silently reuse the materialization."""

    def build():
        return spark.range(500).selectExpr("id", "id % 7 AS k")

    a = managed_persist(build())
    a.count()
    # an equal plan reports as cached without any persist call of its own
    rebuilt = build()
    assert spark._jsparkSession.sharedState().cacheManager().lookupCachedData(
        rebuilt._jdf
    ).isDefined()
    drain_persists()
    assert not spark._jsparkSession.sharedState().cacheManager().lookupCachedData(
        rebuilt._jdf
    ).isDefined()


def test_drain_survives_already_unpersisted(spark):
    df = managed_persist(spark.range(10))
    df.unpersist(blocking=True)  # user already dropped it
    assert drain_persists() >= 0  # no raise, tracker drains
