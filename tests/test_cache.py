"""Tracked-persist registry: operator caches are released on demand."""

from __future__ import annotations

import pandas as pd

from acoustic_feature_extractor_spark.operators.dedup import minhash_lsh_pairs
from acoustic_feature_extractor_spark.plans.cache import (
    release_persisted,
    tracked_persist,
)


def _cached_ids(spark) -> set[int]:
    jsc = spark.sparkContext._jsc.sc()
    return {
        rinfo.id()
        for rinfo in jsc.getRDDStorageInfo()
        if rinfo.numCachedPartitions() > 0
    }


def test_release_persisted_unpersists(spark):
    release_persisted()  # start clean
    df = tracked_persist(spark.range(100))
    assert df.count() == 100
    assert df.storageLevel.useMemory
    assert release_persisted() >= 1
    assert not df.storageLevel.useMemory
    # idempotent, empty registry
    assert release_persisted() == 0


def test_operator_caches_are_tracked(spark):
    """minhash_lsh_pairs persists shingle+signature tables internally;
    release_persisted() must reclaim them after materialization."""
    release_persisted()
    # other modules in this shared session may hold localCheckpoint RDDs
    # — assert on the DELTA, not a globally empty cache
    before = _cached_ids(spark)
    docs = spark.createDataFrame(
        pd.DataFrame(
            [(i, f"doc {i} alpha beta gamma delta epsilon zeta") for i in range(20)],
            columns=["doc_id", "text"],
        )
    )
    minhash_lsh_pairs(docs, threshold=0.5).collect()
    assert release_persisted() >= 2  # shingle table + signature table
    assert _cached_ids(spark) <= before
