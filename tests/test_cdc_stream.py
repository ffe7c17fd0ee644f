"""Snapshot CDC as a Spark streaming source (Python DataSource API):
offsets are snapshot ids, partitions are changed dirs, batches must match
the batch read_changes semantics, and a checkpointed restart must resume
exactly-once from the committed snapshot id."""

from __future__ import annotations

import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from acoustic_feature_extractor_spark.sources import snapshots as snap
from acoustic_feature_extractor_spark.sources.cdc_stream import (
    _simple_to_ddl,
    net_changes,
    register_cdc_source,
)


def _mk_table(spark, path):
    d1 = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    )
    snap.commit(d1, path)  # sid 1
    d2 = spark.createDataFrame(pd.DataFrame({"k": [4, 5], "v": ["d", "e"]}))
    snap.commit(d2, path)  # sid 2
    up = spark.createDataFrame(pd.DataFrame({"k": [2, 6], "v": ["B", "f"]}))
    snap.merge_upsert(spark, up, path, key="k")  # sid 3: rewrites dir of k=2
    return path


def _drain(spark, path, name, **opts):
    register_cdc_source(spark)
    r = spark.readStream.format("snapshot_changes").option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    q = (
        r.load()
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_simple_to_ddl_nested():
    assert (
        _simple_to_ddl("struct<a:int,b:array<float>,c:struct<x:bigint,y:string>>")
        == "a int, b array<float>, c struct<x:bigint,y:string>"
    )


def test_full_history_replay_attributes_snapshots(spark):
    with tempfile.TemporaryDirectory() as d:
        path = _mk_table(spark, f"{d}/t")
        out = _drain(spark, path, "cdc_full").toPandas()
        # sid 1 and 2: pure inserts of their own rows
        s1 = out[out._snapshot_id == 1]
        assert set(s1.k) == {1, 2, 3} and (s1._change_type == "insert").all()
        s2 = out[out._snapshot_id == 2]
        assert set(s2.k) == {4, 5} and (s2._change_type == "insert").all()
        # sid 3 (CoW rewrite): raw dir-level changelog nets to the true diff
        s3 = out[out._snapshot_id == 3]
        raw = spark.createDataFrame(s3)
        netted = net_changes(raw).toPandas()
        got = set(
            netted[["k", "v", "_change_type"]].itertuples(index=False, name=None)
        )
        assert got == {
            (2, "b", "delete"),  # old version out
            (2, "B", "insert"),  # new version in
            (6, "f", "insert"),
        }
        # and agrees with the batch CDC between the same snapshots
        batch = snap.read_changes(spark, path, from_snapshot=2, to_snapshot=3)
        bt = {(r.k, r.v, r._change_type) for r in batch.collect()}
        assert got == bt


def test_from_snapshot_latest_sees_only_new_commits(spark):
    with tempfile.TemporaryDirectory() as d:
        path = _mk_table(spark, f"{d}/t")
        register_cdc_source(spark)
        q = (
            spark.readStream.format("snapshot_changes")
            .option("path", path)
            .option("from_snapshot", "latest")
            .load()
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("cdc_latest")
            .start()
        )
        try:
            q.processAllAvailable()
            assert spark.sql("SELECT * FROM cdc_latest").count() == 0
            d4 = spark.createDataFrame(pd.DataFrame({"k": [7], "v": ["g"]}))
            snap.commit(d4, path)  # sid 4
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM cdc_latest").collect()
        finally:
            q.stop()
        assert {(r.k, r._snapshot_id, r._change_type) for r in rows} == {
            (7, 4, "insert")
        }


def test_checkpoint_resume_exactly_once(spark):
    """A restarted query with the same checkpoint must NOT re-emit
    already-committed snapshots — offsets are snapshot ids."""
    with tempfile.TemporaryDirectory() as d:
        path = _mk_table(spark, f"{d}/t")
        register_cdc_source(spark)
        ckpt = f"{d}/ckpt"

        sink = f"{d}/sink"

        def start():
            # memory sink can't recover a checkpoint; the file sink can
            return (
                spark.readStream.format("snapshot_changes")
                .option("path", path)
                .load()
                .writeStream.outputMode("append")
                .option("checkpointLocation", ckpt)
                .format("parquet")
                .option("path", sink)
                .start()
            )

        q = start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        n_first = spark.read.parquet(sink).count()
        assert n_first > 0
        snap.commit(
            spark.createDataFrame(pd.DataFrame({"k": [9], "v": ["z"]})), path
        )  # sid 4
        q2 = start()
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        rows = spark.read.parquet(sink).collect()
        # the restart appended ONLY the new commit, never a replay of 1-3
        assert len(rows) == n_first + 1
        assert {(r.k, r._snapshot_id) for r in rows if r._snapshot_id == 4} == {(9, 4)}


def test_evolved_column_null_fill(spark):
    """Files written before an additive evolution stream back with the
    new column as NULL (same contract as the batch mergeSchema read)."""
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/t"
        snap.commit(
            spark.createDataFrame(pd.DataFrame({"k": [1], "v": ["a"]})), path
        )
        d2 = spark.createDataFrame(
            pd.DataFrame({"k": [2], "v": ["b"], "extra": [1.5]})
        )
        snap.commit(d2, path, evolve=True)
        out = _drain(spark, path, "cdc_evolve").toPandas().sort_values("k")
        assert out.extra.isna().tolist() == [True, False]
        assert out.extra.iloc[1] == pytest.approx(1.5)
