"""Snapshot-log table format: commits are atomic and versioned, time
travel reads exact historical file sets, rollback is metadata-only,
expire reclaims only unreferenced dirs."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from acoustic_feature_extractor_spark.sources import snapshots as snap


def _df(spark, ids):
    return spark.createDataFrame(pd.DataFrame({"id": list(ids), "v": [float(i) for i in ids]}))


def test_append_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    s1 = snap.commit(_df(spark, range(5)), t, lineage={"stage": "a"})
    s2 = snap.commit(_df(spark, range(5, 8)), t)
    assert (s1.rows, s2.rows) == (5, 3)
    assert snap.current_snapshot_id(t) == s2.snapshot_id
    assert snap.read(spark, t).count() == 8  # current = union of appends
    assert snap.read(spark, t, s1.snapshot_id).count() == 5  # time travel
    hist = snap.history(t)
    assert [h.operation for h in hist] == ["append", "append"]
    assert hist[1].parent_id == s1.snapshot_id
    assert hist[0].lineage == {"stage": "a"}


def test_overwrite_starts_fresh(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snap.commit(_df(spark, range(5)), t)
    s2 = snap.commit(_df(spark, range(100, 102)), t, operation="overwrite")
    assert snap.read(spark, t).count() == 2
    assert snap.read(spark, t, 1).count() == 5  # old version still readable
    assert s2.dirs == ["data/snap-2"]


def test_append_schema_mismatch_refused(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snap.commit(_df(spark, range(3)), t)
    other = spark.createDataFrame(pd.DataFrame({"x": [1]}))
    with pytest.raises(ValueError, match="schema mismatch"):
        snap.commit(other, t)
    snap.commit(other, t, operation="overwrite")  # evolution via overwrite
    assert snap.read(spark, t).columns == ["x"]


def test_rollback_metadata_only(spark, tmp_path):
    t = str(tmp_path / "tbl")
    s1 = snap.commit(_df(spark, range(4)), t)
    snap.commit(_df(spark, range(4, 9)), t)
    s3 = snap.rollback(t, s1.snapshot_id)
    assert snap.read(spark, t).count() == 4  # current == rolled-back set
    assert s3.operation == "rollback"
    # nothing deleted: the rolled-back-over snapshot is still readable
    assert snap.read(spark, t, 2).count() == 9


def test_expire_reclaims_unreferenced_and_orphans(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snap.commit(_df(spark, range(3)), t)
    snap.commit(_df(spark, range(3, 5)), t, operation="overwrite")
    # orphan from a "crashed commit": data dir with no log entry
    os.makedirs(os.path.join(t, "data/snap-99"))
    deleted = snap.expire(t, keep_last=1)
    assert set(deleted) == {"data/snap-1", "data/snap-99"}
    assert snap.read(spark, t).count() == 2
    with pytest.raises(KeyError, match="expired"):
        snap.read(spark, t, 1)


def test_crashed_commit_invisible(spark, tmp_path):
    """Data-dir-written-but-log-not-published must not change what
    readers see (the commit order guarantees this)."""
    t = str(tmp_path / "tbl")
    snap.commit(_df(spark, range(3)), t)
    # simulate the crash: write a data dir exactly where snap 2 would go,
    # but never publish the log
    _df(spark, range(100)).write.parquet(os.path.join(t, "data/snap-2"))
    assert snap.current_snapshot_id(t) == 1
    assert snap.read(spark, t).count() == 3


def test_merge_upsert_copy_on_write(spark, tmp_path):
    """MERGE rewrites only the dirs holding matched keys: updates to
    snap-1 keys must carry the snap-2 dir BY REFERENCE, update matched
    rows, insert new keys, and keep the pre-merge snapshot time-travelable."""
    t = str(tmp_path / "tbl")
    snap.commit(_df(spark, range(5)), t)  # snap-1: ids 0..4
    snap.commit(_df(spark, range(100, 105)), t)  # snap-2: ids 100..104
    upd = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 999], "v": [-1.0, -2.0, -999.0]})
    )
    s3 = snap.merge_upsert(spark, upd, t, key="id")
    assert s3.operation == "merge"
    assert s3.lineage["rewritten_dirs"] == ["data/snap-1"]
    assert "data/snap-2" in s3.dirs  # untouched dir carried by reference
    # rows = rows THIS snapshot wrote (commit convention): 3 survivors of
    # snap-1 (ids 0,3,4) + 2 updates + 1 insert
    assert s3.rows == 6
    got = {r["id"]: r["v"] for r in snap.read(spark, t).collect()}
    assert len(got) == 11
    assert got[1] == -1.0 and got[2] == -2.0 and got[999] == -999.0
    assert got[0] == 0.0 and got[100] == 100.0
    # pre-merge snapshot unchanged
    old = {r["id"]: r["v"] for r in snap.read(spark, t, 2).collect()}
    assert old[1] == 1.0 and 999 not in old


def test_merge_upsert_guards(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snap.commit(_df(spark, range(3)), t)
    dup = spark.createDataFrame(pd.DataFrame({"id": [1, 1], "v": [0.0, 1.0]}))
    with pytest.raises(ValueError, match="duplicate keys"):
        snap.merge_upsert(spark, dup, t, key="id")
    other = spark.createDataFrame(pd.DataFrame({"x": [1]}))
    with pytest.raises(ValueError, match="schema mismatch"):
        snap.merge_upsert(spark, other, t, key="x")
    # NULL keys can never equi-join: refusing beats silently duplicating
    nulls = spark.createDataFrame(
        pd.DataFrame({"id": pd.array([None], dtype="Int64"), "v": [0.0]})
    )
    with pytest.raises(ValueError, match="NULL key"):
        snap.merge_upsert(spark, nulls, t, key="id")


def test_merge_upsert_pure_insert(spark, tmp_path):
    """No matched keys: every existing dir is carried by reference and the
    new dir holds exactly the inserts."""
    t = str(tmp_path / "tbl")
    snap.commit(_df(spark, range(4)), t)
    s2 = snap.merge_upsert(spark, _df(spark, range(10, 12)), t, key="id")
    assert s2.lineage["rewritten_dirs"] == []
    assert s2.dirs == ["data/snap-1", "data/snap-2"]
    assert snap.read(spark, t).count() == 6


def test_compact_preserves_rows_and_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for lo in (0, 10, 20):
        snap.commit(_df(spark, range(lo, lo + 5)), t)
    head = snap.history(t)[-1]
    s4 = snap.compact(spark, t, partitions=1)
    assert s4.operation == "compact" and s4.dirs == ["data/snap-4"]
    assert s4.rows == 15  # snapshot.rows = rows this snapshot wrote
    assert sorted(r["id"] for r in snap.read(spark, t).collect()) == list(range(0, 5)) + list(range(10, 15)) + list(range(20, 25))
    # time travel across the compaction still resolves the old dir set
    assert snap.read(spark, t, head.snapshot_id).count() == 15
    # expire reclaims the compacted-away dirs
    deleted = snap.expire(t, keep_last=1)
    assert set(deleted) == {"data/snap-1", "data/snap-2", "data/snap-3"}
    assert snap.read(spark, t).count() == 15
    # compacting a single-dir table is a no-op returning the head…
    assert snap.compact(spark, t).snapshot_id == s4.snapshot_id
    # …unless an explicit file count is requested (one dir can still hold
    # many small files from a wide write)
    s5 = snap.compact(spark, t, partitions=1)
    assert s5.snapshot_id == s4.snapshot_id + 1
    assert snap.read(spark, t).count() == 15


def test_job_snapshot_resume_equals_single_shot(tmp_path, spark):
    """--snapshots mode: crash-resume driven by the snapshot LOG (drop the
    last two committed snapshots = the data those buckets wrote is gone
    from every reader's view) must reproduce the single-shot run exactly."""
    import json as _json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    job = os.path.join(repo, "jobs", "run_turn_features.py")

    def run(args):
        out = subprocess.run(
            [sys.executable, job, *args],
            capture_output=True, text=True, check=True, cwd=repo,
            env=dict(os.environ, SPARK_GRAFT_CPUS="4"),
        )
        return _json.loads(
            [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        )

    single = str(tmp_path / "single")
    resumed = str(tmp_path / "resumed")
    r1 = run(["--generate", "30", "--output", single, "--buckets", "4", "--snapshots"])
    run(["--generate", "30", "--output", resumed, "--buckets", "4", "--snapshots"])

    # simulate the crash: the last two snapshots never committed
    table = os.path.join(resumed, "features")
    log = os.path.join(table, "metadata", "snapshots.json")
    with open(log) as f:
        entries = _json.load(f)
    with open(log, "w") as f:
        _json.dump(entries[:2], f)

    r3 = run(
        ["--generate", "30", "--output", resumed, "--buckets", "4",
         "--snapshots", "--resume"]
    )
    assert r3["skipped"] == 2

    a = snap.read(spark, os.path.join(single, "features")).orderBy(
        "conv_id", "turn_idx"
    ).toPandas()
    b = snap.read(spark, table).orderBy("conv_id", "turn_idx").toPandas()
    assert len(a) == len(b) == r1["rows_written"]
    assert (a["text"].to_numpy() == b["text"].to_numpy()).all()
    import numpy as np

    np.testing.assert_allclose(
        a["text_len_z"].to_numpy(), b["text_len_z"].to_numpy(), rtol=1e-12
    )
    # the log carries per-bucket lineage for all four buckets
    assert {s.lineage["bucket"] for s in snap.history(table)} == {
        f"bucket={i}" for i in range(4)
    }


def test_streaming_snapshot_sink_exactly_once(spark, tmp_path):
    """Two drain runs over a growing file source commit each micro-batch
    as one snapshot; an epoch REPLAY (the at-least-once case foreachBatch
    must absorb) is a no-op."""
    src = str(tmp_path / "in")
    table = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    _df(spark, range(10)).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = snap.snapshot_sink(stream, table, ckpt, available_now=True)
        q.awaitTermination(120)
        q.stop()

    drain()
    n1 = snap.read(spark, table).count()
    assert n1 == 10
    _df(spark, range(10, 17)).write.mode("append").parquet(src)
    drain()  # resumes from the checkpoint: only the new wave commits
    assert snap.read(spark, table).count() == 17
    epochs = [s.lineage["epoch"] for s in snap.history(table)]
    assert len(epochs) == len(set(epochs))  # one snapshot per epoch

    # replay absorption: re-delivering an already-committed epoch no-ops
    before = snap.current_snapshot_id(table)
    assert snap.commit_epoch(_df(spark, range(999)), epochs[0], table) is None
    assert snap.current_snapshot_id(table) == before
    assert snap.read(spark, table).count() == 17

    # a third drain with nothing new commits nothing
    drain()
    assert snap.current_snapshot_id(table) == before


def test_writer_lock_blocks_second_writer(spark, tmp_path):
    """ADVICE r2: a concurrent log mutation must fail fast, not silently
    discard the in-flight writer's snapshot."""
    import json
    import time as _time

    t = str(tmp_path / "tbl")
    snap.commit(_df(spark, range(3)), t)
    lock = os.path.join(t, "metadata", "commit.lock")
    # simulate a LIVE concurrent writer (our own pid, fresh timestamp)
    with open(lock, "w") as f:
        json.dump({"pid": os.getpid(), "ts": _time.time()}, f)
    try:
        with pytest.raises(snap.ConcurrentWriterError, match="single-writer"):
            snap.commit(_df(spark, range(3, 6)), t)
        with pytest.raises(snap.ConcurrentWriterError):
            snap.rollback(t, 1)
        with pytest.raises(snap.ConcurrentWriterError):
            snap.expire(t)
        with pytest.raises(snap.ConcurrentWriterError):
            snap.compact(spark, t, partitions=1)
        with pytest.raises(snap.ConcurrentWriterError):
            snap.merge_upsert(spark, _df(spark, range(2)), t, key="id")
    finally:
        os.unlink(lock)
    # lock gone -> writes proceed, and the lock self-cleans afterward
    snap.commit(_df(spark, range(3, 6)), t)
    assert snap.read(spark, t).count() == 6
    assert not os.path.exists(lock)


def test_writer_lock_reclaims_stale(spark, tmp_path):
    """A crashed writer (dead pid / ancient ts) must not wedge the table."""
    import json

    t = str(tmp_path / "tbl")
    snap.commit(_df(spark, range(3)), t)
    lock = os.path.join(t, "metadata", "commit.lock")
    # dead pid and ancient timestamp: both staleness conditions at once
    with open(lock, "w") as f:
        json.dump({"pid": 2**22 + 12345, "ts": 0.0}, f)
    s = snap.commit(_df(spark, range(3, 6)), t)  # reclaims, proceeds
    assert s.snapshot_id == 2
    assert not os.path.exists(lock)


def test_read_changes_append_merge_compact(spark, tmp_path):
    from acoustic_feature_extractor_spark.sources import snapshots as snap

    t = str(tmp_path / "cdc")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id bigint, val string"
    )
    s1 = snap.commit(base, t)
    s2 = snap.commit(
        spark.createDataFrame([(10, "v10"), (11, "v11")], "id bigint, val string"), t
    )
    # pure append: inserts only, and the s1 dir is never part of the diff
    ch = snap.read_changes(spark, t, s1.snapshot_id, s2.snapshot_id)
    rows = sorted((r["id"], r["val"], r["_change_type"]) for r in ch.collect())
    assert rows == [(10, "v10", "insert"), (11, "v11", "insert")]

    # merge: updated key -> delete(old)+insert(new); new key -> insert;
    # rewritten-but-unchanged survivors cancel out
    upd = spark.createDataFrame([(3, "V3"), (12, "v12")], "id bigint, val string")
    s3 = snap.merge_upsert(spark, upd, t, key="id")
    ch = snap.read_changes(spark, t, s2.snapshot_id, s3.snapshot_id)
    rows = sorted((r["id"], r["val"], r["_change_type"]) for r in ch.collect())
    assert rows == [
        (3, "V3", "insert"),
        (3, "v3", "delete"),
        (12, "v12", "insert"),
    ]

    # compaction reshuffles bytes, zero logical changes
    s4 = snap.compact(spark, t)
    ch = snap.read_changes(spark, t, s3.snapshot_id, s4.snapshot_id)
    assert ch.count() == 0
    assert ch.columns[-1] == "_change_type"

    # default to_snapshot = current head; span s1 -> head nets everything
    ch = snap.read_changes(spark, t, s1.snapshot_id)
    rows = sorted((r["id"], r["val"], r["_change_type"]) for r in ch.collect())
    assert (3, "v3", "delete") in rows and (3, "V3", "insert") in rows
    assert (10, "v10", "insert") in rows and (12, "v12", "insert") in rows
    assert len([r for r in rows if r[2] == "delete"]) == 1

    # unknown ids refused
    import pytest

    with pytest.raises(KeyError):
        snap.read_changes(spark, t, 99)


# ---------------------------------------------------------------------------
# file-level column stats + data skipping
# ---------------------------------------------------------------------------


def test_commit_collects_file_stats(spark, tmp_path):
    from acoustic_feature_extractor_spark.sources import snapshots as snap

    t = str(tmp_path / "stats")
    df = spark.createDataFrame(
        [(i, float(i) * 2.0, f"k{i:03d}") for i in range(100)],
        "id bigint, v double, name string",
    ).repartitionByRange(4, "id")
    s = snap.commit(df, t)
    assert len(s.stats) == 4
    # every file's recorded [min,max] brackets its actual rows, and the
    # per-file ranges are disjoint (range-clustered write)
    ranges = []
    for rel, cols in s.stats.items():
        got = spark.read.parquet(f"{t}/{rel}").agg(
            F.min("id"), F.max("id"), F.min("name"), F.max("name")
        ).collect()[0]
        assert cols["id"][0] == got[0] and cols["id"][1] == got[1]
        assert cols["name"][0] == got[2] and cols["name"][1] == got[3]
        assert cols["id"][2] == 0  # null count
        ranges.append((cols["id"][0], cols["id"][1]))
    ranges.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi < b_lo


def test_plan_scan_prunes_read_where_exact(spark, tmp_path):
    from acoustic_feature_extractor_spark.sources import snapshots as snap

    t = str(tmp_path / "prune")
    df = spark.createDataFrame(
        [(i, float(i % 7), f"g{i % 3}") for i in range(1000)],
        "id bigint, v double, grp string",
    ).repartitionByRange(8, "id")
    snap.commit(df, t)
    kept, total = snap.plan_scan(t, "id", lo=100, hi=220)
    assert total == 8 and 1 <= len(kept) <= 3
    got = snap.read_where(spark, t, "id", lo=100, hi=220)
    exp = df.where((F.col("id") >= 100) & (F.col("id") <= 220))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))
    # string pruning
    kept_s, total_s = snap.plan_scan(t, "grp", lo="g2", hi="g2")
    assert total_s == 8 and len(kept_s) == 8  # every file holds g0..g2
    # one-sided bounds
    kept_lo, _ = snap.plan_scan(t, "id", lo=900)
    assert 1 <= len(kept_lo) <= 2
    # out-of-range: nothing kept, empty frame with table schema
    kept0, _ = snap.plan_scan(t, "id", lo=10_000)
    assert kept0 == []
    empty = snap.read_where(spark, t, "id", lo=10_000)
    assert empty.count() == 0 and empty.columns == ["id", "v", "grp"]


def test_plan_scan_null_and_unknown_columns(spark, tmp_path):
    from acoustic_feature_extractor_spark.sources import snapshots as snap

    t = str(tmp_path / "nulls")
    # one file all-null in v, one with values; array col has no stats
    a = spark.createDataFrame(
        [(i, None, [1.0, 2.0]) for i in range(10)],
        "id bigint, v double, emb array<double>",
    ).coalesce(1)
    b = spark.createDataFrame(
        [(i, float(i), [3.0]) for i in range(10, 20)],
        "id bigint, v double, emb array<double>",
    ).coalesce(1)
    snap.commit(a, t)
    s = snap.commit(b, t)
    kept, total = snap.plan_scan(t, "v", lo=0.0, hi=100.0)
    assert total == 2 and len(kept) == 1  # all-null file pruned
    got = snap.read_where(spark, t, "v", lo=0.0, hi=100.0)
    assert got.count() == 10
    # column without stats (nested/list): conservative keep-everything
    kept_u, total_u = snap.plan_scan(t, "emb", lo=0.0)
    assert len(kept_u) == total_u == 2
    # stats survive the JSON log round-trip
    reloaded = snap.history(t)[-1]
    assert reloaded.snapshot_id == s.snapshot_id and reloaded.stats


def test_read_where_timestamps_and_merge(spark, tmp_path):
    import datetime as dt

    from acoustic_feature_extractor_spark.sources import snapshots as snap

    t = str(tmp_path / "tsprune")
    base = dt.datetime(2024, 5, 1)
    df = spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=i), float(i)) for i in range(600)],
        "id bigint, ts timestamp, v double",
    ).repartitionByRange(6, "ts")
    snap.commit(df, t)
    lo, hi = base + dt.timedelta(minutes=100), base + dt.timedelta(minutes=199)
    kept, total = snap.plan_scan(t, "ts", lo=lo, hi=hi)
    assert total == 6 and 1 <= len(kept) <= 2
    got = snap.read_where(spark, t, "ts", lo=lo, hi=hi)
    assert got.count() == 100
    # after a merge the rewritten dir gets fresh stats; pruning stays exact
    upd = spark.createDataFrame(
        [(5, base + dt.timedelta(minutes=5), 99.0)], "id bigint, ts timestamp, v double"
    )
    snap.merge_upsert(spark, upd, t, key="id")
    got2 = snap.read_where(spark, t, "ts", lo=lo, hi=hi)
    assert got2.count() == 100
    kept2, total2 = snap.plan_scan(t, "ts", lo=lo, hi=hi)
    assert len(kept2) < total2
    # time travel: pruning at the pre-merge snapshot still works
    sid1 = snap.history(t)[0].snapshot_id
    kept_tt, _ = snap.plan_scan(t, "ts", lo=lo, hi=hi, snapshot_id=sid1)
    assert kept_tt == kept


def test_plan_scan_requires_bound(spark, tmp_path):
    import pytest as _pytest

    from acoustic_feature_extractor_spark.sources import snapshots as snap

    t = str(tmp_path / "nob")
    snap.commit(spark.range(5), t)
    with _pytest.raises(ValueError, match="bound"):
        snap.plan_scan(t, "id")


def test_table_profile_zero_scan(spark, tmp_path):
    """table_profile aggregates the log's per-file stats into per-column
    (min, max, nulls, rows) matching the real data — including nulls,
    timestamps, and post-merge snapshots."""
    import datetime as dt

    from acoustic_feature_extractor_spark.sources import snapshots as snap

    t = str(tmp_path / "profile")
    base = dt.datetime(2024, 7, 1)
    df = spark.createDataFrame(
        [
            (i, base + dt.timedelta(minutes=i), float(i) if i % 4 else None)
            for i in range(200)
        ],
        "id bigint, ts timestamp, v double",
    ).repartition(4)
    snap.commit(df, t)
    prof = snap.table_profile(t)
    assert prof["id"][:2] == [0, 199]
    assert prof["id"][2] == 0 and prof["id"][3] == 200
    assert prof["v"][2] == 50 and prof["v"][3] == 200  # i % 4 == 0 nulls
    assert prof["v"][:2] == [1.0, 199.0]  # 0 is null, so min is 1.0
    # timestamps come back in the log's order-preserving encoding
    assert prof["ts"][0] == {"ts": base.replace(tzinfo=dt.timezone.utc).timestamp()}
    # a merge refreshes the profile (new max)
    upd = spark.createDataFrame(
        [(500, base + dt.timedelta(days=2), 999.0)], "id bigint, ts timestamp, v double"
    )
    snap.merge_upsert(spark, upd, t, key="id")
    prof2 = snap.table_profile(t)
    assert prof2["id"][1] == 500 and prof2["v"][1] == 999.0
    assert prof2["id"][3] == 201
    # historical snapshot still profiles the old state
    sid1 = snap.history(t)[0].snapshot_id
    assert snap.table_profile(t, snapshot_id=sid1)["id"][1] == 199


def test_additive_schema_evolution(spark, tmp_path):
    """evolve=True appends a frame with NEW columns without rewriting
    history: old files read the new columns as NULL, time travel keeps
    the old shape, and non-additive changes stay rejected."""
    from acoustic_feature_extractor_spark.sources import snapshots as snap

    t = str(tmp_path / "evolve")
    v1 = spark.createDataFrame([(i, float(i)) for i in range(10)], "id bigint, v double")
    s1 = snap.commit(v1, t)
    wide = spark.createDataFrame(
        [(100 + i, float(i), f"t{i}") for i in range(5)],
        "id bigint, v double, tag string",
    )
    # without evolve: rejected
    with pytest.raises(ValueError, match="evolve=True"):
        snap.commit(wide, t)
    s2 = snap.commit(wide, t, evolve=True)
    got = snap.read(spark, t)
    assert set(got.columns) == {"id", "v", "tag"}
    assert got.count() == 15
    assert got.where("tag IS NULL").count() == 10  # historical rows
    assert got.where("tag IS NOT NULL").count() == 5
    # time travel to the pre-evolution snapshot keeps the narrow shape
    old = snap.read(spark, t, s1.snapshot_id)
    assert set(old.columns) == {"id", "v"}
    # further homogeneous appends at the NEW schema need no flag
    snap.commit(wide.withColumn("id", F.col("id") + 1000), t)
    assert snap.read(spark, t).count() == 20
    # type change / drop: still rejected even with evolve
    retyped = spark.createDataFrame([(1, 1, "x")], "id bigint, v bigint, tag string")
    with pytest.raises(ValueError, match="schema mismatch"):
        snap.commit(retyped, t, evolve=True)
    dropped = spark.createDataFrame([(1,)], "id bigint")
    with pytest.raises(ValueError, match="schema mismatch"):
        snap.commit(dropped, t, evolve=True)
    # pruning on the evolved column: old files have no stats for it ->
    # conservatively kept; new files prune normally
    kept, total = snap.plan_scan(t, "id", lo=1100)
    assert 0 < len(kept) < total


def test_plan_scan_never_lists_filesystem(spark, tmp_path, monkeypatch):
    """For a stats-complete table, query planning is pure log metadata:
    zero os.listdir calls (on object storage: zero LIST requests). The
    dir-level envelope skips whole directories before their file entries
    are even scanned."""
    from acoustic_feature_extractor_spark.sources import snapshots as snap

    t = str(tmp_path / "nolist")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1_000)], "id bigint, v double"
    ).repartitionByRange(4, "id")
    snap.commit(df, t)
    # second snapshot: a disjoint id range in its own dir — the dir-level
    # envelope must prune it wholesale for a low-range predicate
    df2 = spark.createDataFrame(
        [(i, float(i)) for i in range(50_000, 51_000)], "id bigint, v double"
    ).repartitionByRange(4, "id")
    snap.commit(df2, t)

    calls = []
    real_listdir = os.listdir

    def spy(path):
        calls.append(path)
        return real_listdir(path)

    monkeypatch.setattr(
        "acoustic_feature_extractor_spark.sources.snapshots.os.listdir", spy
    )
    kept, total = snap.plan_scan(t, "id", lo=100, hi=220)
    assert calls == [], f"planning touched the filesystem: {calls}"
    assert total == 8 and 1 <= len(kept) <= 2
    assert all("snap-1/" in f for f in kept)  # snap-2's dir fully skipped


def test_statless_file_recorded_and_kept(spark, tmp_path):
    """A file whose columns yield NO coverable stats (writer omitting
    min/max) must still get a log entry — an EMPTY cols dict — because the
    pure-log planner rebuilds each dir's file list from the stats keys; an
    omitted file would be silently EXCLUDED from every pruned read instead
    of conservatively kept."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from acoustic_feature_extractor_spark.sources.snapshots import _collect_file_stats

    d = tmp_path / "data" / "snap-1"
    d.mkdir(parents=True)
    pq.write_table(pa.table({"id": [1, 2], "v": [1.0, 2.0]}), str(d / "a.parquet"))
    pq.write_table(
        pa.table({"id": [3, 4], "v": [3.0, 4.0]}),
        str(d / "b.parquet"),
        write_statistics=False,
    )
    stats = _collect_file_stats(str(tmp_path), "data/snap-1")
    assert stats["data/snap-1/a.parquet"]  # normal file: real stats
    assert stats["data/snap-1/b.parquet"] == {}  # recorded, nothing coverable


def test_planner_keeps_statless_file(spark, tmp_path):
    """plan_scan / read_where with a log entry whose cols dict is empty:
    the file cannot be pruned by any predicate (conservative keep at both
    dir and file level) and its rows survive the pruned read."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id bigint, v double"
    ).repartitionByRange(4, "id")
    snap.commit(df, t)
    snaps = snap._load_log(t)
    statless = sorted(snaps[-1].stats)[0]  # lowest-range file
    snaps[-1].stats[statless] = {}  # simulate an uncoverable writer
    snap._publish_log(t, snaps)
    kept, total = snap.plan_scan(t, "id", lo=90)
    assert statless in kept  # conservative keep despite being out of range
    assert len(kept) < total  # other files still prune
    assert snap.read_where(spark, t, "id", lo=90).count() == 10


def test_read_where_merges_evolved_schemas(spark, tmp_path):
    """ADVICE r3: a pruned read whose keep-set spans dirs written under
    different (additive) schemas must mergeSchema like read() does —
    otherwise an arbitrary file's schema wins and the evolved column is
    silently absent."""
    t = str(tmp_path / "evolve")
    v1 = spark.createDataFrame([(i, float(i)) for i in range(10)], "id bigint, v double")
    snap.commit(v1, t)
    wide = spark.createDataFrame(
        [(100 + i, float(i), f"t{i}") for i in range(5)],
        "id bigint, v double, tag string",
    )
    snap.commit(wide, t, evolve=True)
    got = snap.read_where(spark, t, "id", lo=5, hi=102)
    assert set(got.columns) == {"id", "v", "tag"}
    assert got.count() == 8  # ids 5..9 + 100..102
    assert got.where("tag IS NULL").count() == 5  # historical rows as NULL


def test_read_where_scans_exactly_the_keep_set(spark, tmp_path):
    """VERDICT r3 #6a: the pruned read's PHYSICAL scan opens exactly the
    files plan_scan_multi keeps — not the whole table with a filter on
    top. inputFiles() is the executed scan's file list."""
    t = str(tmp_path / "exact")
    df = spark.createDataFrame(
        [(i, float(i % 13)) for i in range(2000)], "id bigint, v double"
    ).repartitionByRange(8, "id")
    snap.commit(df, t)
    preds = {"id": (400, 700)}
    kept, total = snap.plan_scan_multi(t, preds)
    assert 1 <= len(kept) < total
    got = snap.read_where_multi(spark, t, preds)
    scanned = {os.path.relpath(f.replace("file:", ""), t) for f in got.inputFiles()}
    assert scanned == set(kept), (sorted(scanned), sorted(kept))
    # and the residual filter still lands on the pruned scan
    assert got.count() == 301


def test_zorder_read_applies_both_residual_filters(spark, tmp_path):
    """VERDICT r3 #6c: a two-column pruned read over a z-ordered table
    must (1) prune on BOTH columns' file stats and (2) apply BOTH
    residual range filters — values equal the brute-force filter, and the
    executed plan carries both predicates down to the scan."""
    from acoustic_feature_extractor_spark.sources.layout import zorder_layout

    t = str(tmp_path / "zx")
    df = spark.createDataFrame(
        [(i, float(i % 100), float((i * 7) % 100)) for i in range(5000)],
        "id bigint, x double, y double",
    )
    snap.commit(zorder_layout(df, ["x", "y"], n_files=16), t)
    preds = {"x": (10.0, 30.0), "y": (40.0, 60.0)}
    kept, total = snap.plan_scan_multi(t, preds)
    assert total == 16 and len(kept) < total  # both dims prune
    got = snap.read_where_multi(spark, t, preds)
    exp = df.where("x BETWEEN 10.0 AND 30.0 AND y BETWEEN 40.0 AND 60.0")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))
    plan = got._jdf.queryExecution().executedPlan().toString()
    for col in ("x", "y"):
        assert f"{col}#" in plan and "Filter" in plan
    # all four residual bounds survive to the executed plan (the scan's
    # PushedFilters list is truncated in toString, so assert the Filter
    # node, plus the untruncated head of the pushed list)
    import re

    low = plan.replace(" ", "").lower()
    for pat in (r"x#\d+>=10\.0", r"x#\d+<=30\.0", r"y#\d+>=40\.0", r"y#\d+<=60\.0"):
        assert re.search(pat, low), (pat, low[:1500])
    assert "greaterthanorequal(x,10.0)" in low  # pushed down to parquet


def _synthetic_log(t: str, n_snaps: int, files_per: int = 10) -> None:
    """Publish a log as n_snaps append commits would have (one dir each,
    files_per files with id-range stats) without paying n_snaps Spark
    writes — planner behavior depends only on the log (the zero-LIST
    property test_plan_scan_never_lists_filesystem pins)."""
    snaps, dirs = [], []
    for sid in range(1, n_snaps + 1):
        rel = f"data/snap-{sid}"
        dirs = [*dirs, rel]
        base = (sid - 1) * files_per * 100
        stats = {
            f"{rel}/part-{i:05d}.parquet": {
                "id": [base + i * 100, base + i * 100 + 99, 0, 100],
                "v": [0.0, 1.0, 0, 100],
            }
            for i in range(files_per)
        }
        snaps.append(
            snap.Snapshot(
                snapshot_id=sid, parent_id=sid - 1 or None, operation="append",
                dirs=dirs, rows=100 * files_per * sid,
                schema="struct<id:bigint,v:double>", wall_ts=float(sid),
                stats=stats,
            )
        )
    snap._publish_log(t, snaps)


def test_compacted_log_bounded_planning_thousand_snapshots(tmp_path, monkeypatch):
    """VERDICT r3 #7: after 1,000 commits, (a) the planner index is built
    ONCE per log version (the second plan_scan parses nothing), (b)
    compact_log folds 999 entries away while planning results stay
    IDENTICAL, and (c) the compacted log is a fraction of the full one —
    planning cost tracks live files, not table history."""
    t = str(tmp_path / "big")
    _synthetic_log(t, 1000, files_per=10)

    parses = {"n": 0}
    real_load = snap._load_log

    def counting_load(path):
        parses["n"] += 1
        return real_load(path)

    monkeypatch.setattr(snap, "_load_log", counting_load)
    snap._PLAN_CACHE.clear()
    preds = {"id": (123_450, 123_700), "v": (0.0, 0.5)}
    kept_full, total_full = snap.plan_scan_multi(t, preds)
    assert total_full == 10_000 and 1 <= len(kept_full) <= 4
    assert parses["n"] == 1
    for _ in range(5):  # warm calls: zero log parses
        k2, t2 = snap.plan_scan_multi(t, preds)
        assert (k2, t2) == (kept_full, total_full)
    assert parses["n"] == 1

    size_full = os.path.getsize(snap._log_path(t))
    assert snap.compact_log(t) == 999
    kept_c, total_c = snap.plan_scan_multi(t, preds)  # new log version: re-plan
    assert (kept_c, total_c) == (kept_full, total_full)
    # 3 = initial parse + compact_log's own read + one re-plan parse
    assert parses["n"] == 3
    size_c = os.path.getsize(snap._log_path(t))
    assert size_c < 0.7 * size_full, (size_c, size_full)
    assert len(snap.history(t)) == 1
    # idempotent: nothing left to fold, no republish
    assert snap.compact_log(t) == 0


def test_expire_preserves_pruning_stats_and_writer_schemas(spark, tmp_path):
    """expire() used to drop the log entries that carried still-live dirs'
    file stats and writer schemas: pruned reads silently degraded to
    keep-everything and mergeSchema detection went blind. Both must
    survive entry expiry."""
    t = str(tmp_path / "exp")
    v1 = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id bigint, v double"
    ).repartitionByRange(4, "id")
    snap.commit(v1, t)
    wide = spark.createDataFrame(
        [(1000 + i, float(i), f"t{i}") for i in range(10)],
        "id bigint, v double, tag string",
    )
    snap.commit(wide, t, evolve=True)
    kept_before, total_before = snap.plan_scan(t, "id", lo=0, hi=30)
    assert total_before > 1 and 1 <= len(kept_before) < total_before

    snap.expire(t, keep_last=1)
    snap._PLAN_CACHE.clear()
    kept_after, total_after = snap.plan_scan(t, "id", lo=0, hi=30)
    assert (kept_after, total_after) == (kept_before, total_before)
    # evolved read still merges schemas (old files surface tag as NULL)
    got = snap.read_where(spark, t, "id", lo=0, hi=2000)
    assert set(got.columns) == {"id", "v", "tag"}
    assert got.where("tag IS NULL").count() == 100
