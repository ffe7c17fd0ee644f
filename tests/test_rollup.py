"""Hypertable rollups: bucketing edges, cascade losslessness, plan shape."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from acoustic_feature_extractor_spark.operators.rollup import (
    rollup,
    rollup_coarser,
    time_bucket,
)


def _events(spark):
    base = pd.Timestamp("2024-03-01")
    rows = []
    for u in range(3):
        for i in range(200):
            rows.append(
                (u, base + pd.Timedelta(seconds=u * 137 + i * 653), float(u * 1000 + i))
            )
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    )


def test_time_bucket_edges(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "ts": [
                    pd.Timestamp("2024-03-01 00:00:00"),  # exactly on the edge
                    pd.Timestamp("2024-03-01 00:59:59.999999"),
                    pd.Timestamp("2024-03-01 01:00:00"),
                ]
            }
        )
    )
    got = [r[0] for r in df.select(time_bucket("ts", 3600.0)).collect()]
    assert got[0] == got[1] == pd.Timestamp("2024-03-01 00:00:00")
    assert got[2] == pd.Timestamp("2024-03-01 01:00:00")


def test_rollup_matches_pandas(spark):
    df = _events(spark)
    got = rollup(df, 3600.0, by="user_id", value_col="value").toPandas()
    pdf = df.toPandas()
    pdf["bucket"] = pdf["ts"].dt.floor("1h")
    exp = pdf.groupby(["user_id", "bucket"]).agg(
        n=("value", "size"),
        sum_v=("value", "sum"),
        min_v=("value", "min"),
        max_v=("value", "max"),
        first_ts=("ts", "min"),
        last_ts=("ts", "max"),
    )
    assert len(got) == len(exp)
    for r in got.itertuples():
        e = exp.loc[(r.user_id, pd.Timestamp(r.bucket))]
        assert r.n == e.n and r.sum_v == pytest.approx(e.sum_v)
        assert r.min_v == e.min_v and r.max_v == e.max_v
        assert pd.Timestamp(r.first_ts) == e.first_ts
        assert pd.Timestamp(r.last_ts) == e.last_ts
        assert r.avg_v == pytest.approx(e.sum_v / e.n)


@pytest.mark.parametrize("coarse", [14400.0, 86400.0])
def test_cascade_equals_direct(spark, coarse):
    """Re-aggregating the hourly rollup must equal rolling the raw events
    up directly at the coarse width — cascade is lossless."""
    df = _events(spark)
    hourly = rollup(df, 3600.0, by="user_id", value_col="value")
    via = rollup_coarser(hourly, coarse, by="user_id")
    direct = rollup(df, coarse, by="user_id", value_col="value")
    cols = ["user_id", "bucket", "n", "sum_v", "min_v", "max_v",
            "first_ts", "last_ts", "avg_v"]
    a = sorted(map(tuple, via.select(cols).collect()))
    b = sorted(map(tuple, direct.select(cols).collect()))
    assert a == b


def test_rollup_partition_invariant(spark):
    df = _events(spark)
    a = sorted(map(tuple, rollup(df, 3600.0, "user_id", "value").collect()))
    b = sorted(
        map(tuple, rollup(df.repartition(13), 3600.0, "user_id", "value").collect())
    )
    assert a == b


def test_rollup_single_exchange(spark):
    """The fine rollup is ONE partial/final aggregate (one exchange); the
    cascade re-aggregates rollup rows, never the fact table."""
    import contextlib
    import io
    import re

    df = _events(spark)
    fine = rollup(df, 3600.0, "user_id", "value")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fine.explain("formatted")
    assert len(re.findall(r"\(\d+\) Exchange\b", buf.getvalue())) == 1


def test_cascade_rejects_non_nested_widths(spark):
    df = _events(spark)
    hourly = rollup(df, 3600.0, "user_id", "value")
    with pytest.raises(ValueError, match="not a multiple"):
        rollup_coarser(hourly, 5000.0, "user_id", fine_seconds=3600.0)


# ---------------------------------------------------------------------------
# incremental maintenance: rollup_apply_changes ≡ full recompute
# ---------------------------------------------------------------------------


def _canon(df):
    pdf = df.toPandas().sort_values(["user_id", "bucket"]).reset_index(drop=True)
    pdf["sum_v"] = pdf["sum_v"].round(9)
    pdf["avg_v"] = pdf["avg_v"].round(9)
    return pdf


def _changes_case(spark):
    """Base events -> (old_rollup, changes, final_fact): updates (delete+
    insert) in some groups, pure inserts into existing + brand-new groups,
    and one group fully deleted."""
    from acoustic_feature_extractor_spark.operators.rollup import time_bucket

    base = _events(spark).cache()
    old = rollup(base, 3600.0, by="user_id", value_col="value").cache()

    # deletes: user 0's rows in its 2nd hour (update-like: half reinserted
    # shifted), user 1's entire first hour (group vanishes)
    with_b = base.withColumn("bucket", time_bucket("ts", 3600.0))
    bkts = sorted(
        r["bucket"]
        for r in with_b.where("user_id = 0").select("bucket").distinct().collect()
    )
    b0 = bkts[1]
    del_u0 = with_b.where((F.col("user_id") == 0) & (F.col("bucket") == b0))
    b1 = sorted(
        r["bucket"]
        for r in with_b.where("user_id = 1").select("bucket").distinct().collect()
    )[0]
    del_u1 = with_b.where((F.col("user_id") == 1) & (F.col("bucket") == b1))
    reins = del_u0.where(F.col("value") % 2 == 0).withColumn(
        "value", F.col("value") + 0.5
    )
    # pure inserts: new rows for user 2 (existing groups) + user 7 (new)
    import pandas as pd

    t0 = pd.Timestamp("2024-03-01")
    ins_new = spark.createDataFrame(
        pd.DataFrame(
            [
                (2, t0 + pd.Timedelta(seconds=5), -50.0),
                (7, t0 + pd.Timedelta(hours=30), 9.0),
                (7, t0 + pd.Timedelta(hours=30, minutes=5), 11.0),
            ],
            columns=["user_id", "ts", "value"],
        )
    )
    cols = ["user_id", "ts", "value"]
    deletes = del_u0.select(*cols).unionByName(del_u1.select(*cols))
    inserts = reins.select(*cols).unionByName(ins_new)
    changes = deletes.withColumn("_change_type", F.lit("delete")).unionByName(
        inserts.withColumn("_change_type", F.lit("insert"))
    )
    final = base.exceptAll(deletes).unionByName(inserts)
    return old, changes, final


def test_apply_changes_equals_recompute(spark):
    from acoustic_feature_extractor_spark.operators.rollup import (
        rollup_apply_changes,
    )

    old, changes, final = _changes_case(spark)
    got = rollup_apply_changes(
        old, changes, 3600.0, by="user_id", value_col="value", fact=final
    )
    exp = rollup(final, 3600.0, by="user_id", value_col="value")
    pd_got, pd_exp = _canon(got), _canon(exp)
    assert pd_got.shape == pd_exp.shape
    import pandas.testing as pdt

    pdt.assert_frame_equal(
        pd_got[pd_exp.columns], pd_exp, check_dtype=False, rtol=1e-9
    )


def test_apply_changes_insert_only_no_fact(spark):
    """Pure appends never need the fact table — and the merged result is
    exact (monoid append), including brand-new groups."""
    from acoustic_feature_extractor_spark.operators.rollup import (
        rollup_apply_changes,
    )

    base = _events(spark)
    old = rollup(base, 3600.0, by="user_id", value_col="value")
    _, changes, final = _changes_case(spark)
    ins = changes.where("_change_type = 'insert'")
    got = rollup_apply_changes(old, ins, 3600.0, by="user_id", value_col="value")
    exp = rollup(
        base.unionByName(ins.drop("_change_type")),
        3600.0,
        by="user_id",
        value_col="value",
    )
    import pandas.testing as pdt

    pdt.assert_frame_equal(
        _canon(got)[_canon(exp).columns], _canon(exp), check_dtype=False, rtol=1e-9
    )


def test_apply_changes_deletes_require_fact(spark):
    from acoustic_feature_extractor_spark.operators.rollup import (
        rollup_apply_changes,
    )

    old, changes, _ = _changes_case(spark)
    with pytest.raises(ValueError, match="retractable"):
        rollup_apply_changes(old, changes, 3600.0, by="user_id", value_col="value")


def test_apply_changes_empty_group_vanishes(spark):
    """A group whose rows are all deleted produces no output row."""
    from acoustic_feature_extractor_spark.operators.rollup import (
        rollup_apply_changes,
    )

    old, changes, final = _changes_case(spark)
    got = rollup_apply_changes(
        old, changes, 3600.0, by="user_id", value_col="value", fact=final
    )
    exp_groups = {
        (r["user_id"], r["bucket"])
        for r in rollup(final, 3600.0, by="user_id", value_col="value")
        .select("user_id", "bucket")
        .collect()
    }
    got_groups = {(r["user_id"], r["bucket"]) for r in got.select("user_id", "bucket").collect()}
    assert got_groups == exp_groups
    old_groups = {(r["user_id"], r["bucket"]) for r in old.select("user_id", "bucket").collect()}
    assert len(old_groups - got_groups) == 1  # exactly the fully-deleted hour


def test_cohort_retention_triangle(spark):
    import datetime as _dt

    from acoustic_feature_extractor_spark.operators.rollup import cohort_retention

    W = _dt.timedelta(days=7)
    # epoch-week-aligned start (floor(epoch/604800) buckets begin Thursdays;
    # 2818 * 604800 = 2024-01-02): keeps "day 1/2/3" inside the same bucket
    t0 = _dt.datetime(1970, 1, 1) + _dt.timedelta(seconds=2818 * 604800)
    rows = [
        # u1: cohort week0, active weeks 0,1,3 ; u2: week0, active 0 only
        # u3: cohort week1, active 1,2 ; u4: week1, active 1, 2, 3
        ("u1", t0), ("u1", t0 + _dt.timedelta(days=1)), ("u1", t0 + W), ("u1", t0 + 3 * W),
        ("u2", t0 + _dt.timedelta(days=2)),
        ("u3", t0 + W), ("u3", t0 + 2 * W),
        ("u4", t0 + W + _dt.timedelta(days=3)), ("u4", t0 + 2 * W), ("u4", t0 + 3 * W),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = {
        (r["cohort_sec"], r["offset"]): (r["n_active"], r["n_cohort"], r["retention"])
        for r in cohort_retention(df).collect()
    }
    cohorts = sorted({c for c, _ in out})
    assert len(cohorts) == 2
    c0, c1 = cohorts
    assert out[(c0, 0)] == (2, 2, 1.0)
    assert out[(c0, 1)][0] == 1 and abs(out[(c0, 1)][2] - 0.5) < 1e-12
    assert (c0, 2) not in out  # nobody from week0 active in week2
    assert out[(c0, 3)][0] == 1
    assert out[(c1, 0)] == (2, 2, 1.0)
    assert out[(c1, 1)] == (2, 2, 1.0)
    assert out[(c1, 2)][0] == 1
