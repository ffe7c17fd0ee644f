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
